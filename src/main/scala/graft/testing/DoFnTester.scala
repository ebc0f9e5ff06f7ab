package graft.testing

import scala.collection.mutable

/** DoFnTester (reference: SDK/transforms/DoFnTester.java:63 — "a harness for
  * invoking the processing methods of a DoFn on individual elements";
  * processBundle :214, peekOutputElements :303, tagged access :330,
  * takeOutputElements :351, clearOutputElements :344): drives the full
  * lifecycle setup → startBundle → processElement* → finishBundle →
  * teardown against in-memory bundles, capturing the main output and every
  * tagged output — no SparkSession required.
  *
  * The same [[DoFn]] runs distributed via [[asPartitionFunction]]: each
  * Spark partition is processed as one bundle (Beam's runner contract —
  * a bundle is the unit startBundle/finishBundle bracket), so logic
  * validated element-by-element here behaves identically under
  * `ds.mapPartitions`.
  */
object DoFnTester {

  /** Main-output tag (reference: ParDo's implicit main TupleTag). */
  val MainTag = "__main"

  /** The lifecycle surface under test (reference: SDK/transforms/DoFn.java —
    * @Setup :492, @StartBundle :519, @ProcessElement :539, @FinishBundle
    * :571, @Teardown :595). Emission goes through the receiver, mirroring
    * DoFn.MultiOutputReceiver (DoFn.java:329). */
  trait DoFn[I, O] extends Serializable {
    def setup(): Unit = ()
    def startBundle(): Unit = ()
    def processElement(input: I, out: MultiOutputReceiver[O]): Unit
    def finishBundle(out: MultiOutputReceiver[O]): Unit = ()
    def teardown(): Unit = ()
  }

  /** DoFn.MultiOutputReceiver: `output(v)` → main, `output(tag, v)` →
    * that tag's output. */
  final class MultiOutputReceiver[O] private[DoFnTester] (
      sink: (String, O) => Unit) {
    def output(v: O): Unit = sink(MainTag, v)
    def output(tag: String, v: O): Unit = sink(tag, v)
  }

  def of[I, O](fn: DoFn[I, O]): Tester[I, O] = new Tester(fn)

  /** One tester = one DoFn instance, like the reference: setup runs lazily
    * before the first bundle, teardown on close(); outputs accumulate
    * across bundles until taken/cleared. */
  final class Tester[I, O](fn: DoFn[I, O]) {
    private val outputs = mutable.ArrayBuffer.empty[(String, O)]
    private val receiver = new MultiOutputReceiver[O]((t, v) => outputs += ((t, v)))
    private var setUp = false
    private var closed = false

    private def ensureSetup(): Unit = {
      require(!closed, "DoFnTester used after close()")
      if (!setUp) { fn.setup(); setUp = true }
    }

    /** Process `inputs` as one bundle; returns the MAIN output produced by
      * this bundle. DELIBERATE DIVERGENCE from the reference contract:
      * DoFnTester.java:182-188 returns `takeOutputElements()`, which
      * CLEARS the main-output buffer — after the reference's
      * processBundle, peek sees nothing from that bundle. Here ALL
      * outputs (main and tagged) are retained across bundles until
      * `takeOutputElements`/`clearOutputElements`, so peek composes over
      * a multi-bundle session; the per-bundle return value is sliced, not
      * drained. Call takeOutputElements after each bundle to recover the
      * reference's drain-on-process behavior exactly. */
    def processBundle(inputs: Seq[I]): Seq[O] = {
      ensureSetup()
      val before = outputs.size
      fn.startBundle()
      inputs.foreach(fn.processElement(_, receiver))
      fn.finishBundle(receiver)
      outputs.drop(before).collect { case (MainTag, v) => v }.toSeq
    }

    /** Process a single element inside an open bundle of size 1. */
    def processElement(input: I): Unit = { processBundle(Seq(input)); () }

    def peekOutputElements: Seq[O] = peekOutputElements(MainTag)
    def peekOutputElements(tag: String): Seq[O] =
      outputs.collect { case (`tag`, v) => v }.toSeq

    /** Peek-then-clear, reference semantics (DoFnTester.java:351). */
    def takeOutputElements: Seq[O] = {
      val r = peekOutputElements
      clearOutputElements()
      r
    }
    def clearOutputElements(): Unit = outputs.clear()

    /** Invoke teardown; further use throws. */
    def close(): Unit = if (!closed) { fn.teardown(); closed = true }
  }

  /** Distributed execution of the SAME DoFn: a function for
    * `ds.mapPartitions`, treating each partition as one bundle. Output
    * rows are (tag, value) — filter on tag for multi-output, or compose
    * with `_.collect { case (MainTag, v) => v }` for main-only.
    * Lifecycle per task: setup → startBundle → process* → finishBundle →
    * teardown. Buffering is PER ELEMENT (bounded by one element's fan-out),
    * not per partition — the element stream flows lazily through the task,
    * so an arbitrarily large partition never accumulates on-heap.
    *
    * Partial consumption (a limit/take that stops pulling, or a task
    * failure): finishBundle's OUTPUT is necessarily lost — there is no
    * channel to emit rows after the consumer stops — but teardown still
    * runs via a task-completion listener, so resources opened in setup
    * never leak. Beam's bundle contract likewise ties finishBundle output
    * to a fully-processed bundle. */
  def asPartitionFunction[I, O](fn: DoFn[I, O]): Iterator[I] => Iterator[(String, O)] =
    (it: Iterator[I]) => {
      fn.setup()
      val torndown = new java.util.concurrent.atomic.AtomicBoolean(false)
      def teardownOnce(): Unit =
        if (torndown.compareAndSet(false, true)) fn.teardown()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => teardownOnce()))
      fn.startBundle()
      val perElement = it.flatMap { i =>
        val buf = mutable.ArrayBuffer.empty[(String, O)]
        val r = new MultiOutputReceiver[O]((t, v) => buf += ((t, v)))
        fn.processElement(i, r)
        buf
      }
      // by-name ++ defers finishBundle until the element stream is drained
      perElement ++ {
        val buf = mutable.ArrayBuffer.empty[(String, O)]
        val r = new MultiOutputReceiver[O]((t, v) => buf += ((t, v)))
        fn.finishBundle(r)
        teardownOnce()
        buf
      }
    }
}
