package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Splittable DoFn (reference: SDK/transforms/DoFn.java:543-634 —
  * GetInitialRestriction / SplitRestriction / ProcessElement with a
  * tracker; OffsetRange SDK/io/range/OffsetRange.java; OffsetRangeTracker
  * SDK/transforms/splittabledofn/OffsetRangeTracker.java:32): an element
  * owns an offset-range restriction describing work far larger than the
  * element itself (a huge file, a partition of an external store), and the
  * runner splits the restriction so one element cannot serialize a task.
  *
  * Spark mapping: splitRestriction = flatMap each element into bounded
  * [from, to) chunks; work redistribution = shuffle the CHUNKS (narrow
  * tuples, the element rides along) across executors before processing.
  * What Spark cannot express is the mid-bundle dynamic re-split handshake
  * (OffsetRangeTracker.checkpoint / tryClaim:66): the static `chunkSize`
  * is the knob that bounds task skew instead — the same narrowing every
  * non-Dataflow runner in the reference snapshot shipped with (only
  * Dataflow implemented dynamic splitting). Pick chunkSize so one chunk
  * is minutes, not hours, of work.
  */
object Splittable {

  /** The SDF expansion: split each element's restriction into chunks of at
    * most `chunkSize`, shuffle chunks round-robin (`numPartitions` 0 =
    * session default parallelism), then run `process` per chunk.
    * `process(element, from, to)` must treat [from, to) as its claimed
    * range — exactly a ProcessElement body iterating tracker.tryClaim. */
  def splittableParDo[T, O](ds: Dataset[T], restriction: T => (Long, Long),
                            chunkSize: Long, numPartitions: Int = 0)(
      process: (T, Long, Long) => Iterator[O])(
      implicit tEnc: Encoder[T], oEnc: Encoder[O]): Dataset[O] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    val chunkEnc = Encoders.tuple(tEnc, Encoders.scalaLong, Encoders.scalaLong)
    val chunks = ds.flatMap { e =>
      val (from, to) = restriction(e)
      (from until to by chunkSize).iterator
        .map(c => (e, c, math.min(c + chunkSize, to)))
    }(chunkEnc)
    // explicit partition count: chunk rows are tiny tuples regardless of
    // the work they stand for, so a no-arg repartition() would let AQE
    // coalesce them by byte size back onto one task — exactly the elephant
    // this API exists to split
    val spread = chunks.repartition(
      if (numPartitions > 0) numPartitions
      else ds.sparkSession.sparkContext.defaultParallelism)
    spread.flatMap { case (e, from, to) => process(e, from, to) }(oEnc)
  }
}
