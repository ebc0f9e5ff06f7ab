package graft.testing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CombineFn

/** CombineFn conformance checker (reference:
  * SDK/testing/CombineFnTester.java:40 testCombineFn — "correct results
  * across various permutations and shardings of the input", `:97`
  * shardEvenly, `:109` shardExponentially). A CombineFn that peeks at
  * order or shard boundaries passes a single-partition test and then
  * silently mis-aggregates under Spark's partial/final split; this runs
  * the same sharding matrix the reference does, plus the empty-shard and
  * fresh-accumulator merge cases. */
object CombineFnTester {

  def testCombineFn[I, A, O](fn: CombineFn[I, A, O], input: Seq[I], expected: O): Unit = {
    def combineShards(shards: Seq[Seq[I]]): O = {
      val accs = shards.map(sh => sh.foldLeft(fn.createAccumulator())(fn.addInput))
      // left-fold merge into a fresh accumulator — the runner may merge in
      // any tree; a fresh accumulator in the mix is Beam's own edge case
      fn.extractOutput(accs.foldLeft(fn.createAccumulator())(fn.mergeAccumulators))
    }
    // NaN-aware canonicalization: a CombineFn may legitimately output NaN
    // (variance/ratio over degenerate input) and NaN != NaN would turn
    // every such case into a false conformance failure
    def canon(v: Any): Any = PAssert.normalize(v) match {
      case d: Double if d.isNaN => "__NaN"
      case f: Float if f.isNaN  => "__NaN"
      case l: List[_]           => l.map(canon)
      case other                => other
    }
    def check(shards: Seq[Seq[I]], what: String): Unit = {
      Seq(shards, shards.reverse).foreach { order =>
        val got = combineShards(order)
        if (canon(got) != canon(expected))
          throw new AssertionError(
            s"CombineFn mismatch ($what, ${order.size} shards): got $got, expected $expected")
      }
    }
    def shardEvenly(n: Int): Seq[Seq[I]] =
      if (n <= 1) Seq(input)
      else input.grouped(math.max(1, (input.size + n - 1) / n)).toSeq
    def shardExponentially(base: Double): Seq[Seq[I]] = {
      val out = Seq.newBuilder[Seq[I]]
      var rest = input
      var size = 1
      while (rest.nonEmpty) {
        out += rest.take(size)
        rest = rest.drop(size)
        size = math.max(size + 1, math.ceil(size * base).toInt)
      }
      out.result()
    }
    check(Seq(input), "single shard")
    check(shardEvenly(2), "two shards")
    if (input.size > 4) {
      check(shardEvenly(input.size / 2), "pairs")
      check(shardEvenly(math.sqrt(input.size.toDouble).toInt), "sqrt shards")
    }
    check(shardExponentially(1.4), "exponential 1.4")
    check(shardExponentially(2.0), "exponential 2")
    check(Seq(Seq.empty, input, Seq.empty), "empty edge shards")
    // per-element shards exercise the maximal merge tree
    check(input.map(Seq(_)), "singleton shards")
  }
}

/** GatherAllPanes (reference: SDK/testing/GatherAllPanes.java:43): fold a
  * trigger-engine pane stream into one row per (key, window) holding every
  * pane that window fired, in pane-index order — the shape pane-sequence
  * assertions want. Test scope: the collect_list is bounded by the pane
  * count of a single window. */
object GatherAllPanes {
  /** Input: the Pane shape from graft.streaming.Triggers
    * (k, wstart, wend, values, pane_index, timing, is_final). */
  def perWindow(panes: DataFrame): DataFrame =
    panes.groupBy(col("k"), col("wstart"), col("wend"))
      .agg(sort_array(collect_list(struct(
        col("pane_index"), col("timing"), col("is_final"), col("values")))).as("panes"))
}
