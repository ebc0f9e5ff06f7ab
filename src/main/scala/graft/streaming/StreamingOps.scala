package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Windows
import graft.operators.Windows.WindowingStrategy

/** Streaming windowed aggregation: the reference's
  * Window.into + trigger + allowedLateness + accumulation configuration
  * (reference: SDK/transforms/windowing/Window.java:143,
  * WindowingStrategy.java:45) mapped onto Structured Streaming.
  *
  * Semantic mapping (documented narrowings):
  *  - allowedLateness → `withWatermark(ts, lateness)`. Beam's watermark is
  *    per-source with holds (DIRECT/WatermarkManager.java:130); Spark's is
  *    global max(event_time) − delay. Same contract (windows finalize;
  *    too-late data dropped), coarser bookkeeping.
  *  - DefaultTrigger / AfterWatermark.pastEndOfWindow → APPEND mode: one
  *    final pane per window when the watermark passes its end
  *    (reference: AfterWatermark.java:59).
  *  - withEarlyFirings / Repeatedly / accumulatingFiredPanes → UPDATE mode:
  *    a refined pane every micro-batch containing changes — Beam's
  *    accumulating early firings at micro-batch cadence
  *    (reference: AfterWatermarkEarlyAndLate :76, Repeatedly.java:37).
  *  - discarding multi-pane deltas and exact firing cadences ride the
  *    custom trigger engine (graft.streaming.Triggers) instead.
  */
object StreamingOps {

  /** The Spark output mode a WindowingStrategy maps to. */
  def outputModeFor(strategy: WindowingStrategy): String =
    if (strategy.accumulating) "update" else "append"

  /** WithTimestamps + allowedLateness: declare the event-time column and
    * watermark delay (0 lateness = Beam default, WindowingStrategy.java:104). */
  def withEventTimeWatermark(df: DataFrame, ts: Column, lateness: String): DataFrame =
    df.withColumn("__event_time", ts).withWatermark("__event_time", lateness)

  /** Windowed aggregation over a stream. Emits `window struct<start,end>` +
    * key + aggregate columns; run with outputModeFor(strategy). */
  def windowedAggregate(df: DataFrame, strategy: WindowingStrategy, ts: Column,
                        keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val withWm = withEventTimeWatermark(df, ts, strategy.allowedLateness)
    val wcol = Windows.windowExpr(strategy.fn, col("__event_time")).map(_.as("window"))
    val groupCols = wcol.toSeq ++ keys
    val out =
      if (groupCols.isEmpty) withWm.agg(aggs.head, aggs.tail: _*)
      else withWm.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
    out
  }

  /** Distinct on a stream (reference: Distinct.java:66 under windowing):
    * exact dedup bounded by the watermark — state for a key is dropped once
    * the watermark passes, the same GC contract as Beam's per-window state. */
  def distinctWithinWatermark(df: DataFrame, ts: Column, lateness: String,
                              idCols: Seq[String]): DataFrame =
    withEventTimeWatermark(df, ts, lateness)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-static join: the streaming side joins a bounded dimension —
    * Beam's side-input join under a stream (View.asMap read in a DoFn).
    * Catalyst broadcasts the static side per micro-batch. */
  def streamStaticJoin(stream: DataFrame, static: DataFrame, keys: Seq[String],
                       how: String = "inner"): DataFrame =
    stream.join(broadcast(static), keys, how)

  /** Stream-stream join: both sides watermarked, equality keys + an
    * event-time range bound so state is GC'd (Spark requirement). */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       joinExpr: Column, how: String = "inner"): DataFrame =
    left.join(right, joinExpr, how)
}
