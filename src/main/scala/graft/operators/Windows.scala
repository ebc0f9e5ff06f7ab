package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing (reference: SDK/transforms/windowing/ — FixedWindows
  * .java:36, SlidingWindows.java:43, Sessions.java:40, GlobalWindows.java:32,
  * CalendarWindows.java:96/:198/:314; strategy object
  * SDK/values/WindowingStrategy.java:45).
  *
  * Beam assigns windows eagerly per element (WindowedValue carries the window
  * set); Spark defers window assignment to aggregation time. We mirror Beam's
  * model by carrying a WindowingStrategy alongside the frame and emitting the
  * right `window()` / `session_window()` / calendar expression when an
  * aggregation is applied — Catalyst then plans the stateful agg (streaming)
  * or plain hash agg (batch) with partial aggregation and no extra shuffle.
  */
object Windows {

  sealed trait WindowFn
  case object GlobalWindows extends WindowFn
  /** Tumbling (reference: FixedWindows.java:36). */
  final case class FixedWindows(size: String, offset: String = "0 seconds") extends WindowFn
  /** Sliding: element lands in size/period windows — Spark's window() emits
    * one row per overlapping window, matching Beam's multi-window membership
    * (reference: SlidingWindows.java:43). */
  final case class SlidingWindows(size: String, period: String) extends WindowFn
  /** Merging gap sessions per key (reference: Sessions.java:40). */
  final case class Sessions(gap: String) extends WindowFn
  /** Calendar-aligned, variable-length (reference: CalendarWindows.java). */
  final case class CalendarWindows(unit: String) extends WindowFn // "day"|"month"|"year"

  /** Accumulation + lateness config (reference: WindowingStrategy.java:59-65;
    * defaults :100-106). Trigger semantics map to streaming output modes —
    * see graft.streaming. */
  final case class WindowingStrategy(
      fn: WindowFn = GlobalWindows,
      allowedLateness: String = "0 seconds",
      accumulating: Boolean = false)

  /** The grouping expression(s) for a WindowFn over an event-time column.
    * For Sessions the expression is only valid inside groupBy (Spark
    * restriction on session_window). */
  def windowExpr(fn: WindowFn, ts: Column): Option[Column] = fn match {
    case GlobalWindows              => None
    case FixedWindows(size, off)    => Some(window(ts, size, size, off))
    case SlidingWindows(size, per)  => Some(window(ts, size, per))
    case Sessions(gap)              => Some(session_window(ts, gap))
    case CalendarWindows(unit)      =>
      // Variable-length calendar windows can't be expressed by window();
      // date_trunc gives the window start (the canonical Beam window id,
      // reference: CalendarWindows.DaysWindows:96 aligns to local day) and
      // end = start + 1 unit, so the column shape is the same
      // struct<start,end> that window()/session_window() emit and
      // TimestampCombiners.endOfWindow composes with any WindowFn.
      val start = date_trunc(unit, ts)
      val end = start + expr(s"INTERVAL 1 ${unit.toUpperCase}")
      Some(struct(start.as("start"), end.as("end")))
  }

  /** Windowed aggregation: groupBy(window?, keys).agg(...). */
  def aggregate(df: DataFrame, strategy: WindowingStrategy, ts: Column,
                keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val groupCols = windowExpr(strategy.fn, ts).map(_.as("window")).toSeq ++ keys
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** TimestampCombiner (reference: windowing/TimestampCombiner.java; default
    * END_OF_WINDOW per WindowingStrategy.java:103): the output timestamp of
    * an aggregated pane. */
  object TimestampCombiners {
    def endOfWindow: Column = col("window.end")
    def earliest(ts: Column): Column = min(ts)
    def latest(ts: Column): Column = max(ts)
  }
}
