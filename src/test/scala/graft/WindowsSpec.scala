package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Create, Windows}
import Windows._

/** Batch windowing semantics (reference: the windowing test suites under
  * transforms/windowing — FixedWindows.java:36, SlidingWindows.java:43,
  * Sessions.java:40, CalendarWindows.java). */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events = Create.of(spark, Seq(
    ("a", ts("2024-01-01 00:05:00")),
    ("a", ts("2024-01-01 00:55:00")),
    ("a", ts("2024-01-01 01:05:00")),
    ("b", ts("2024-01-01 03:00:00")))).toDF("k", "t")

  test("FixedWindows: one row per (hour, key)") {
    val out = Windows.aggregate(events, WindowingStrategy(FixedWindows("1 hour")),
      col("t"), Seq(col("k")), Seq(count(lit(1)).as("n")))
    val got = out.select(col("window.start").cast("string"), col("k"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(got == Set(
      Seq("2024-01-01 00:00:00", "a", 2L),
      Seq("2024-01-01 01:00:00", "a", 1L),
      Seq("2024-01-01 03:00:00", "b", 1L)))
  }

  test("SlidingWindows: each element lands in size/period windows") {
    val out = Windows.aggregate(events, WindowingStrategy(SlidingWindows("1 hour", "30 minutes")),
      col("t"), Seq.empty, Seq(count(lit(1)).as("n")))
    // 4 events x 2 overlapping windows each = 8 memberships
    val total = out.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total == 8L)
  }

  test("Sessions: 30-minute gap merges first two events, splits the third") {
    val out = events.filter(col("k") === "a")
      .groupBy(session_window(col("t"), "30 minutes").as("w"), col("k"))
      .agg(count(lit(1)).as("n"))
    val ns = out.select(col("n")).collect().map(_.getLong(0)).sorted.toSeq
    // 00:05 and 00:55 are >30min apart -> 3 singleton sessions? No:
    // 00:55 and 01:05 are 10min apart -> one 2-event session + one singleton.
    assert(ns == Seq(1L, 2L))
  }

  test("CalendarWindows emit struct(start,end) spanning the unit") {
    val out = Windows.aggregate(events, WindowingStrategy(CalendarWindows("day")),
      col("t"), Seq.empty, Seq(count(lit(1)).as("n")))
    val r = out.select(col("window.start").cast("string"), col("window.end").cast("string"),
      col("n")).collect()(0).toSeq
    assert(r == Seq("2024-01-01 00:00:00", "2024-01-02 00:00:00", 4L))
  }

  test("TimestampCombiners.endOfWindow composes with every WindowFn") {
    for (fn <- Seq(FixedWindows("1 hour"), SlidingWindows("1 hour", "30 minutes"),
                   CalendarWindows("month"))) {
      val out = Windows.aggregate(events, WindowingStrategy(fn), col("t"),
          Seq.empty, Seq(count(lit(1)).as("n")))
        .select(TimestampCombiners.endOfWindow.as("end_ts"))
      assert(out.collect().nonEmpty)
    }
  }

  test("GlobalWindows aggregates the whole frame") {
    val out = Windows.aggregate(events, WindowingStrategy(GlobalWindows), col("t"),
      Seq.empty, Seq(count(lit(1)).as("n")))
    assertRows(out, Seq(Seq(4L)))
  }
}
