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

  test("weeks(2, Thursday): epoch-anchored fortnights starting Thursdays") {
    // the epoch (1970-01-01) IS a Thursday, so Thursday fortnights are the
    // raw 14-day grid; 2024-01-04 is a grid Thursday (epoch day 19726 = 14*1409)
    val df = Seq(ts("2024-01-10 12:00:00"), ts("2024-01-03 12:00:00")).toDF("t")
    val out = Windows.aggregate(df,
      WindowingStrategy(CalendarWindows("week", 2, startDayOfWeek = 4)),
      col("t"), Seq.empty, Seq(count(lit(1)).as("n")))
      .select(col("window.start").cast("string"), col("window.end").cast("string"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(out == Set(
      Seq("2024-01-04 00:00:00", "2024-01-18 00:00:00", 1L),
      Seq("2023-12-21 00:00:00", "2024-01-04 00:00:00", 1L)), out.toString)
  }

  test("months(3).withStartingMonth(2014,1).beginningOnDay(15): quarters changing on the 15th") {
    // the reference's own javadoc example (CalendarWindows.java:34),
    // built with the reference-shaped fluent constructors
    val cw = CalendarWindows.months(3).withStartingMonth(2014, 1).beginningOnDay(15)
    val df = Seq(ts("2024-02-20 08:00:00"), ts("2024-01-10 08:00:00")).toDF("t")
    val out = Windows.aggregate(df, WindowingStrategy(cw),
      col("t"), Seq.empty, Seq(count(lit(1)).as("n")))
      .select(col("window.start").cast("string"), col("window.end").cast("string"))
      .collect().map(_.toSeq).toSet
    assert(out == Set(
      Seq("2024-01-15 00:00:00", "2024-04-15 00:00:00"),
      Seq("2023-10-15 00:00:00", "2024-01-15 00:00:00")), out.toString)
  }

  test("calendarWindowExpr: no active session at construction is an ERROR, not a skipped guard") {
    // the UTC-session check can only run if a session is visible; silently
    // skipping it would let a later non-UTC execution double-shift
    val cw = CalendarWindows("day")
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try intercept[IllegalStateException] { Windows.calendarWindowExpr(cw, col("t")) }
    finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    // restored session: construction works again
    Windows.calendarWindowExpr(cw, col("t"))
  }

  test("withTimeZone: day window over a spring-forward transition is 23 wall-clock hours") {
    val ny = java.time.ZoneId.of("America/New_York")
    val cw = CalendarWindows("day", timeZone = "America/New_York")
    // 2024-03-10: 02:00 EST -> 03:00 EDT. 15:00Z is 11:00 EDT that day.
    val el = java.time.Instant.parse("2024-03-10T15:00:00Z")
    val df = Seq(Timestamp.from(el)).toDF("t")
    val r = df.select(Windows.calendarWindowExpr(cw, col("t")).as("w"))
      .select(col("w.start"), col("w.end")).collect()(0)
    val expectedStart = java.time.LocalDate.of(2024, 3, 10).atStartOfDay(ny).toInstant
    val expectedEnd = java.time.LocalDate.of(2024, 3, 11).atStartOfDay(ny).toInstant
    assert(r.getTimestamp(0).getTime == expectedStart.toEpochMilli)
    assert(r.getTimestamp(1).getTime == expectedEnd.toEpochMilli)
    assert(r.getTimestamp(1).getTime - r.getTimestamp(0).getTime == 23L * 3600 * 1000,
      "spring-forward day must span 23 hours")
  }

  test("calendar Column expression and JVM mirror agree (DST sweeps, clamping, pre-anchor)") {
    val configs = Seq(
      CalendarWindows("day", 1, "America/New_York"),
      CalendarWindows("day", 3, "America/New_York"),
      CalendarWindows("week", 2, "America/New_York", startDayOfWeek = 4),
      CalendarWindows("month", 2, "America/New_York", dayOfMonth = 31),
      CalendarWindows("year", 1, "America/New_York", monthOfYear = 3, dayOfMonth = 10),
      CalendarWindows("month", 3, "UTC", dayOfMonth = 15, startYear = 2014, startMonth = 1))
    val instants =
      (0 until 120).map(h => java.time.Instant.parse("2024-03-08T00:30:00Z").plusSeconds(h * 3600L)) ++
      (0 until 96).map(h => java.time.Instant.parse("2024-11-01T00:30:00Z").plusSeconds(h * 3600L)) ++
      Seq(java.time.Instant.parse("2024-02-29T13:00:00Z"),   // leap-day clamp interplay
          java.time.Instant.parse("1969-05-01T12:00:00Z"))   // pre-anchor: floor, not trunc
    val df = instants.map(Timestamp.from).toDF("t")
    for (cw <- configs) {
      val got = df.select(col("t"), Windows.calendarWindowExpr(cw, col("t")).as("w"))
        .select(col("t"), col("w.start"), col("w.end")).collect()
      got.foreach { r =>
        val (t, s, e) = (r.getTimestamp(0), r.getTimestamp(1), r.getTimestamp(2))
        assert(s.getTime == Windows.calendarWindowStartMs(cw, t.getTime),
          s"$cw start mismatch at $t: expr=$s jvm=${Windows.calendarWindowStartMs(cw, t.getTime)}")
        assert(e.getTime == Windows.calendarWindowEndMs(cw, s.getTime),
          s"$cw end mismatch at $t")
        assert(s.getTime <= t.getTime && t.getTime < e.getTime,
          s"$cw window [$s, $e) must contain $t")
      }
    }
  }

  test("slidingWindowStartsCovering: randomized differential vs window() membership") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val (sizeUs, periodUs) = (3600L * 1000000, 900L * 1000000)
    // pairs hugging the interesting region: gaps from 0 to ~1.5x window size,
    // with sub-period jitter so pairs straddle grid boundaries both ways
    val base = 1700000000000000L
    val fixtures = (0 until 300).map { i =>
      val lo = base + rnd.nextLong(7L * 24 * 3600 * 1000000)
      val hi = lo + (rnd.nextInt(5500) * 1000000L) + rnd.nextInt(1000000)
      (i.toLong, lo, hi)
    }
    // brute force: every grid start in [hi - size, lo] (epoch-aligned)
    val expected = fixtures.map { case (id, lo, hi) =>
      val starts = (Math.floorDiv(hi - sizeUs, periodUs) to
          Math.floorDiv(lo, periodUs)).map(_ * periodUs)
        .filter(s => s <= lo && hi < s + sizeUs)
      id -> starts
    }.toMap
    val got = fixtures.toDF("id", "lo", "hi")
      .select(col("id"), Windows.slidingWindowStartsCovering(
        timestamp_micros(col("lo")), timestamp_micros(col("hi")),
        "1 hour", "15 minutes").as("ws"))
      .select(col("id"), transform(col("ws"), w => unix_micros(w)).as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    fixtures.foreach { case (id, lo, hi) =>
      assert(got(id) == expected(id),
        s"mismatch at id=$id lo=$lo hi=$hi: got=${got(id)} want=${expected(id)}")
    }
    // an element alone is covered by exactly size/period windows — the same
    // membership count the SlidingWindows aggregate produces
    assert(expected.values.forall(_.size <= 4))
    val single = fixtures.map { case (id, lo, _) => (id, lo, lo) }
    val singleGot = single.toDF("id", "lo", "hi")
      .select(size(Windows.slidingWindowStartsCovering(
        timestamp_micros(col("lo")), timestamp_micros(col("hi")),
        "1 hour", "15 minutes")).as("n"))
      .collect().map(_.getInt(0))
    assert(singleGot.forall(_ == 4))
  }

  test("slidingWindowStartsCovering: month-bearing intervals are rejected") {
    intercept[IllegalArgumentException] {
      Windows.slidingWindowStartsCovering(lit(null), lit(null), "1 month", "1 day")
    }
  }

  test("consecutivePairs: pair-level walk matches sliding(2); empty/singleton empty") {
    import spark.implicits._
    val fixtures = Seq(
      (0L, Seq(3L, 1L, 4L, 1L, 5L)), (1L, Seq(7L)), (2L, Seq.empty[Long]))
    val got = fixtures.toDF("id", "arr")
      .select(col("id"), graft.operators.Aggregates.consecutivePairs(col("arr")).as("p"))
      .select(col("id"), transform(col("p"),
        x => struct(x.getField("prev"), x.getField("cur"))).as("p"))
      .as[(Long, Seq[(Long, Long)])].collect().toMap
    assert(got(0L) == Seq((3L, 1L), (1L, 4L), (4L, 1L), (1L, 5L)))
    assert(got(1L).isEmpty && got(2L).isEmpty)
  }

  test("ewma: hand-computed recurrence, per-key independence, order respected") {
    def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      (1L, ts(1), 10.0, 1L), (1L, ts(2), 20.0, 2L), (1L, ts(3), 0.0, 3L),
      (2L, ts(1), 100.0, 9L)
    ).toDF("k", "ts", "v", "id")
    val got = Windows.ewma(rows, col("k"), col("ts"), col("id"), col("v"), 0.5)
      .select(col("key"), col("ord"), col("ewma"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // key 1: 10; .5*20+.5*10=15; .5*0+.5*15=7.5 — key 2 unaffected
    assert(got == Map((1L, 1L) -> 10.0, (1L, 2L) -> 15.0,
      (1L, 3L) -> 7.5, (2L, 9L) -> 100.0), got.toString)
    val e = intercept[IllegalArgumentException] {
      Windows.ewma(rows, col("k"), col("ts"), col("id"), col("v"), 1.5)
    }
    assert(e.getMessage.contains("alpha"))
  }

  test("rollingZScore: hand-computed frame stats, min-obs null, constant-frame null") {
    def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // key 1: values 1..6; at row 6 the trailing-3 frame is {4,5,6}:
    // mean 5, stddev_samp 1 → z = (6-5)/1 = 1.0
    val rows = (1 to 6).map(i => (1L, ts(i), i.toDouble, i.toLong)) ++
      Seq((2L, ts(1), 7.0, 10L), (2L, ts(2), 7.0, 11L),
        (2L, ts(3), 7.0, 12L), (2L, ts(4), 7.0, 13L)) // constant → stddev 0
    val got = Windows.rollingZScore(rows.toDF("k", "ts", "v", "id"),
        col("k"), Seq(col("ts"), col("id")), col("v"), window = 3, minObs = 3)
      .select(col("id"), col("z")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got(1L).isEmpty && got(2L).isEmpty, "below minObs → null")
    assert(got(3L) == Some(1.0) && got(6L) == Some(1.0), got.toString)
    assert(Seq(12L, 13L).forall(got(_).isEmpty), "constant frame → null")
    val e = intercept[IllegalArgumentException] {
      Windows.rollingZScore(rows.toDF("k", "ts", "v", "id"),
        col("k"), Seq.empty, col("v"), 10)
    }
    assert(e.getMessage.contains("ordering"))
  }

  test("resampleFill: dense grid, forward fill, leading nulls, same-slot tiebreak, slot cap") {
    def ts(h: Int, m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (1L, ts(0, 30), 10.0, 1L),
      (1L, ts(0, 45), 11.0, 2L),  // same hour slot, later → wins the slot
      (1L, ts(3, 10), 30.0, 3L),  // slots 1-2 empty → forward-filled 11.0
      (2L, ts(5, 0), 50.0, 4L)    // singleton key: one slot
    ).toDF("user_id", "ts", "value", "event_id")
    val got = Windows.resampleFill(rows, col("user_id"), col("ts"), col("value"),
        stepSeconds = 3600L, order = Seq(col("event_id")))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 00:00:00.0", Some(11.0), false),
      (1L, "2024-01-01 01:00:00.0", Some(11.0), true),
      (1L, "2024-01-01 02:00:00.0", Some(11.0), true),
      (1L, "2024-01-01 03:00:00.0", Some(30.0), false),
      (2L, "2024-01-01 05:00:00.0", Some(50.0), false)), got.mkString("; "))
    // span/step blowup fails loud at execution
    val wide = Seq((1L, ts(0, 0), 1.0, 1L),
      (1L, Timestamp.valueOf("2026-01-01 00:00:00"), 2.0, 2L))
      .toDF("user_id", "ts", "value", "event_id")
    val e = intercept[Exception] {
      Windows.resampleFill(wide, col("user_id"), col("ts"), col("value"),
        stepSeconds = 60L, maxSlotsPerKey = 1000L).collect()
    }
    assert(e.getMessage != null)
  }

  test("sessionize: gap starts a new session; boundary gap stays; per-key independent") {
    def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(40), 3L), // 30-min gap = SAME session (strict >)
      (1L, ts(45), 4L),
      (2L, ts(0), 5L), (2L, ts(31), 6L),                    // 31 min → new session
      (3L, ts(5), 7L)                                        // singleton
    ).toDF("user_id", "ts", "event_id")
    val got = Windows.sessionize(rows, col("user_id"), col("ts"),
        gapSeconds = 1800L, order = Seq(col("event_id")))
      .select(col("event_id"), col("session_idx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> 1L, 7L -> 0L), got.toString)
    val e = intercept[IllegalArgumentException] {
      Windows.sessionize(rows.withColumn("session_idx", lit(0)),
        col("user_id"), col("ts"), 1800L)
    }
    assert(e.getMessage.contains("session_idx"))
  }
}
