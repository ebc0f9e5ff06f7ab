package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Windows
import graft.operators.Windows.{FixedWindows, WindowingStrategy}
import graft.streaming.Triggers
import graft.streaming.Triggers._
import graft.testing.DoFnTester

/** The mobile-game example pipelines, end-to-end over the library's own ops
  * (reference: examples/java8/.../complete/game/UserScore.java,
  * HourlyTeamScore.java, LeaderBoard.java and their tests — UserScoreTest
  * .java, HourlyTeamScoreTest.java, LeaderBoardTest.java). The conformance
  * suites pin each operator in isolation; this suite is the composition
  * capstone: the reference tests' own fixtures and golden outputs, produced
  * by chaining parse → filter → window → triggered aggregate exactly as the
  * examples do.
  *
  * Streaming scenarios scale the reference's processing-time trigger delays
  * from minutes to milliseconds (processing time is wall-clock in Spark —
  * TestStream.scala narrowing); watermark-driven behavior (on-time panes,
  * late panes, final panes, droppably-late drops) is untouched by that
  * scaling because those firings depend only on event time.
  */
class GameExamplesSpec extends SparkSpec {
  import spark.implicits._

  // ----- UserScoreTest.java fixtures (GAME_EVENTS_ARRAY, USER_SUMS, TEAM_SUMS)

  private val gameEvents = Seq(
    "user0_MagentaKangaroo,MagentaKangaroo,3,1447955630000,2015-11-19 09:53:53.444",
    "user13_ApricotQuokka,ApricotQuokka,15,1447955630000,2015-11-19 09:53:53.444",
    "user6_AmberNumbat,AmberNumbat,11,1447955630000,2015-11-19 09:53:53.444",
    "user7_AlmondWallaby,AlmondWallaby,15,1447955630000,2015-11-19 09:53:53.444",
    "user7_AndroidGreenKookaburra,AndroidGreenKookaburra,12,1447955630000,2015-11-19 09:53:53.444",
    "user6_AliceBlueDingo,AliceBlueDingo,4,xxxxxxx,2015-11-19 09:53:53.444",
    "user7_AndroidGreenKookaburra,AndroidGreenKookaburra,11,1447955630000,2015-11-19 09:53:53.444",
    "THIS IS A PARSE ERROR,2015-11-19 09:53:53.444",
    "user19_BisqueBilby,BisqueBilby,6,1447955630000,2015-11-19 09:53:53.444",
    "user19_BisqueBilby,BisqueBilby,8,1447955630000,2015-11-19 09:53:53.444")

  private val userSums = Seq(
    ("user0_MagentaKangaroo", 3L), ("user13_ApricotQuokka", 15L),
    ("user6_AmberNumbat", 11L), ("user7_AlmondWallaby", 15L),
    ("user7_AndroidGreenKookaburra", 23L), ("user19_BisqueBilby", 14L))

  private val teamSums = Seq(
    ("MagentaKangaroo", 3L), ("ApricotQuokka", 15L), ("AmberNumbat", 11L),
    ("AlmondWallaby", 15L), ("AndroidGreenKookaburra", 23L), ("BisqueBilby", 14L))

  /** UserScore's parse, columnar (UserScore.java ParseEventFn: split on ",",
    * trim, drop rows whose score/timestamp don't parse): stays codegen'd so
    * at 100 TB the parse happens inside the scan's WholeStageCodegen span. */
  private def parseGameEvents(lines: DataFrame): DataFrame =
    lines
      .select(split(col("line"), ",").as("f"))
      .filter(size(col("f")) >= 4)
      .select(
        trim(element_at(col("f"), 1)).as("user"),
        trim(element_at(col("f"), 2)).as("team"),
        expr("try_cast(trim(f[2]) AS BIGINT)").as("score"),
        expr("try_cast(trim(f[3]) AS BIGINT)").as("ts_ms"))
      .filter(col("score").isNotNull && col("ts_ms").isNotNull)

  test("UserScore: ParseEventFn via DoFnTester (UserScoreTest.testParseEventFn)") {
    val tester = DoFnTester.of(new ParseGameEventFn)
    val results = tester.processBundle(gameEvents)
    assert(results.size == 8)
    assert(results.head == (("user0_MagentaKangaroo", "MagentaKangaroo", 3L, 1447955630000L)))
    // the two malformed lines land on the error tag, like the reference's
    // ParseError counter
    assert(tester.peekOutputElements("parse_error").size == 2)
    tester.close()
  }

  test("UserScore: ExtractAndSumScore per user and per team (testUserScoreSums/testTeamScoreSums)") {
    val parsed = parseGameEvents(gameEvents.toDF("line"))
    val byUser = parsed.groupBy(col("user").as("k")).agg(sum("score").as("total"))
    assertRows(byUser, userSums.map(t => Seq(t._1, t._2)))
    val byTeam = parsed.groupBy(col("team").as("k")).agg(sum("score").as("total"))
    assertRows(byTeam, teamSums.map(t => Seq(t._1, t._2)))
  }

  // ----- HourlyTeamScoreTest.java: min-timestamp filter + hourly windows

  private val hourlyEvents = Seq(
    "user0_MagentaKangaroo,MagentaKangaroo,3,1447955630000,2015-11-19 09:53:53.444",
    "user13_ApricotQuokka,ApricotQuokka,15,1447955630000,2015-11-19 09:53:53.444",
    "user6_AmberNumbat,AmberNumbat,11,1447955630000,2015-11-19 09:53:53.444",
    "user7_AlmondWallaby,AlmondWallaby,15,1447955630000,2015-11-19 09:53:53.444",
    "user7_AndroidGreenKookaburra,AndroidGreenKookaburra,12,1447955630000,2015-11-19 09:53:53.444",
    "user7_AndroidGreenKookaburra,AndroidGreenKookaburra,11,1447955630000,2015-11-19 09:53:53.444",
    "user19_BisqueBilby,BisqueBilby,6,1447955630000,2015-11-19 09:53:53.444",
    "user19_BisqueBilby,BisqueBilby,8,1447955630000,2015-11-19 09:53:53.444",
    "user0_AndroidGreenEchidna,AndroidGreenEchidna,0,1447965690000,2015-11-19 12:41:31.053",
    "user0_MagentaKangaroo,MagentaKangaroo,4,1447965690000,2015-11-19 12:41:31.053",
    "user2_AmberCockatoo,AmberCockatoo,13,1447965690000,2015-11-19 12:41:31.053",
    "user18_BananaEmu,BananaEmu,7,1447965690000,2015-11-19 12:41:31.053",
    "user3_BananaEmu,BananaEmu,17,1447965690000,2015-11-19 12:41:31.053",
    "user18_BananaEmu,BananaEmu,1,1447965690000,2015-11-19 12:41:31.053",
    "user18_ApricotCaneToad,ApricotCaneToad,14,1447965690000,2015-11-19 12:41:31.053")

  test("HourlyTeamScore: start-time filter (testUserScoresFilter) + hourly team windows") {
    val startMin = 1447965680000L
    val parsed = parseGameEvents(hourlyEvents.toDF("line"))
    val filtered = parsed.filter(col("ts_ms") > startMin)
    assertRows(filtered.select(col("user"), col("score")), Seq(
      Seq("user0_AndroidGreenEchidna", 0L), Seq("user0_MagentaKangaroo", 4L),
      Seq("user2_AmberCockatoo", 13L), Seq("user18_BananaEmu", 7L),
      Seq("user3_BananaEmu", 17L), Seq("user18_BananaEmu", 1L),
      Seq("user18_ApricotCaneToad", 14L)))
    // the pipeline's tail: fixed hourly windows, team-score sums
    // (HourlyTeamScore.java — Window.into(FixedWindows.of(1 hour)))
    val windowed = Windows.aggregate(
      filtered.withColumn("t", timestamp_millis(col("ts_ms"))),
      WindowingStrategy(FixedWindows("1 hour")), col("t"),
      Seq(col("team")), Seq(sum("score").as("total")))
    // all filtered events fall in [12:00, 13:00) UTC on 2015-11-19
    // (compare epoch ms — Timestamp renders in the JVM zone, windows are UTC)
    val hourStartMs = 1447963200000L
    val rows = windowed.select(col("window.start"), col("team"), col("total")).collect()
    assert(rows.forall(_.getTimestamp(0).getTime == hourStartMs), rows.mkString(";"))
    assert(rows.map(r => (r.getString(1), r.getLong(2))).toSet == Set(
      ("AndroidGreenEchidna", 0L), ("MagentaKangaroo", 4L), ("AmberCockatoo", 13L),
      ("BananaEmu", 25L), ("ApricotCaneToad", 14L)))
  }

  test("WeeklyTeamScore: the HourlyTeamScore pipeline on weeks(1, Thursday) " +
    "through the trigger engine") {
    // HourlyTeamScore.java parameterized by window fn: same parse → window →
    // team-sum shape, but on an anchored multi-unit calendar window
    // (CalendarWindows.weeks(1, THURSDAY)) running through the streaming
    // pane processor. 2015-11-19 is a grid Thursday (epoch day 16758 =
    // 7·2394), so every fixture event lands in [2015-11-19, 2015-11-26).
    val cw = Windows.CalendarWindows("week", 1, startDayOfWeek = 4)
    val input = MemoryStream[(String, Timestamp, Long)](spark)
    val assigned = Triggers.assignCalendarWindows(
      input.toDF().toDF("k", "t", "v").withWatermark("t", "0 seconds")
        .as[(String, Timestamp, Long)], cw)
    val panes = Triggers.triggeredAggregate(assigned, sumFn,
      TriggerConfig(windowSizeMs = 0L, calendar = Some(cw)))
    val q = panes.toDF("k", "wstart", "wend", "value", "pane_index", "timing", "is_final")
      .writeStream.format("memory").queryName("weekly_team")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      val parsed = parseGameEvents(hourlyEvents.toDF("line"))
        .select(col("team"), col("ts_ms"), col("score")).collect()
        .map(r => (r.getString(0), new Timestamp(r.getLong(1)), r.getLong(2))).toSeq
      input.addData(parsed: _*)
      q.processAllAvailable()
      input.addData(("__wm", new Timestamp(graft.testing.TestStream.EndOfTimeMs), 0L))
      q.processAllAvailable()
      val got = spark.table("weekly_team").collect()
        .filter(_.getAs[String]("k") != "__wm")
        .map(r => (r.getAs[String]("k"), r.getAs[Long]("wstart"), r.getAs[Long]("wend"),
          r.getAs[Long]("value"), r.getAs[String]("timing")))
      val weekStartMs = 16758L * 86400000 // 2015-11-19 00:00 UTC
      assert(got.forall(p => p._2 == weekStartMs && p._3 == weekStartMs + 7L * 86400000),
        got.mkString(";"))
      assert(got.forall(_._5 == "ON_TIME"), got.mkString(";"))
      assert(got.map(p => (p._1, p._4)).toSet == Set(
        ("MagentaKangaroo", 7L), ("ApricotQuokka", 15L), ("AmberNumbat", 11L),
        ("AlmondWallaby", 15L), ("AndroidGreenKookaburra", 23L), ("BisqueBilby", 14L),
        ("AndroidGreenEchidna", 0L), ("AmberCockatoo", 13L), ("BananaEmu", 25L),
        ("ApricotCaneToad", 14L)), got.mkString(";"))
    } finally q.stop()
  }

  // ----- GameStatsTest.java: abuse detection via a singleton side input

  test("GameStats: CalculateSpammyUsers filters by 2.5x the global mean (testCalculateSpammyUsers)") {
    val userScores = Seq(
      ("Robot-2", 66L), ("Robot-1", 116L), ("user7_AndroidGreenKookaburra", 23L),
      ("user7_AndroidGreenKookaburra", 1L), ("user19_BisqueBilby", 14L),
      ("user13_ApricotQuokka", 15L), ("user18_BananaEmu", 25L),
      ("user6_AmberEchidna", 8L), ("user2_AmberQuokka", 6L),
      ("user0_MagentaKangaroo", 4L), ("user0_MagentaKangaroo", 3L),
      ("user2_AmberCockatoo", 13L), ("user7_AlmondWallaby", 15L),
      ("user6_AmberNumbat", 11L), ("user6_AmberQuokka", 4L)).toDF("user", "score")
    // GameStats.CalculateSpammyUsers (GameStats.java:109): per-user sums,
    // global mean of the sums as a singleton view, keep users above
    // SCORE_WEIGHT(2.5) x mean. The view is the library's View.asSingleton;
    // the filter stays a codegen'd predicate over the broadcast scalar.
    val sums = userScores.groupBy("user").agg(sum("score").as("total"))
    val globalMean = graft.operators.Joins.viewAsSingleton[Double](
      spark, sums.agg(avg("total")), _.getDouble(0))
    val spammers = sums.filter(col("total") > lit(globalMean.value) * 2.5)
    assertRows(spammers, Seq(Seq("Robot-2", 66L), Seq("Robot-1", 116L)))
  }

  // ----- LeaderBoardTest.java: CalculateTeamScores through the trigger engine

  private val sumFn: graft.functions.CombineFn[Long, Long, Long] =
    new graft.functions.CombineFn[Long, Long, Long] {
      def createAccumulator(): Long = 0L
      def addInput(acc: Long, in: Long): Long = acc + in
      def mergeAccumulators(a: Long, b: Long): Long = a + b
      def extractOutput(acc: Long): Long = acc
    }

  private val TeamWindowMs = 20 * 60 * 1000L   // TEAM_WINDOW_DURATION = 20 min
  private val AllowedLatenessMs = 60 * 60 * 1000L // ALLOWED_LATENESS = 1 hour

  /** CalculateTeamScores (LeaderBoard.java:263): fixed windows, trigger
    * AfterWatermark.pastEndOfWindow().withEarlyFirings(AfterProcessingTime…)
    * .withLateFirings(AfterProcessingTime…), accumulating panes. Delays are
    * scaled minutes→ms for test wall-clock. Returns panes for the window at
    * wstart=0 as (team, total, timing, is_final) in firing order. */
  private def calculateTeamScores(name: String, earlyDelayMs: Long, lateDelayMs: Long)(
      script: (MemoryStream[(String, Timestamp, Long)],
               org.apache.spark.sql.streaming.StreamingQuery) => Unit): Seq[(String, Long, String, Boolean)] = {
    val input = MemoryStream[(String, Timestamp, Long)](spark)
    val assigned = Triggers.assignFixedWindows(
      input.toDF().toDF("k", "t", "v").withWatermark("t", "0 seconds")
        .as[(String, Timestamp, Long)], TeamWindowMs)
    val panes = Triggers.triggeredAggregateComposite(assigned, sumFn,
      AfterWatermarkEL(Some(AfterProcessingTimeT(earlyDelayMs)),
        Some(AfterProcessingTimeT(lateDelayMs))),
      windowSizeMs = TeamWindowMs, allowedLatenessMs = AllowedLatenessMs,
      accumulating = true)
    val q = panes.toDF("k", "wstart", "wend", "value", "pane_index", "timing", "is_final")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try script(input, q) finally q.stop()
    val out = spark.table(name).collect()
      .filter(r => r.getAs[String]("k") != "__wm" && r.getAs[Long]("wstart") == 0L)
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("value"),
        r.getAs[String]("timing"), r.getAs[Boolean]("is_final")))
      .toSeq
    spark.catalog.dropTempView(name)
    out
  }

  private def wm(input: MemoryStream[(String, Timestamp, Long)], toMs: Long): Unit =
    input.addData(("__wm", new Timestamp(toMs), 0L))

  private def min(m: Long) = m * 60 * 1000L
  private def sec(s: Long) = s * 1000L

  test("LeaderBoard: team scores on time (testTeamScoresOnTime)") {
    val panes = calculateTeamScores("game_ontime", min(5), min(10)) { (input, q) =>
      wm(input, 0L); q.processAllAvailable()
      input.addData(("blue", new Timestamp(sec(3)), 3L),
        ("blue", new Timestamp(min(1)), 2L),
        ("red", new Timestamp(sec(22)), 3L),
        ("blue", new Timestamp(min(3)), 5L))
      q.processAllAvailable()
      wm(input, min(3)); q.processAllAvailable()
      input.addData(("red", new Timestamp(min(4)), 1L),
        ("blue", new Timestamp(sec(270)), 2L))
      q.processAllAvailable()
      wm(input, graft.testing.TestStream.EndOfTimeMs); q.processAllAvailable()
    }
    // 5/10-minute processing-time delays never elapse in test wall-clock, so
    // exactly the reference's expectation: one ON_TIME pane per team
    val onTime = panes.filter(_._3 == "ON_TIME").map(p => (p._1, p._2)).toSet
    assert(onTime == Set(("blue", 12L), ("red", 4L)), panes.toString)
    assert(panes.forall(_._3 == "ON_TIME"), s"no early/late panes expected: $panes")
  }

  test("LeaderBoard: observably late data refines in late and final panes (testTeamScoresObservablyLate)") {
    // the early delay is scaled to 300ms so the speculative pane actually
    // fires in test time; the late delay stays unreachable, like the
    // reference's 10 minutes, so pending late data flushes in the FINAL
    // pane at window close — the exact shape LeaderBoardTest pins
    val panes = calculateTeamScores("game_late", 300L, min(10)) { (input, q) =>
      wm(input, 0L); q.processAllAvailable()
      input.addData(("blue", new Timestamp(sec(3)), 3L),
        ("blue", new Timestamp(min(8)), 5L))
      q.processAllAvailable()
      Thread.sleep(700)
      // speculative pane (blue 8): the delay-0 watermark already rode to
      // 8min on the blue elements themselves, and the engine re-arms its
      // quiescent-key catch-up timer just past the CURRENT watermark — so
      // the wake that observes the elapsed proc-time deadline needs a
      // sentinel above 8min (the reference's wm→3min step can't wake it
      // under this documented narrowing)
      wm(input, min(9)); q.processAllAvailable()
      input.addData(("red", new Timestamp(min(1)), 3L),
        ("red", new Timestamp(min(2)), 4L),
        ("blue", new Timestamp(min(5)), 3L))
      q.processAllAvailable()
      // watermark just short of window close (end + lateness = 80 min):
      // passes end-of-window, so ON_TIME panes fire
      wm(input, min(79)); q.processAllAvailable()
      // observably late (behind the watermark, inside allowed lateness)
      input.addData(("red", new Timestamp(0L), 2L),
        ("red", new Timestamp(min(1)), 5L),
        ("red", new Timestamp(min(3)), 3L))
      q.processAllAvailable()
      input.addData(("red", new Timestamp(min(1)), 9L),
        ("red", new Timestamp(min(3)), 1L))
      q.processAllAvailable()
      wm(input, graft.testing.TestStream.EndOfTimeMs); q.processAllAvailable()
    }
    // the speculative (EARLY) blue pane observed processing time passing
    assert(panes.contains(("blue", 8L, "EARLY", false)), panes.toString)
    val onTime = panes.filter(_._3 == "ON_TIME").map(p => (p._1, p._2)).toMap
    assert(onTime == Map("blue" -> 11L, "red" -> 7L), panes.toString)
    // accumulating: the window's total history contains blue 11 and red 27
    assert(panes.map(p => (p._1, p._2)).contains(("blue", 11L)), panes.toString)
    assert(panes.map(p => (p._1, p._2)).contains(("red", 27L)), panes.toString)
    // the final (GC) pane carries red's full refinement; blue has no
    // post-on-time data, so FIRE_IF_NON_EMPTY emits no blue final pane
    val finals = panes.filter(_._4).map(p => (p._1, p._2))
    assert(finals == Seq(("red", 27L)), panes.toString)
  }

  test("LeaderBoard: droppably late data is dropped (testTeamScoresDroppablyLate)") {
    val panes = calculateTeamScores("game_dropped", min(5), min(10)) { (input, q) =>
      input.addData(("blue", new Timestamp(0L), 12L),
        ("red", new Timestamp(0L), 3L))
      q.processAllAvailable()
      wm(input, TeamWindowMs - 1000L); q.processAllAvailable()
      // behind the watermark but before end-of-window: still on time
      input.addData(("red", new Timestamp(min(2)), 4L),
        ("blue", new Timestamp(0L), 3L),
        ("blue", new Timestamp(min(3)), 3L))
      q.processAllAvailable()
      wm(input, TeamWindowMs); q.processAllAvailable()
      // past end + allowed lateness: the window is expired
      wm(input, TeamWindowMs + AllowedLatenessMs + min(1)); q.processAllAvailable()
      input.addData(("blue", new Timestamp(TeamWindowMs - sec(5)), 3L),
        ("red", new Timestamp(min(4)), 7L))
      q.processAllAvailable()
      wm(input, graft.testing.TestStream.EndOfTimeMs); q.processAllAvailable()
    }
    // only the ON_TIME panes; the droppably-late elements left no trace
    assert(panes.map(p => (p._1, p._2, p._3)).toSet ==
      Set(("blue", 18L, "ON_TIME"), ("red", 7L, "ON_TIME")), panes.toString)
  }

  // ----- DebuggingWordCount (examples/DebuggingWordCount.java:76-117 +
  // DebuggingWordCountTest.java:45): CountWords → regex FilterTextFn with
  // matchedWords/unmatchedWords counters → PAssert.containsInAnyOrder

  test("DebuggingWordCount: regex filter + metrics counters + PAssert (testDebuggingWordCount)") {
    val tmp = java.nio.file.Files.createTempDirectory("dwc").toFile
    try {
      val in = new java.io.File(tmp, "input.txt")
      java.nio.file.Files.write(in.toPath,
        "stomach secret Flourish message Flourish here Flourish"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))

      val matched = Metrics.counter(spark, "dwc.matchedWords")
      val unmatched = Metrics.counter(spark, "dwc.unmatchedWords")

      val counts = graft.sources.IO.readText(spark, in.getAbsolutePath)
        .toDF("line")
        .select(explode(split(col("line"), "[^a-zA-Z']+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      // FilterTextFn's counters observe every element; the filter itself
      // stays a declarative predicate so the plan keeps pushdown/codegen
      val pattern = "Flourish|stomach"
      val observed = counts.withColumn("__m", col("word").rlike("^(" + pattern + ")$"))
        .mapPartitions { it =>
          it.map { r =>
            if (r.getAs[Boolean]("__m")) matched.add(1) else unmatched.add(1)
            r
          }
        }(org.apache.spark.sql.Encoders.row(counts.schema.add("__m", "boolean")))
      val filtered = observed.filter(col("__m")).drop("__m")

      graft.testing.PAssert.containsInAnyOrder(filtered,
        Seq(Seq("Flourish", 3L), Seq("stomach", 1L)))
      assert(Metrics.counterValue(spark, "dwc.matchedWords").contains(2L))
      assert(Metrics.counterValue(spark, "dwc.unmatchedWords").contains(3L))
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }
}

/** UserScore.ParseEventFn (UserScore.java:98): csv → (user, team, score,
  * timestamp); malformed rows to the "parse_error" tag (the reference
  * increments a ParseError counter and drops the row). Top-level for
  * serializability under the DoFnTester partition bridge. */
class ParseGameEventFn extends DoFnTester.DoFn[String, (String, String, Long, Long)] {
  def processElement(line: String,
      out: DoFnTester.MultiOutputReceiver[(String, String, Long, Long)]): Unit = {
    val parts = line.split(",").map(_.trim)
    try {
      if (parts.length < 4) throw new IllegalArgumentException("too few fields")
      out.output((parts(0), parts(1), parts(2).toLong, parts(3).toLong))
    } catch {
      case _: IllegalArgumentException | _: NumberFormatException =>
        out.output("parse_error", ("", line, 0L, 0L))
    }
  }
}
