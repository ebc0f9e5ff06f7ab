package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Triggers
import graft.streaming.Triggers._
import graft.testing.CombineFnTester

/** Conformance port of the reference's trigger-transcript corpus
  * (reference: sdks/python/apache_beam/testing/data/trigger_transcripts.yaml,
  * executed there by PYSDK/transforms/trigger_test.py:440-552). Scenarios
  * are transcribed as data: Input/Watermark events drive a MemoryStream
  * (watermark advances via a sentinel key, since Spark's watermark is
  * max(event_time) − delay), Expect events assert pane contents.
  * Element timestamps double as values, as in the YAML. Fixed windows only
  * (the sessions scenario needs merging windows — SURVEY §4.2 deferred).
  */
class TriggerTranscriptSpec extends SparkSpec {
  import spark.implicits._

  sealed trait Event
  case class Input(ts: Seq[Long]) extends Event
  case class Watermark(ts: Long) extends Event
  /** One expected pane; None attributes are unchecked — partial matching
    * like the YAML's attribute subsets. `we` (window end, sec) is only
    * pinned by the bad_expected_window row. */
  case class ExpectedPane(ws: Long, values: Seq[Long],
                          timing: Option[String] = None,
                          isFinal: Option[Boolean] = None,
                          we: Option[Long] = None)
  case class Expect(panes: Seq[ExpectedPane]) extends Event

  private def runTranscript(name: String, trigger: TriggerAst, windowSec: Long,
                            latenessSec: Long, accumulating: Boolean,
                            transcript: Seq[Event]): Unit = {
    val input = MemoryStream[(String, Timestamp, Long)](spark)
    val assigned = Triggers.assignFixedWindows(
      input.toDF().toDF("k", "t", "v").withWatermark("t", "0 seconds")
        .as[(String, Timestamp, Long)], windowSec * 1000)
    val panes = Triggers.triggeredAggregateComposite(assigned, collectLongsFn, trigger,
      windowSizeMs = windowSec * 1000, allowedLatenessMs = latenessSec * 1000,
      accumulating = accumulating)
    val q = panes.toDF("k", "wstart", "wend", "values", "pane_index", "timing", "is_final")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    // (wstartSec, wendSec, values, timing, isFinal)
    def seenPanes(): Seq[(Long, Long, Seq[Long], String, Boolean)] =
      spark.table(name).collect().filter(_.getAs[String]("k") == "data")
        .map(r => (r.getAs[Long]("wstart") / 1000, r.getAs[Long]("wend") / 1000 - 1,
          r.getSeq[Long](3).toSeq,
          r.getAs[String]("timing"), r.getAs[Boolean]("is_final"))).toSeq
    var matched = 0
    try {
      transcript.foreach {
        case Input(ts) =>
          input.addData(ts.map(t => ("data", new Timestamp(t * 1000), t)): _*)
          q.processAllAvailable()
        case Watermark(t) =>
          input.addData(("__wm", new Timestamp(t * 1000), t))
          q.processAllAvailable()
        case Expect(expected) =>
          val newPanes = seenPanes().drop(matched)
          expected.foreach { e =>
            val hit = newPanes.find(p => p._1 == e.ws && p._3 == e.values &&
              e.timing.forall(_ == p._4) && e.isFinal.forall(_ == p._5) &&
              e.we.forall(_ == p._2))
            assert(hit.isDefined,
              s"[$name] Unmatched output: expected pane $e among new panes $newPanes")
          }
          assert(newPanes.size == expected.size,
            s"[$name] Unexpected output: extra panes $newPanes vs $expected")
          matched += newPanes.size
      }
      // end-of-transcript check (reference trigger_test.py: a transcript that
      // leaves fired panes unconsumed is itself invalid — the missing_output
      // rows pin this)
      val leftover = seenPanes().drop(matched)
      assert(leftover.isEmpty, s"[$name] Unexpected output: unconsumed panes $leftover")
    } finally q.stop()
  }

  test("transcript fixed_default") {
    runTranscript("t_fixed_default", RepeatedlyT(AfterWatermarkT), windowSec = 10,
      latenessSec = 1000, accumulating = true, Seq(
        Input(Seq(1, 2, 3, 10, 11)),
        Watermark(25),
        Expect(Seq(
          ExpectedPane(0L, Seq(1L, 2L, 3L), timing = Some("ON_TIME")),
          ExpectedPane(10L, Seq(10L, 11L), timing = Some("ON_TIME"))))))
  }

  test("transcript fixed_default_late_data") {
    runTranscript("t_fixed_late", RepeatedlyT(AfterWatermarkT), windowSec = 10,
      latenessSec = 1000, accumulating = true, Seq(
        Input(Seq(1, 2, 3, 10, 11, 25)),
        Watermark(100),
        Expect(Seq(
          ExpectedPane(0L, Seq(1L, 2L, 3L), timing = Some("ON_TIME"), isFinal = Some(false)),
          ExpectedPane(10L, Seq(10L, 11L), timing = Some("ON_TIME")),
          ExpectedPane(20L, Seq(25L), timing = Some("ON_TIME")))),
        Input(Seq(7)),
        Expect(Seq(
          ExpectedPane(0L, Seq(1L, 2L, 3L, 7L), timing = Some("LATE"))))))
  }

  test("transcript garbage_collection (AfterCount(2), discarding, lateness 10)") {
    runTranscript("t_gc", RepeatedlyT(AfterCountT(2)), windowSec = 10,
      latenessSec = 10, accumulating = false, Seq(
        Input(Seq(1, 2, 3, 10, 11, 25)),
        Expect(Seq(
          ExpectedPane(0L, Seq(1L, 2L, 3L), timing = Some("EARLY")),
          ExpectedPane(10L, Seq(10L, 11L), timing = Some("EARLY")))),
        // windows [0,9] and [10,19] fired and have nothing pending: they
        // close silently at GC (absent/tombstone in the YAML's state
        // assertions); [20,29] still holds its pending element and flushes
        // as a final pane at its GC horizon
        Watermark(100),
        Expect(Seq(
          ExpectedPane(20L, Seq(25L), isFinal = Some(true)))),
        Input(Seq(5)), // ancient input after GC: dropped
        Watermark(120),
        Expect(Seq.empty)))
  }

  test("transcripts timestamp_combiner_earliest / latest / eow") {
    // reference: timestamp_combiner_earliest / _latest rows — panes carry
    // the earliest/latest element time via CombineFns.withTimestamps;
    // OUTPUT_AT_EOW is the pane's window end (already in the Pane shape)
    val input = MemoryStream[(String, Timestamp, Long)](spark)
    // assignment carrying the event time next to the value
    val withTs = input.toDF().toDF("k", "t", "v")
      .withWatermark("t", "0 seconds").as[(String, Timestamp, Long)]
      .map { case (k, t, v) =>
        val ts = t.getTime
        (k, math.floorDiv(ts, 10000L) * 10000L, (ts, v))
      }
    val fn = graft.functions.CombineFns.withTimestamps(collectLongsFn)
    val panes = Triggers.triggeredAggregateComposite(withTs, fn,
      RepeatedlyT(AfterWatermarkT), windowSizeMs = 10000L, allowedLatenessMs = 1000000L)
    val q = panes.toDF("k", "wstart", "wend", "value", "pane_index", "timing", "is_final")
      .writeStream.format("memory").queryName("ts_combiner_test")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(("data", new Timestamp(1000), 1L), ("data", new Timestamp(2000), 2L),
                    ("data", new Timestamp(3000), 3L), ("data", new Timestamp(11000), 11L))
      q.processAllAvailable()
      input.addData(("__wm", new Timestamp(100000), 0L))
      q.processAllAvailable()
      val got = spark.table("ts_combiner_test").collect().filter(_.getString(0) == "data")
        .map { r =>
          val v = r.getStruct(3)
          (r.getAs[Long]("wstart") / 1000, r.getAs[Long]("wend") / 1000,
            v.getLong(0) / 1000, v.getLong(1) / 1000, v.getSeq[Long](2).toSeq)
        }.sortBy(_._1).toSeq
      // window [0,10): earliest=1 latest=3 EOW=10; window [10,20): 11/11/20
      assert(got == Seq(
        (0L, 10L, 1L, 3L, Seq(1L, 2L, 3L)),
        (10L, 20L, 11L, 11L, Seq(11L))), got.toString)
    } finally q.stop()
  }

  test("transcript known_late_data_watermark") {
    runTranscript("t_known_late", RepeatedlyT(AfterWatermarkT), windowSec = 10,
      latenessSec = 1000, accumulating = true, Seq(
        Watermark(5),
        Input(Seq(2, 3, 7, 8)),
        Watermark(11),
        Expect(Seq(
          ExpectedPane(0L, Seq(2L, 3L, 7L, 8L), timing = Some("ON_TIME"))))))
  }

  test("transcript known_late_data_no_watermark_hold_possible") {
    // reference row: watermark at 8, then input [2, 3, 7] — EVERY element
    // is behind the watermark, so no output-timestamp hold below 8 is
    // possible and the pane's timestamp falls to end-of-window (10). The
    // window itself still aggregates all three (they beat the GC horizon)
    // and fires one ON_TIME pane at watermark 11. Our panes always carry
    // the window end; the earliest/latest element times ride
    // CombineFns.withTimestamps (see the timestamp_combiner test), and the
    // EOW fallback this row pins is the window-end column itself.
    runTranscript("t_known_late_nohold", RepeatedlyT(AfterWatermarkT), windowSec = 10,
      latenessSec = 1000, accumulating = true, Seq(
        Watermark(8),
        Input(Seq(2, 3, 7)),
        Watermark(11),
        Expect(Seq(
          ExpectedPane(0L, Seq(2L, 3L, 7L), timing = Some("ON_TIME"))))))
  }

  // ---- custom-timestamping rows ----------------------------------------
  // reference rows timestamp_combiner_custom_timestamping_{eow,earliest} +
  // the OUTPUT_AT_EARLIEST_TRANSFORMED row (YAML reuses the _earliest name).
  // CustomTimestampingFixedWindowsWindowFn's output-time transform is
  // ts + 100; the YAML pins that EOW/EARLIEST never invoke it and that
  // EARLIEST_TRANSFORMED does (expected timestamps 101 / 110 / 125).

  test("transcript custom_timestamping eow/earliest: transform NOT invoked") {
    import graft.functions.CombineFns
    import graft.functions.CombineFns.TimestampCombiner
    val boom: Long => Long =
      _ => throw new IllegalStateException("custom timestamping must not be invoked")
    // window [0,9] of the YAML scenario, second-scale: inputs 1, 2, 3
    val in = Seq((1L, 1L), (2L, 2L), (3L, 3L))
    // OUTPUT_AT_EOW: no per-element timestamp work at all — pane timestamp
    // is the window end the pane already carries (ts = None here)
    CombineFnTester.testCombineFn(
      CombineFns.withTimestampCombiner(collectLongsFn, TimestampCombiner.EndOfWindow, boom),
      in, (None, List(1L, 2L, 3L)))
    // OUTPUT_AT_EARLIEST: earliest raw element time, transform untouched
    CombineFnTester.testCombineFn(
      CombineFns.withTimestampCombiner(collectLongsFn, TimestampCombiner.Earliest, boom),
      in, (Some(1L), List(1L, 2L, 3L)))
    // OUTPUT_AT_LATEST (timestamp_combiner_latest row, unit level)
    CombineFnTester.testCombineFn(
      CombineFns.withTimestampCombiner(collectLongsFn, TimestampCombiner.Latest, boom),
      in, (Some(3L), List(1L, 2L, 3L)))
  }

  test("transcript custom_timestamping earliest_transformed: transform IS invoked") {
    import graft.functions.CombineFns
    import graft.functions.CombineFns.TimestampCombiner
    // All three YAML windows at unit level: min over transformed times.
    val fn = CombineFns.withTimestampCombiner(
      collectLongsFn, TimestampCombiner.EarliestTransformed, _ + 100L)
    CombineFnTester.testCombineFn(fn,
      Seq((1L, 1L), (2L, 2L), (3L, 3L)), (Some(101L), List(1L, 2L, 3L)))
    CombineFnTester.testCombineFn(fn,
      Seq((10L, 10L), (11L, 11L)), (Some(110L), List(10L, 11L)))
    CombineFnTester.testCombineFn(fn,
      Seq((25L, 25L)), (Some(125L), List(25L)))
    // and through the streaming pane processor, end to end (ms-scale)
    val input = MemoryStream[(String, Timestamp, Long)](spark)
    val withTs = input.toDF().toDF("k", "t", "v")
      .withWatermark("t", "0 seconds").as[(String, Timestamp, Long)]
      .map { case (k, t, v) =>
        val ts = t.getTime
        (k, math.floorDiv(ts, 10000L) * 10000L, (ts, v))
      }
    val sfn = graft.functions.CombineFns.withTimestampCombiner(
      collectLongsFn, TimestampCombiner.EarliestTransformed, _ + 100000L)
    val panes = Triggers.triggeredAggregateComposite(withTs, sfn,
      RepeatedlyT(AfterWatermarkT), windowSizeMs = 10000L, allowedLatenessMs = 1000000L)
    val q = panes.toDF("k", "wstart", "wend", "value", "pane_index", "timing", "is_final")
      .writeStream.format("memory").queryName("ts_transformed_test")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(
        ("data", new Timestamp(1000), 1L), ("data", new Timestamp(2000), 2L),
        ("data", new Timestamp(3000), 3L), ("data", new Timestamp(10000), 10L),
        ("data", new Timestamp(11000), 11L), ("data", new Timestamp(25000), 25L))
      q.processAllAvailable()
      input.addData(("__wm", new Timestamp(100000), 0L))
      q.processAllAvailable()
      val got = spark.table("ts_transformed_test").collect().filter(_.getString(0) == "data")
        .map { r =>
          val v = r.getStruct(3)
          val ts = if (v.isNullAt(0)) None else Some(v.getLong(0) / 1000)
          (r.getAs[Long]("wstart") / 1000, ts, v.getSeq[Long](1).toSeq)
        }.sortBy(_._1).toSeq
      assert(got == Seq(
        (0L, Some(101L), Seq(1L, 2L, 3L)),
        (10L, Some(110L), Seq(10L, 11L)),
        (20L, Some(125L), Seq(25L))), got.toString)
    } finally q.stop()
  }

  // ---- bad-transcript rows: the harness itself must reject them --------
  // reference rows bad_output / bad_expected_values / bad_expected_window
  // (error: Unmatched output) and missing_output / missing_output_at_end
  // (error: Unexpected output).

  import org.scalatest.exceptions.TestFailedException

  private def expectHarnessError(errClass: String)(body: => Unit): Unit = {
    val e = intercept[TestFailedException](body)
    assert(e.getMessage.contains(errClass),
      s"wrong harness error: wanted '$errClass', got '${e.getMessage}'")
  }

  test("bad transcript: expect before the pane fired (bad_output)") {
    expectHarnessError("Unmatched output") {
      runTranscript("t_bad_output", RepeatedlyT(AfterWatermarkT), windowSec = 10,
        latenessSec = 1000, accumulating = true, Seq(
          Input(Seq(1, 2, 3)),
          Expect(Seq(ExpectedPane(0L, Seq(1L, 2L, 3L)))), // bad: nothing fired yet
          Watermark(100)))
    }
  }

  test("bad transcript: wrong expected values (bad_expected_values)") {
    expectHarnessError("Unmatched output") {
      runTranscript("t_bad_values", RepeatedlyT(AfterWatermarkT), windowSec = 10,
        latenessSec = 1000, accumulating = true, Seq(
          Input(Seq(1, 2, 3)),
          Watermark(100),
          Expect(Seq(ExpectedPane(0L, Seq(1L, 2L)))))) // bad values
    }
  }

  test("bad transcript: wrong expected window (bad_expected_window)") {
    expectHarnessError("Unmatched output") {
      runTranscript("t_bad_window", RepeatedlyT(AfterWatermarkT), windowSec = 10,
        latenessSec = 1000, accumulating = true, Seq(
          Input(Seq(1, 2, 3)),
          Watermark(100),
          Expect(Seq(ExpectedPane(0L, Seq(1L, 2L, 3L), we = Some(19L)))))) // bad window
    }
  }

  test("bad transcript: fired pane never expected (missing_output)") {
    expectHarnessError("Unexpected output") {
      runTranscript("t_missing_output", RepeatedlyT(AfterWatermarkT), windowSec = 10,
        latenessSec = 1000, accumulating = true, Seq(
          Input(Seq(1, 2, 3)),
          Watermark(100),
          // missing Expect
          Watermark(200)))
    }
  }

  test("bad transcript: fired pane never expected at end (missing_output_at_end)") {
    expectHarnessError("Unexpected output") {
      runTranscript("t_missing_output_end", RepeatedlyT(AfterWatermarkT), windowSec = 10,
        latenessSec = 1000, accumulating = true, Seq(
          Input(Seq(1, 2, 3)),
          Watermark(100)))
          // missing Expect at end
    }
  }

  // ---- full-corpus enumeration -----------------------------------------

  test("every trigger_transcripts.yaml row is ported or justified") {
    // Maps every `name:` in the reference corpus to where this repo covers
    // it. Parsed from the YAML itself when the reference checkout is present
    // so silently-added rows surface as failures.
    val coverage: Map[String, String] = Map(
      "fixed_default" -> "TriggerTranscriptSpec: transcript fixed_default",
      "fixed_default_late_data" -> "TriggerTranscriptSpec: transcript fixed_default_late_data",
      "timestamp_combiner_earliest" ->
        "TriggerTranscriptSpec: transcripts timestamp_combiner_earliest / latest / eow",
      "timestamp_combiner_latest" ->
        "TriggerTranscriptSpec: same streaming test + unit pin in custom_timestamping eow/earliest",
      "timestamp_combiner_custom_timestamping_eow" ->
        "TriggerTranscriptSpec: custom_timestamping eow/earliest (throwing transform pin)",
      // NOTE: the YAML reuses this name for TWO rows — OUTPUT_AT_EARLIEST
      // (transform must NOT fire) and OUTPUT_AT_EARLIEST_TRANSFORMED
      // (transform MUST fire, timestamps 101/110/125); both are ported.
      "timestamp_combiner_custom_timestamping_earliest" ->
        "TriggerTranscriptSpec: custom_timestamping eow/earliest + earliest_transformed",
      "early_late_sessions" -> "SessionTriggerSpec: early_late_sessions transcript",
      "garbage_collection" -> "TriggerTranscriptSpec: transcript garbage_collection",
      "known_late_data_watermark" -> "TriggerTranscriptSpec: transcript known_late_data_watermark",
      "known_late_data_no_watermark_hold_possible" ->
        "TriggerTranscriptSpec: transcript known_late_data_no_watermark_hold_possible",
      "bad_output" -> "TriggerTranscriptSpec: bad transcript bad_output",
      "bad_expected_values" -> "TriggerTranscriptSpec: bad transcript bad_expected_values",
      "bad_expected_window" -> "TriggerTranscriptSpec: bad transcript bad_expected_window",
      "missing_output" -> "TriggerTranscriptSpec: bad transcript missing_output",
      "missing_output_at_end" -> "TriggerTranscriptSpec: bad transcript missing_output_at_end")
    val yaml = new java.io.File(
      "/root/reference/sdks/python/apache_beam/testing/data/trigger_transcripts.yaml")
    assume(yaml.exists(), "reference checkout not present; enumeration pinned statically")
    val src = scala.io.Source.fromFile(yaml)
    val rows = try src.getLines().filter(_.startsWith("name: "))
      .map(_.stripPrefix("name: ").trim).toList finally src.close()
    assert(rows.size == 16, s"corpus changed size: ${rows.size} rows")
    val missing = rows.filterNot(coverage.contains)
    assert(missing.isEmpty, s"unported YAML rows: $missing")
  }
}
