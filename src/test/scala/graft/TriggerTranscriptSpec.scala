package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Triggers
import graft.streaming.Triggers._

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
  /** (windowStartSec, sorted values, Option(timing), Option(isFinal)) —
    * partial matching like the YAML's attribute subsets. */
  case class Expect(panes: Seq[(Long, Seq[Long], Option[String], Option[Boolean])]) extends Event

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
    def seenPanes(): Seq[(Long, Seq[Long], String, Boolean)] =
      spark.table(name).collect().filter(_.getAs[String]("k") == "data")
        .map(r => (r.getAs[Long]("wstart") / 1000, r.getSeq[Long](3).toSeq,
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
          expected.foreach { case (ws, values, timing, isFinal) =>
            val hit = newPanes.find(p => p._1 == ws && p._2 == values &&
              timing.forall(_ == p._3) && isFinal.forall(_ == p._4))
            assert(hit.isDefined,
              s"[$name] expected pane (window=$ws values=$values timing=$timing " +
                s"final=$isFinal) among new panes $newPanes")
          }
          assert(newPanes.size == expected.size,
            s"[$name] unexpected extra panes: $newPanes vs $expected")
          matched += newPanes.size
      }
    } finally q.stop()
  }

  test("transcript fixed_default") {
    runTranscript("t_fixed_default", RepeatedlyT(AfterWatermarkT), windowSec = 10,
      latenessSec = 1000, accumulating = true, Seq(
        Input(Seq(1, 2, 3, 10, 11)),
        Watermark(25),
        Expect(Seq(
          (0L, Seq(1L, 2L, 3L), Some("ON_TIME"), None),
          (10L, Seq(10L, 11L), Some("ON_TIME"), None)))))
  }

  test("transcript fixed_default_late_data") {
    runTranscript("t_fixed_late", RepeatedlyT(AfterWatermarkT), windowSec = 10,
      latenessSec = 1000, accumulating = true, Seq(
        Input(Seq(1, 2, 3, 10, 11, 25)),
        Watermark(100),
        Expect(Seq(
          (0L, Seq(1L, 2L, 3L), Some("ON_TIME"), Some(false)),
          (10L, Seq(10L, 11L), Some("ON_TIME"), None),
          (20L, Seq(25L), Some("ON_TIME"), None))),
        Input(Seq(7)),
        Expect(Seq(
          (0L, Seq(1L, 2L, 3L, 7L), Some("LATE"), None)))))
  }

  test("transcript garbage_collection (AfterCount(2), discarding, lateness 10)") {
    runTranscript("t_gc", RepeatedlyT(AfterCountT(2)), windowSec = 10,
      latenessSec = 10, accumulating = false, Seq(
        Input(Seq(1, 2, 3, 10, 11, 25)),
        Expect(Seq(
          (0L, Seq(1L, 2L, 3L), Some("EARLY"), None),
          (10L, Seq(10L, 11L), Some("EARLY"), None))),
        // windows [0,9] and [10,19] fired and have nothing pending: they
        // close silently at GC (absent/tombstone in the YAML's state
        // assertions); [20,29] still holds its pending element and flushes
        // as a final pane at its GC horizon
        Watermark(100),
        Expect(Seq(
          (20L, Seq(25L), None, Some(true)))),
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
          (0L, Seq(2L, 3L, 7L, 8L), Some("ON_TIME"), None)))))
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
          (0L, Seq(2L, 3L, 7L), Some("ON_TIME"), None)))))
  }
}
