package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.CombineFn
import graft.streaming.Triggers
import graft.streaming.Triggers._

/** The cookbook TriggerExample end-to-end (reference:
  * examples/java/src/main/java/org/apache/beam/examples/cookbook/
  * TriggerExample.java:139-317 and its TriggerExampleTest.java): four
  * trigger configurations over the same freeway-flow stream — the last
  * named example exercising the trigger AST this suite didn't already pin.
  * The scenario data is the worked example from the class javadoc
  * (TriggerExample.java:141-155): ten readings for freeway 5 in the
  * [10:00, 10:30) window, six arriving before the watermark passes the end
  * of the window and four after. The reference's illustrative tables assume
  * a watermark "approximately 15 minutes behind processing time"; here the
  * watermark is scripted (a side key advances it), so pane contents are
  * deterministic: each concept asserts its full golden transcript.
  *
  * Processing-time delays are scaled from minutes to zero (fire in the
  * arming batch) — the same scaling GameExamplesSpec documents; watermark
  * behavior (ON_TIME panes, LATE panes, closed-window drops) is event-time
  * driven and unaffected. */
class TriggerExampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** TotalFlow's aggregate (TriggerExample.java:337-358): per freeway,
    * total flow + number of records. */
  private val sumCountFn: CombineFn[Long, (Long, Long), (Long, Long)] =
    new CombineFn[Long, (Long, Long), (Long, Long)] {
      def createAccumulator(): (Long, Long) = (0L, 0L)
      def addInput(acc: (Long, Long), in: Long): (Long, Long) = (acc._1 + in, acc._2 + 1)
      def mergeAccumulators(a: (Long, Long), b: (Long, Long)): (Long, Long) =
        (a._1 + b._1, a._2 + b._2)
      def extractOutput(acc: (Long, Long)): (Long, Long) = acc
    }

  private val WindowMs = 30L * 60 * 1000 // WINDOW_DURATION = 30 minutes
  private val OneDayMs = 24L * 3600 * 1000 // ONE_DAY allowed lateness

  /** Run one trigger configuration over the javadoc scenario; returns
    * freeway-5 panes as ((totalFlow, nRecords), paneIndex, timing, isLast)
    * in pane order. `script` drives arrival batches exactly. */
  private def run(trigger: TriggerAst, name: String, lateness: Long,
                  accumulating: Boolean)(
      script: (MemoryStream[(String, Timestamp, Long)],
               org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[((Long, Long), Int, String, Boolean)] = {
    val input = MemoryStream[(String, Timestamp, Long)](spark)
    val assigned = Triggers.assignFixedWindows(
      input.toDF().toDF("k", "t", "v").withWatermark("t", "0 seconds")
        .as[(String, Timestamp, Long)], WindowMs)
    val panes = Triggers.triggeredAggregateComposite(assigned, sumCountFn, trigger,
      windowSizeMs = WindowMs, allowedLatenessMs = lateness, accumulating = accumulating)
    val q = panes.toDF("k", "wstart", "wend", "value", "pane_index", "timing", "is_final")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try script(input, q) finally q.stop()
    spark.table(name).collect()
      .filter(_.getAs[String]("k") == "5")
      .map { r =>
        val v = r.getStruct(r.fieldIndex("value"))
        ((v.getLong(0), v.getLong(1)), r.getAs[Int]("pane_index"),
          r.getAs[String]("timing"), r.getAs[Boolean]("is_final"))
      }.sortBy(_._2).toSeq
  }

  // the six readings processed before the watermark passes 10:30, in the
  // javadoc's processing-time order, batched at the javadoc's minute marks
  private def feedOnTime(input: MemoryStream[(String, Timestamp, Long)],
                         q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    input.addData(("5", ts("2024-01-01 10:00:03"), 50L), ("5", ts("2024-01-01 10:01:00"), 30L))
    q.processAllAvailable()
    input.addData(("5", ts("2024-01-01 10:04:10"), 20L))
    q.processAllAvailable()
    input.addData(("5", ts("2024-01-01 10:15:00"), 60L),
      ("5", ts("2024-01-01 10:26:40"), 40L), ("5", ts("2024-01-01 10:27:20"), 60L))
    q.processAllAvailable()
  }

  private def advanceWatermarkPastEnd(input: MemoryStream[(String, Timestamp, Long)],
                                      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    input.addData(("wm", ts("2024-01-01 10:45:00"), 0L))
    q.processAllAvailable()
  }

  // the four late readings, each its own batch, in processing-time order
  // (javadoc: 60@11:03, 30@11:07, 20@11:07:30, 60@11:11)
  private val lateBatches = Seq(
    Seq(("5", ts("2024-01-01 10:05:00"), 60L)),
    Seq(("5", ts("2024-01-01 10:02:00"), 30L)),
    Seq(("5", ts("2024-01-01 10:05:01"), 20L)),
    Seq(("5", ts("2024-01-01 10:29:00"), 60L)))

  private def feedLate(input: MemoryStream[(String, Timestamp, Long)],
                       q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    lateBatches.foreach { b => input.addData(b: _*); q.processAllAvailable() }

  test("concept 1 — default trigger, zero lateness: one ON_TIME pane, late data dropped") {
    // TriggerExample.java:199-210: Repeatedly(AfterWatermark), ZERO
    // lateness, discarding. Golden row (javadoc:188-190):
    // 260 | 6 | isFirst=true | isLast=true | ON_TIME; the four late
    // readings are droppably late and never appear.
    val panes = run(RepeatedlyT(AfterWatermarkT), "te_default",
      lateness = 0L, accumulating = false) { (input, q) =>
      feedOnTime(input, q); advanceWatermarkPastEnd(input, q); feedLate(input, q)
    }
    assert(panes == Seq(((260L, 6L), 0, "ON_TIME", true)), panes.toString)
  }

  test("concept 2 — default trigger, one day lateness: ON_TIME then one LATE pane per arrival") {
    // TriggerExample.java:226-243: same trigger, ONE_DAY lateness,
    // discarding — each late arrival re-fires the watermark trigger with
    // just the delta. Golden rows (javadoc:220-225):
    // ON_TIME 260/6 then LATE 60/1, 30/1, 20/1, 60/1.
    val panes = run(RepeatedlyT(AfterWatermarkT), "te_late",
      lateness = OneDayMs, accumulating = false) { (input, q) =>
      feedOnTime(input, q); advanceWatermarkPastEnd(input, q); feedLate(input, q)
    }
    assert(panes == Seq(
      ((260L, 6L), 0, "ON_TIME", false),
      ((60L, 1L), 1, "LATE", false),
      ((30L, 1L), 2, "LATE", false),
      ((20L, 1L), 3, "LATE", false),
      ((60L, 1L), 4, "LATE", false)), panes.toString)
  }

  test("concept 3 — speculative estimates: accumulating EARLY panes then post-watermark updates") {
    // TriggerExample.java:260-276: Repeatedly(AfterProcessingTime
    // .pastFirstElementInPane().plusDelayOf(ONE_MINUTE)), accumulating,
    // ONE_DAY lateness. Golden values (javadoc:252-258): 80/2, 100/3,
    // 260/6 speculative, then 320/7, 370/9, 430/10 (the javadoc batches
    // 30+20 into one pane; the script batches arrivals identically).
    // TIMING divergence from the javadoc's table: it labels every
    // post-watermark pane LATE ("we don't get an ON_TIME firing"), which
    // describes a pane whose OUTPUT watermark already passed the window
    // end (PaneInfoTracker.java:102,113 isLateForOutput). In a
    // single-stage pipeline the output watermark is held at the end of
    // the window until the on-time pane fires, so the tracker's other arm
    // (PaneInfoTracker.java:122-124) assigns the unique ON_TIME to the
    // first post-watermark firing irrespective of which trigger fired it
    // — that is what the engine implements.
    val panes = run(RepeatedlyT(AfterProcessingTimeT(0L)), "te_spec",
      lateness = OneDayMs, accumulating = true) { (input, q) =>
      feedOnTime(input, q)
      advanceWatermarkPastEnd(input, q)
      input.addData(lateBatches(0): _*); q.processAllAvailable()
      input.addData(lateBatches(1) ++ lateBatches(2): _*); q.processAllAvailable()
      input.addData(lateBatches(3): _*); q.processAllAvailable()
    }
    assert(panes == Seq(
      ((80L, 2L), 0, "EARLY", false),
      ((100L, 3L), 1, "EARLY", false),
      ((260L, 6L), 2, "EARLY", false),
      ((320L, 7L), 3, "ON_TIME", false),
      ((370L, 9L), 4, "LATE", false),
      ((430L, 10L), 5, "LATE", false)), panes.toString)
  }

  test("concept 4 — sequential: EARLY estimates, one ON_TIME, then LATE updates") {
    // TriggerExample.java:296-307: AfterEach.inOrder(
    //   Repeatedly(AfterProcessingTime+1min).orFinally(AfterWatermark),
    //   Repeatedly(AfterProcessingTime+5min)), accumulating, ONE_DAY.
    // The first child speculates until the watermark passes the end of the
    // window (its ON_TIME firing), then the second child takes over for
    // late data. The javadoc's illustrative ON_TIME row (320/7) assumes a
    // watermark lagging far enough to absorb one late element; with the
    // scripted watermark the on-time pane carries exactly the six on-time
    // readings, and every late reading updates through the second child.
    val panes = run(
      AfterEachT(Seq(
        OrFinallyT(RepeatedlyT(AfterProcessingTimeT(0L)), AfterWatermarkT),
        RepeatedlyT(AfterProcessingTimeT(0L)))),
      "te_seq", lateness = OneDayMs, accumulating = true) { (input, q) =>
      feedOnTime(input, q)
      advanceWatermarkPastEnd(input, q)
      input.addData(lateBatches(0): _*); q.processAllAvailable()
      input.addData(lateBatches(1) ++ lateBatches(2): _*); q.processAllAvailable()
      input.addData(lateBatches(3): _*); q.processAllAvailable()
    }
    assert(panes == Seq(
      ((80L, 2L), 0, "EARLY", false),
      ((100L, 3L), 1, "EARLY", false),
      ((260L, 6L), 2, "EARLY", false),
      ((260L, 6L), 3, "ON_TIME", false),
      ((320L, 7L), 4, "LATE", false),
      ((370L, 9L), 5, "LATE", false),
      ((430L, 10L), 6, "LATE", false)), panes.toString)
  }

  // ---- ExtractFlowInfo parse (TriggerExample.java:409-431), columnar ----

  /** The reference DoFn splits on "," (Java split drops trailing empty
    * fields), skips the header row, rows with < 48 fields, and rows whose
    * total_flow (field 7) is missing, non-numeric, or <= 0; emits
    * (freeway = field 2, total_flow). Columnar so the parse stays inside
    * WholeStageCodegen at scale. */
  private def extractFlowInfo(lines: DataFrame): DataFrame = {
    val fields = split(regexp_replace(col("line"), ",+$", ""), ",")
    lines.select(fields.as("f"))
      .filter(element_at(col("f"), 1) =!= "timestamp" && size(col("f")) >= 48)
      .select(element_at(col("f"), 3).as("freeway"),
        element_at(col("f"), 8).cast("int").as("total_flow"))
      .filter(col("total_flow").isNotNull && col("total_flow") > 0)
  }

  test("ExtractFlowInfo: header/short/zero-flow rows skipped (TriggerExampleTest.INPUT)") {
    // TriggerExampleTest.java:59-62 + testExtractTotalFlow: of the two
    // readings only ("94", 29) survives — the second has too few fields
    // once Java's split drops the trailing empties; the empty line emits
    // nothing.
    val input = Seq(
      "01/01/2010 00:00:00,1108302,94,E,ML,36,100,29,0.0065,66,9,1,0.001,74.8,1,9,3,0.0028,71,1,9," +
        "12,0.0099,67.4,1,9,13,0.0121,99.0,1,,,,,0,,,,,0,,,,,0,,,,,0",
      "01/01/2010 00:00:00,1100333,5,N,FR,9,0,39,,,9,,,,0,,,,,0,,,,,0,,,,,0,,,,,0,,,,,0,,,,",
      "")
    val out = extractFlowInfo(input.toDF("line")).collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out.toSeq == Seq(("94", 29)), out.mkString(","))
  }
}
