package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Triggers
import graft.streaming.Triggers._

/** Calibration pin for FuzzTriggerTranscriptSpec's interpreter: an
  * event-time timer at T fires as soon as the watermark reaches EXACTLY T
  * (the >= rule), and the pane it produces at the boundary is ON_TIME.
  * The fuzz interpreter hard-codes this rule; if a Spark upgrade changes
  * it, this spec fails first and points at the dependency. */
class TimerTieProbeSpec extends SparkSpec {
  import spark.implicits._
  test("timer tie calibration") {
    val input = MemoryStream[(String, Timestamp, Long)](spark)
    val assigned = Triggers.assignFixedWindows(
      input.toDF().toDF("k", "t", "v").withWatermark("t", "0 seconds")
        .as[(String, Timestamp, Long)], 10000L)
    val panes = Triggers.triggeredAggregateComposite(assigned, collectLongsFn,
      RepeatedlyT(AfterWatermarkT), windowSizeMs = 10000L, allowedLatenessMs = 1000000L)
    val q = panes.toDF("k", "ws", "we", "vs", "idx", "timing", "fin")
      .writeStream.format("memory").queryName("tieprobe")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(("data", new Timestamp(5000), 5L)); q.processAllAvailable()
      input.addData(("__wm", new Timestamp(10000), 0L)); q.processAllAvailable()
      val atExact = spark.table("tieprobe").collect().count(_.getString(0) == "data")
      input.addData(("__wm", new Timestamp(10001), 0L)); q.processAllAvailable()
      val past = spark.table("tieprobe").collect().count(_.getString(0) == "data")
      assert(atExact == 1,
        s"timer-at-watermark tie rule changed: expected the end-of-window " +
          s"timer to fire at wm == windowEnd, saw $atExact panes")
      assert(past == 1, "no further pane expected past the boundary")
      val pane = spark.table("tieprobe").collect().find(_.getString(0) == "data").get
      assert(pane.getString(5) == "ON_TIME")
    } finally q.stop()
  }
}
