package graft

import java.io.File
import java.sql.Timestamp

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Windows
import graft.operators.Windows.{FixedWindows, WindowingStrategy}
import graft.sources.IO
import graft.streaming.StreamingOps

/** WriteOneFilePerWindow contract (reference: examples/common/
  * WriteOneFilePerWindow.java + examples/WindowedWordCount.java:206-213):
  * windowed text output, one file per window, path derived from the window
  * bounds; numShards caps the per-window fan-out. Batch and streaming
  * (foreachBatch append) shapes. */
class WindowedSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def out(): String = {
    val d = java.nio.file.Files.createTempDirectory(
      new File("target").toPath.toAbsolutePath, "windowed-sink-")
    d.toFile.deleteOnExit()
    d.resolve("out").toString
  }

  /** window-dir → data files (ignoring _SUCCESS / hidden files). */
  private def layout(path: String): Map[String, Seq[File]] =
    new File(path).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("w="))
      .map(d => d.getName -> d.listFiles().toSeq
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")))
      .toMap

  private def windowedCounts(rows: Seq[(String, Timestamp)]) =
    Windows.aggregate(rows.toDF("word", "t"),
        WindowingStrategy(FixedWindows("10 minutes")), col("t"),
        Seq(col("word")), Seq(count(lit(1)).as("n")))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        concat(col("word"), lit(": "), col("n")).as("line"))

  test("batch: exactly one file per window, dir name derived from window bounds") {
    val dir = out()
    val counts = windowedCounts(Seq(
      ("ghost", ts("2026-01-01 00:01:00")), ("lear", ts("2026-01-01 00:04:00")),
      ("ghost", ts("2026-01-01 00:12:00")),
      ("king", ts("2026-01-02 00:01:00")))) // same HH:mm as window 1, next day
    IO.writeOneFilePerWindow(counts, col("line"), col("ws"), col("we"), dir)

    val l = layout(dir)
    assert(l.keySet == Set("w=20260101T0000-0010", "w=20260101T0010-0020",
      "w=20260102T0000-0010"), s"one dir per window, date-qualified: ${l.keySet}")
    l.foreach { case (w, files) =>
      assert(files.size == 1, s"window $w must have exactly one file, got $files")
    }
    val w1 = scala.io.Source.fromFile(l("w=20260101T0000-0010").head)
    val lines = try w1.getLines().toSeq.sorted finally w1.close()
    assert(lines == Seq("ghost: 1", "lear: 1"))
  }

  test("batch: numShards caps files per window; content survives sharding") {
    val dir = out()
    val counts = windowedCounts(
      (1 to 50).map(i => (s"w$i", ts("2026-01-01 00:05:00"))))
    IO.writeOneFilePerWindow(counts, col("line"), col("ws"), col("we"), dir,
      numShards = 3)
    val l = layout(dir)
    assert(l.keySet == Set("w=20260101T0000-0010"))
    val files = l("w=20260101T0000-0010")
    assert(files.size <= 3 && files.nonEmpty, s"<= numShards files, got ${files.size}")
    val all = files.flatMap { f =>
      val src = scala.io.Source.fromFile(f)
      try src.getLines().toList finally src.close()
    }
    assert(all.sorted == (1 to 50).map(i => s"w$i: 1").sorted)
  }

  test("streaming: append-mode foreachBatch preserves one file per window") {
    val dir = out()
    val input = MemoryStream[(String, Timestamp)](spark)
    val agg = StreamingOps.windowedAggregate(input.toDF().toDF("word", "t"),
      WindowingStrategy(FixedWindows("10 minutes"), allowedLateness = "0 seconds"),
      col("t"), Seq(col("word")), Seq(count(lit(1)).as("n")))
    val lines = agg.select(col("window.start").as("ws"), col("window.end").as("we"),
      concat(col("word"), lit(": "), col("n")).as("line"))
    val q = lines.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          IO.writeOneFilePerWindow(batch, col("line"), col("ws"), col("we"),
            dir, saveMode = SaveMode.Append)
      }
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(("ghost", ts("2026-01-01 00:01:00")),
        ("ghost", ts("2026-01-01 00:03:00")), ("lear", ts("2026-01-01 00:04:00")))
      q.processAllAvailable()
      // advance the watermark past window 1's end → it finalizes
      input.addData(("king", ts("2026-01-01 00:12:00")))
      q.processAllAvailable()
      // and past window 2's end
      input.addData(("late", ts("2026-01-01 00:25:00")))
      q.processAllAvailable()

      val l = layout(dir)
      assert(l.keySet.contains("w=20260101T0000-0010") &&
        l.keySet.contains("w=20260101T0010-0020"), s"finalized windows: ${l.keySet}")
      l.foreach { case (w, files) =>
        assert(files.size == 1, s"window $w written by exactly one pane/file, got $files")
      }
      val src = scala.io.Source.fromFile(l("w=20260101T0000-0010").head)
      val w1 = try src.getLines().toSeq.sorted finally src.close()
      assert(w1 == Seq("ghost: 2", "lear: 1"))
    } finally q.stop()
  }
}
