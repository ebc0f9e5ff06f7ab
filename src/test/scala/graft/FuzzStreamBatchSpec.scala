package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Windows._
import graft.streaming.StreamingOps

/** Batch↔stream EQUIVALENCE fuzzer: Structured Streaming's core promise is
  * that a windowed aggregation over a stream converges to the batch answer
  * once the watermark closes every window. The streaming tier is the one
  * correctness surface the DuckDB oracle can't gate (no SQL replay of
  * watermarks), so this spec gates it differentially against the BATCH
  * engine instead — the analogue of the reference's ValidatesRunner
  * discipline for its streaming runners.
  *
  * Per seeded config: random window fn (fixed / sliding / session), key
  * set, aggregate set, and lateness; random strictly-increasing event
  * times chunked into time-ordered micro-batches (so admission never drops
  * a row — each batch's min ts exceeds the previous watermark); a
  * far-future sentinel event pushes the final watermark past every real
  * window's end, closing them all. The stream's append-mode output
  * (sentinel excluded) must equal the batch aggregation of the same rows
  * exactly — window bounds, keys, and every aggregate value.
  *
  * Bounded runtime: N configs × one MemoryStream query each.
  */
class FuzzStreamBatchSpec extends SparkSpec {
  import spark.implicits._

  private val Seed = 20260814L
  private val N = sys.env.getOrElse("SPARK_GRAFT_STREAMFUZZ_N", "6").toInt

  private case class Config(fn: WindowFn, lateness: String,
                            aggFuncs: Seq[String], nKeys: Int)

  private def randomConfig(rnd: scala.util.Random): Config = {
    val fn = rnd.nextInt(3) match {
      case 0 => FixedWindows(Seq("60 seconds", "300 seconds", "600 seconds")(rnd.nextInt(3)))
      case 1 => SlidingWindows("300 seconds", Seq("100 seconds", "150 seconds")(rnd.nextInt(2)))
      case _ => Sessions(Seq("45 seconds", "90 seconds")(rnd.nextInt(2)))
    }
    val lateness = Seq("0 seconds", "30 seconds")(rnd.nextInt(2))
    val aggs = "cnt" +: rnd.shuffle(Seq("sum", "min", "max")).take(rnd.nextInt(3))
    Config(fn, lateness, aggs, 2 + rnd.nextInt(4))
  }

  private def aggCols(funcs: Seq[String]) = funcs.map {
    case "cnt" => count(lit(1)).as("cnt")
    case "sum" => sum(col("v")).as("sum")
    case "min" => min(col("v")).as("min")
    case "max" => max(col("v")).as("max")
  }

  private def canonical(df: DataFrame): Set[Seq[Any]] = {
    val cols = Seq(col("window.start").cast("long").as("ws"),
      col("window.end").cast("long").as("we"), col("k")) ++
      df.columns.filter(c => Set("cnt", "sum", "min", "max")(c)).map(col).toSeq
    df.filter(col("k") =!= "zzz_sentinel")
      .select(cols: _*)
      .collect().map(_.toSeq).toSet
  }

  test(s"$N random windowed-agg configs: stream (append, watermark-closed) == batch (seed=$Seed)") {
    val rnd = new scala.util.Random(Seed)
    for (i <- 0 until N) {
      val cfg = randomConfig(rnd)
      // strictly increasing distinct event times → time-ordered batches
      // admit every row at any lateness; values and keys random
      var t = 1700000000L // fixed epoch base
      val events = (0 until 240).map { _ =>
        t += 1 + rnd.nextInt(30)
        (s"k${rnd.nextInt(cfg.nKeys)}", new Timestamp(t * 1000), rnd.nextInt(1000).toLong)
      }
      val sentinelTs = new Timestamp((t + 7200) * 1000) // 2h past the last event
      val in = MemoryStream[(String, Timestamp, Long)](spark)
      val strategy = WindowingStrategy(cfg.fn, allowedLateness = cfg.lateness)
      val streamed = StreamingOps.windowedAggregate(
        in.toDF().toDF("k", "t", "v"), strategy, col("t"),
        Seq(col("k")), aggCols(cfg.aggFuncs))
      val sink = s"fuzz_sb_$i"
      val q = streamed.writeStream.format("memory").queryName(sink)
        .outputMode("append").option("checkpointLocation", ckpt()).start()
      try {
        // with a nonzero lateness, displace eligible events one batch
        // LATER — genuinely late cross-batch arrivals (ts below the
        // previous batch's max) that the watermark delay must still
        // admit, exercising the open-state late path. Eligible = within
        // 20s of its chunk's max ts (< the 30s lateness, so admission
        // `ts > prevMax - lateness` is guaranteed).
        val chunks = events.grouped(60).toSeq
        val delivered: Seq[Seq[(String, Timestamp, Long)]] =
          if (cfg.lateness == "0 seconds") chunks
          else {
            val moved = Array.fill(chunks.size)(List.empty[(String, Timestamp, Long)])
            val kept = chunks.zipWithIndex.map { case (chunk, ci) =>
              val chunkMax = chunk.map(_._2.getTime).max
              val (late, onTime) = chunk.partition(e =>
                ci < chunks.size - 1 && chunkMax - e._2.getTime <= 20000 &&
                  e._2.getTime != chunkMax && rnd.nextInt(3) == 0)
              if (late.nonEmpty) moved(ci + 1) = late.toList
              onTime
            }
            kept.zipWithIndex.map { case (c, ci) => moved(ci) ++ c }
          }
        delivered.foreach { chunk =>
          // shuffle WITHIN the batch: intra-batch order must not matter
          if (chunk.nonEmpty) { in.addData(rnd.shuffle(chunk): _*); q.processAllAvailable() }
        }
        in.addData(("zzz_sentinel", sentinelTs, 0L)) // close every window
        q.processAllAvailable()
        val streamOut = canonical(spark.table(sink))
        val batchDf = events.toDF("k", "t", "v")
        val wcol = windowExpr(cfg.fn, col("t")).get.as("window")
        val batchOut = canonical(
          batchDf.groupBy(wcol, col("k")).agg(aggCols(cfg.aggFuncs).head,
            aggCols(cfg.aggFuncs).tail: _*))
        assert(streamOut == batchOut,
          s"config $i diverged ($cfg): stream ${streamOut.size} rows vs batch " +
            s"${batchOut.size};\nonly-stream: ${(streamOut -- batchOut).take(3)}\n" +
            s"only-batch: ${(batchOut -- streamOut).take(3)}")
        assert(batchOut.nonEmpty, s"config $i produced an empty corpus — trivial")
      } finally q.stop()
    }
  }
}
