package graft

import org.apache.spark.sql.functions._

import graft.expressions.LayoutExpressions
import graft.sources.Layout

/** Z-order layout: Morton-code correctness + the clustering property the
  * layout exists for (tight per-file min/max on BOTH dimensions). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonCode interleaves bits (hand cases), masks high bits, nulls propagate") {
    val rows = Seq(
      (0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L),
      (1L, 2L),                       // 0b01 with 0b10 -> 0b1001 = 9
      ((1L << 31) | 5L, 0L))          // bit 31 masked off at bits=31
      .toDF("a", "b")
      .select(LayoutExpressions.mortonCode(col("a"), col("b")).as("z"))
    // (2^31 | 5) masks to 5 = 0b101 -> even positions 0 and 4 -> 17
    assert(rows.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 5L, 10L, 15L, 9L, 17L))
    val n = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(LayoutExpressions.mortonCode(col("a"), col("b")).as("z"))
    assert(n.collect()(0).isNullAt(0))
  }

  test("mortonCode matches a reference interleave on random values") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(200)((rnd.nextLong().abs & ((1L << 31) - 1),
                             rnd.nextLong().abs & ((1L << 31) - 1)))
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((a >>> i) & 1L) << (2 * i)
        z |= ((b >>> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val got = vals.toDF("a", "b")
      .select(LayoutExpressions.mortonCode(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == vals.map { case (a, b) => ref(a, b) })
  }

  test("zorderWrite clusters BOTH dimensions: per-file ranges shrink vs random layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val events = GraftSession.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
    // random layout: shuffle on a hash — the "just write it" baseline
    events.repartition(32, col("event_id")).write.mode("overwrite")
      .parquet(s"$dir/plain")
    Layout.zorderWrite(events, col("user_id"), col("tus"), s"$dir/zorder",
      numFiles = 32)
    def avgSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getLong(1).toDouble)
      spans.sum / spans.length
    }
    val (pu, zu) = (avgSpan(s"$dir/plain", "user_id"), avgSpan(s"$dir/zorder", "user_id"))
    val (pt, zt) = (avgSpan(s"$dir/plain", "tus"), avgSpan(s"$dir/zorder", "tus"))
    // hash layout: every file spans ~the full domain on both dims; with a
    // 32-file z-order grid both dims must shrink at least 2x (the curve
    // splits shrinkage across dims: product <= numFiles)
    assert(zu * 2 < pu, s"user_id span: zorder $zu vs plain $pu")
    assert(zt * 2 < pt, s"ts span: zorder $zt vs plain $pt")
  }
}
