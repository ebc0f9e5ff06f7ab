package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 generator (dev tool, r12 verdict item 2): a ×10
  * scale-up of the driver's sf0.1 fixtures, so the correctness gate and
  * bench can run one decade closer to the 100 TB target than the largest
  * driver-provided directory. NOT driver testdata — written under
  * /root/repo/target/sf1 and regenerable at will.
  *
  * Construction (copy i of 10, i = 0 is verbatim sf0.1):
  *  - every id/key column shifts by i·10^9, consistently across referrers,
  *    so the TPC-H foreign-key graph (lineitem→orders/part/supplier,
  *    orders→customer) stays closed; region/nation stay fixed (the
  *    nationkey dimension is shared, like the real TPC-H layout)
  *  - events shift ts by i·31 days: the 100 TB shape is a LONGER history
  *    at similar density (same users, ×10 the span), which also keeps
  *    per-user as-of/session history genuinely growing
  *  - documents get a per-copy text suffix (" c<i>") so exact/near-dup
  *    structure is perturbed rather than multiplied 10-fold, and n_chars
  *    is updated to keep the n_chars = length(text) invariant the driver
  *    data holds
  *  - embeddings perturb element 0 by i·0.001f so ANN distances don't
  *    carry 10-way exact ties across copies (tie-rule stress belongs to
  *    the fuzz layers, not the scale gate)
  *
  * Both engines (Spark and the DuckDB oracle) read the SAME generated
  * parquet, so the gate stays a pure engine-vs-engine differential.
  */
object Sf1Gen {
  private val OFF = 1000000000L

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val base = "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate()

    def copyOf(name: String, i: Int): DataFrame = {
      val t = spark.read.parquet(s"$base/$name.parquet")
      def shift(df: DataFrame, cols: String*): DataFrame =
        cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * OFF)))
      name match {
        case "region" | "nation" => t
        case "customer" => shift(t, "c_custkey")
        case "supplier" => shift(t, "s_suppkey")
        case "part"     => shift(t, "p_partkey")
        case "orders"   => shift(t, "o_orderkey", "o_custkey")
        case "lineitem" => shift(t, "l_orderkey", "l_partkey", "l_suppkey")
        case "events"   => shift(t, "event_id")
          .withColumn("ts", col("ts") + expr(s"INTERVAL ${31 * i} DAY"))
        case "documents" =>
          if (i == 0) t
          else shift(t, "doc_id")
            .withColumn("text", concat(col("text"), lit(s" c$i")))
            .withColumn("n_chars", col("n_chars") + lit(2L + i.toString.length))
        case "embeddings" => shift(t, "vec_id")
          .withColumn("embedding", transform(col("embedding"),
            (x, j) => when(j === 0, x + lit(i * 0.001f)).otherwise(x)))
      }
    }

    GraftSession.tableNames.foreach { name =>
      val n = (0 until (if (Set("region", "nation")(name)) 1 else copies))
        .map(copyOf(name, _)).reduce(_ unionByName _)
      n.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[sf1gen] $name -> $out/$name.parquet")
    }
    spark.stop()
  }
}
