package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Session bootstrap + table loading for the graft engine.
  *
  * Spark-native replacement for the reference's `Pipeline.create(options)`
  * (reference: sdks/java/core/src/main/java/org/apache/beam/sdk/Pipeline.java:131):
  * a Beam Pipeline is a deferred DAG; in graft the SparkSession plus lazy
  * DataFrame lineage plays that role, and Catalyst supplies the optimizer
  * Beam never had.
  *
  * Scale notes: shuffle partitions default to the local core count (the
  * driver harness runs local[32]); on a real cluster AQE coalesces and
  * re-splits at runtime, so we enable it unconditionally.
  */
object GraftSession {

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // transformWithState (stateful ParDo / trigger engine) needs a state
      // store with column families — RocksDB, bundled with Spark.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The driver's synthetic star schema (see /root/repo/TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Load one table from a scale-factor directory.
    *
    * Parquet TIMESTAMP(NANOS) (the `events.ts` column) is illegal for
    * Spark's reader; `nanosAsLong` surfaces it as LongType ns-since-epoch,
    * which we floor-truncate to a µs TimestampType column (the same
    * truncation DuckDB's TIMESTAMP_NS→TIMESTAMP cast performs, so oracle
    * comparisons agree). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integer `div`, NOT floor(ts/1000): double division of an ~1e18 ns
      // value loses precision below 2^-53 relative — off-by-1µs truncations
      // that break oracle hash-compares.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Load every table and register temp views (for spark.sql usage). */
  def registerAll(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    tableNames.map { n =>
      val df = table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap
}
