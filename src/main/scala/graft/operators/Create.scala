package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Create.of / Create.timestamped / Create.empty (reference:
  * SDK/transforms/Create.java:119, :140, :159, :225): in-memory literal
  * sources — the root transform of nearly every reference test. Spark-native:
  * `spark.createDataset` with derived encoders; `parallelize` semantics
  * (splittable across the default parallelism) come for free.
  */
object Create {

  /** Create.of(values) (reference: Create.java:119). */
  def of[T: Encoder](spark: SparkSession, values: Seq[T]): Dataset[T] =
    spark.createDataset(values)

  /** Create.timestamped (reference: Create.java:140): values with event-time
    * millis; the timestamp becomes an explicit µs TimestampType column named
    * `event_time` (Beam carries it implicitly in WindowedValue —
    * SDK/util/WindowedValue.java:154). */
  def timestamped[T: Encoder](spark: SparkSession, values: Seq[(T, Long)]): DataFrame = {
    import spark.implicits._
    implicit val tupleEnc: Encoder[(T, Long)] =
      org.apache.spark.sql.Encoders.tuple(implicitly[Encoder[T]], implicitly[Encoder[Long]])
    spark.createDataset(values).toDF("value", "ts_millis")
      .withColumn("event_time", timestamp_millis(col("ts_millis")))
      .drop("ts_millis")
  }

  /** Create.empty(schema) (reference: Create.java:159 — empty needs an
    * explicit coder; here an explicit schema). */
  def empty(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Create.empty with a derived encoder. */
  def emptyDs[T: Encoder](spark: SparkSession): Dataset[T] =
    spark.emptyDataset[T]
}
