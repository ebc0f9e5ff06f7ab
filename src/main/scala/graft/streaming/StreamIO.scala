package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming sources & sinks (reference: SDK/io/UnboundedSource.java,
  * TextIO.watchForNewFiles TextIO.java:315, KafkaIO.java:241,
  * GenerateSequence.java:103 unbounded form).
  *
  * Structured Streaming's file source already does continuous new-file
  * discovery (Beam's Watch.growthOf specialization for files); the rate
  * source replaces GenerateSequence.withRate; MemoryStream (test scope)
  * replaces CreateStream/TestStream.
  */
object StreamIO {

  /** GenerateSequence.withRate (reference: GenerateSequence.java:113):
    * unbounded monotonically increasing longs with event timestamps —
    * columns (timestamp, value). */
  def rate(spark: SparkSession, rowsPerSecond: Long, numPartitions: Int = 1): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", numPartitions)
      .load()

  /** TextIO.watchForNewFiles (reference: TextIO.java:315): line-oriented
    * continuous directory read. */
  def textDir(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 100): Dataset[String] = {
    import spark.implicits._
    spark.readStream.option("maxFilesPerTrigger", maxFilesPerTrigger).textFile(dir)
  }

  /** Schema'd continuous directory reads (parquet/json/csv). */
  def fileDir(spark: SparkSession, dir: String, format: String, schema: StructType): DataFrame =
    spark.readStream.format(format).schema(schema).load(dir)

  /** Beam KafkaIO.read config → Spark kafka-source option translation,
    * exposed as a PURE map so the mapping is unit-testable without the
    * connector jar or a broker (reference: KafkaIO.java:267 read(), :340
    * withBootstrapServers, :352/:363 withTopic(s), :442
    * updateConsumerProperties, :470 withStartReadTime). Spark expects raw
    * consumer properties under its `kafka.` prefix; `withStartReadTime`
    * maps to `startingTimestamp` (ms) and is mutually exclusive with
    * `startingOffsets`, mirroring the reference's checkArgument. */
  def kafkaReadOptions(bootstrapServers: String,
                       topics: Seq[String],
                       startingOffsets: String = "latest",
                       startReadTimeMs: Option[Long] = None,
                       consumerConfig: Map[String, String] = Map.empty): Map[String, String] = {
    require(bootstrapServers.nonEmpty, "bootstrapServers is required")
    require(topics.nonEmpty, "at least one topic is required")
    require(startReadTimeMs.isEmpty || startingOffsets == "latest",
      "withStartReadTime conflicts with an explicit startingOffsets " +
        "(reference KafkaIO checkArgument: set one or the other)")
    val start = startReadTimeMs match {
      case Some(ms) => Map("startingTimestamp" -> ms.toString)
      case None     => Map("startingOffsets" -> startingOffsets)
    }
    Map("kafka.bootstrap.servers" -> bootstrapServers,
        "subscribe" -> topics.mkString(",")) ++ start ++
      consumerConfig.map { case (k, v) => s"kafka.$k" -> v }
  }

  /** KafkaIO.write config → Spark kafka-sink options (same pure-map
    * pattern; producer properties under the `kafka.` prefix). */
  def kafkaWriteOptions(bootstrapServers: String, topic: String,
                        producerConfig: Map[String, String] = Map.empty): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrapServers, "topic" -> topic) ++
      producerConfig.map { case (k, v) => s"kafka.$k" -> v }

  /** KafkaIO.read (reference: KafkaIO.java:267). Config-level wrapper: the
    * kafka connector jar is not in this container, so this constructs the
    * standard reader from [[kafkaReadOptions]]; the translation itself is
    * unit-tested, end-to-end semantics exercised where the connector
    * exists. */
  def kafka(spark: SparkSession, bootstrapServers: String, topics: String,
            startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaReadOptions(bootstrapServers, topics.split(",").toSeq, startingOffsets))
      .load()

  /** KafkaIO.write: value (and optional key) to a topic. */
  def kafkaSink[T](ds: Dataset[T], bootstrapServers: String, topic: String): DataStreamWriter[T] =
    ds.writeStream.format("kafka")
      .options(kafkaWriteOptions(bootstrapServers, topic))

  /** File sink with sharding via partition count (TextIO.write.withNumShards
    * ≈ repartition(n); dynamic destinations ≈ partitionBy columns —
    * reference: TextIO.java:210, :146). */
  def fileSink[T](ds: Dataset[T], format: String, path: String, checkpoint: String,
                  partitionByCols: Seq[String] = Nil): DataStreamWriter[T] = {
    val w = ds.writeStream.format(format)
      .option("path", path).option("checkpointLocation", checkpoint)
    if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w
  }

  /** foreachBatch sink: per-micro-batch arbitrary logic (the Beam
    * "write via ParDo" escape hatch). */
  def foreachBatchSink[T](ds: Dataset[T])(f: (Dataset[T], Long) => Unit): DataStreamWriter[T] =
    ds.writeStream.foreachBatch(f)

  /** Watch.growthOf (reference: SDK/transforms/Watch.java:119): generic
    * polling for growth of a set — every tick invokes `poll` on an
    * executor and each element (by `idCols`) is emitted exactly once, EVER
    * (Beam's contract: seen-set state is unbounded until the watch
    * terminates — `dedupWithin = None`, the default, matches it with
    * dropDuplicates state). Pass `dedupWithin = Some(horizon)` for the
    * bounded-state variant: elements re-polled after the horizon re-emit —
    * a deliberate narrowing for unbounded id spaces. The file-discovery
    * specialization is [[textDir]]/[[fileDir]]. */
  def watchGrowth[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, pollEverySeconds: Long,
      poll: () => Seq[T], idCols: Seq[String],
      dedupWithin: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val ticks = rate(spark, rowsPerSecond = 1)
      .filter(pmod(unix_timestamp(col("timestamp")), lit(pollEverySeconds)) === 0)
    watchGrowthFrom(ticks, poll, idCols, dedupWithin)
  }

  /** watchGrowth with an injected tick stream (any streaming frame; one
    * poll per row) — the testable core. */
  def watchGrowthFrom[T: org.apache.spark.sql.Encoder](
      ticks: DataFrame, poll: () => Seq[T], idCols: Seq[String],
      dedupWithin: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = ticks.sparkSession
    import spark.implicits._
    val polled = ticks.select(lit(1).as("__t")).as[Int]
      .flatMap(_ => poll())
      .toDF()
    dedupWithin match {
      case None => polled.dropDuplicates(idCols) // emit once, ever (Beam)
      case Some(horizon) => polled
        .withColumn("__poll_time", current_timestamp())
        .withWatermark("__poll_time", horizon)
        .dropDuplicatesWithinWatermark(idCols)
    }
  }

  /** Test-scope memory sink: start + return the query; read results via
    * spark.table(name). */
  def memorySink[T](ds: Dataset[T], name: String, outputMode: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    ds.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).trigger(trigger).start()
}
