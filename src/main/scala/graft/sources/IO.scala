package graft.sources

import java.util.Properties

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}

/** Batch IO surface (reference: SDK/io/TextIO.java:176/:210,
  * AvroIO.java, GenerateSequence.java:103, jdbc/JdbcIO.java:145/:154).
  * Thin Spark-native wrappers: Spark's readers already supply glob
  * expansion, compression handling (CompressedSource), offset-range
  * splitting (FileBasedSource) and the temp-file-commit protocol
  * (FileBasedSink/WriteFiles) that the reference implements by hand.
  */
object IO {

  // ------------------------------------------------------------------ text

  /** TextIO.read(): line-oriented text, glob + compression handled by the
    * reader (reference: TextIO.java:176; CompressedSource.java). */
  def readText(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** TextIO.write() (reference: TextIO.java:210):
    *  - withNumShards(n)    → repartition(n) = n output files
    *  - dynamic destinations (to(DynamicDestinations), TextIO.java:146)
    *    → partitionBy(cols) = one directory per destination key
    *  - compression         → codec option. */
  def writeText(ds: Dataset[String], path: String, numShards: Int = 0,
                compression: Option[String] = None): Unit = {
    val sharded = if (numShards > 0) ds.repartition(numShards) else ds
    val w = sharded.write.mode(SaveMode.Overwrite)
    compression.fold(w)(c => w.option("compression", c)).text(path)
  }

  /** Dynamic-destination text/parquet write: route rows to per-key dirs. */
  def writePartitioned(df: DataFrame, path: String, format: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
      .format(format).save(path)

  /** WriteOneFilePerWindow (reference: examples/common/WriteOneFilePerWindow
    * .java:46-116 — TextIO `withWindowedWrites` + a `FilenamePolicy` naming
    * files from the window's bounds): write formatted text lines grouped so
    * each window produces its own output file(s), path segment derived
    * deterministically from the window bounds. The reference's
    * `PerWindowFiles` prints ISO hourMinute (`10:00-10:10-0-of-1`); here the
    * label is date-qualified (`w=20260101T1000-1010`) so windows from
    * different days never collide, and it is a partition DIRECTORY (the
    * Spark-native windowed-sink shape; the dir name carries the same
    * window-bound derivation).
    *
    * - default (`numShards = 0`): EXACTLY one file per window — rows are
    *   hash-clustered on the window label so one task owns each window, and
    *   `partitionBy` splits that task's output one directory per window.
    * - `numShards = n` (`withNumShards`, WriteOneFilePerWindow.java:65-67):
    *   at most n files per window via a content-derived salt (derived from
    *   the row, not the partition position, so a re-executed task routes
    *   each row identically under fetch-failure retry).
    *
    * 100 TB: the clustering shuffle keys on window label (bounded
    * cardinality per trigger); a hot window fans its write out with
    * `numShards` instead of funneling through one task. Streaming shape:
    * call from `foreachBatch` with `SaveMode.Append` — in append mode each
    * window is emitted exactly once (watermark-final pane), so the
    * one-file-per-window layout is preserved across micro-batches. */
  def writeOneFilePerWindow(df: DataFrame, line: Column, wstart: Column,
                            wend: Column, path: String, numShards: Int = 0,
                            saveMode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions._
    val label = concat(date_format(wstart, "yyyyMMdd'T'HHmm"), lit("-"),
      date_format(wend, "HHmm"))
    val rows = df.select(line.cast("string").as("value"), label.as("w"))
    val clustered =
      if (numShards > 0)
        rows.withColumn("__shard", pmod(xxhash64(col("value")), lit(numShards)))
          .repartition(col("w"), col("__shard")).drop("__shard")
      else rows.repartition(col("w"))
    clustered.write.mode(saveMode).partitionBy("w").format("text").save(path)
  }

  // --------------------------------------------------------- columnar files

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String, numShards: Int = 0): Unit =
    (if (numShards > 0) df.repartition(numShards) else df)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** AvroIO.read/write (reference: AvroIO.java) via the spark-avro module
    * where its jar is on the classpath (any standard Spark distribution).
    * [[AvroFiles]] is the self-contained, container-tested implementation
    * on the bundled Avro library — prefer it when the connector module is
    * absent; schema mapping per SURVEY.md §1.2 AvroCoder row. */
  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format("avro").load(path)

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("avro").save(path)

  /** CSV/JSON (Beam reads these via TextIO + parse ParDo; Spark's readers
    * subsume the parse step with schema inference or explicit schema). */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header).csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header).csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  // ------------------------------------------------------------- sequences

  /** GenerateSequence.from(a).to(b) (reference: GenerateSequence.java:103):
    * bounded longs [from, to), splittable across default parallelism —
    * CountingSource's splitIntoBundles is spark.range's partitioning.
    * Unbounded form = StreamIO.rate. */
  def generateSequence(spark: SparkSession, from: Long, to: Long,
                       numPartitions: Option[Int] = None): Dataset[java.lang.Long] =
    numPartitions.fold(spark.range(from, to))(n => spark.range(from, to, 1, n))
      .toDF("value").selectExpr("value").as(org.apache.spark.sql.Encoders.LONG)

  // ----------------------------------------------------------------- match

  /** Match.filepattern (reference: SDK/io/Match.java — filepattern →
    * PCollection of matched-file metadata): glob expansion happens where
    * the reference does it (the submitting process), directories expand
    * one level like FileSystems.match. Returns (path, size_bytes,
    * modified_ms). */
  def matchFiles(spark: SparkSession, pattern: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .flatMap(st => if (st.isDirectory) fs.listStatus(st.getPath) else Array(st))
      .filter(_.isFile)
      .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
    import spark.implicits._
    matched.toSeq.toDF("path", "size_bytes", "modified_ms")
  }

  // ------------------------------------------------------------- bucketing

  /** Bucketed co-located table write — the pay-the-shuffle-ONCE layout for
    * fact tables that are joined/aggregated on the same keys repeatedly.
    * The reference has no physical-layout control at all (every Beam GBK
    * re-shuffles; its Spark runner calls groupByKey per transform —
    * SPARKR/translation/GroupCombineFunctions.java); a bucketed table
    * hash-partitions rows into `numBuckets` files per the bucket columns
    * at WRITE time, and every later equi-join or groupBy on those columns
    * (between same-bucketed tables) plans with NO Exchange — at 100 TB
    * that removes the dominant cost of a join-heavy pipeline.
    * `sortCols` additionally sorts within buckets (SMJ without a sort
    * step). Registered in the session catalog; read back via
    * `spark.table(table)`. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketed write needs at least one bucket column")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Size-targeted parquet write — the small-files/fat-files fixer: pick
    * the output file count from the data's MEASURED bytes-per-row (sampled
    * from `sampleRows` rows encoded through the actual parquet writer is
    * overkill; the in-memory row size × a parquet compression factor is
    * the standard estimate) so each output file lands near `targetBytes`.
    * At 100 TB both failure modes are expensive: thousands of KB-sized
    * files per partition drown the namenode and the scan scheduler;
    * multi-GB single files serialize retries and stragglers.
    *
    * The estimate costs one count + one tiny sample collect; pass
    * `bytesPerRowHint` to skip both when the table's row size is known
    * (the SCALING.md knob discipline). Returns the file count used. */
  def writeSized(df: DataFrame, dir: String, targetBytes: Long = 128L << 20,
                 sampleRows: Int = 1000, compressionFactor: Double = 0.35,
                 bytesPerRowHint: Option[Double] = None): Int = {
    require(targetBytes > 0, s"writeSized needs targetBytes > 0, got $targetBytes")
    val persisted = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = persisted.count()
      if (n == 0L) { persisted.write.mode(SaveMode.Overwrite).parquet(dir); return 1 }
      val bpr = bytesPerRowHint.getOrElse {
        val sample = persisted.limit(sampleRows).collect()
        val raw = sample.map(r => r.toSeq.map {
          case null => 4L
          case s: String => s.length.toLong + 4L
          case b: Array[Byte] => b.length.toLong + 4L
          case q: Seq[_] => q.size.toLong * 8L + 4L
          case _ => 8L
        }.sum).sum.toDouble / sample.length
        raw * compressionFactor
      }
      val files = math.max(1, math.ceil(n * bpr / targetBytes).toInt)
      persisted.repartition(files).write.mode(SaveMode.Overwrite).parquet(dir)
      files
    } finally persisted.unpersist()
  }

  // ------------------------------------------------------------------ jdbc

  /** JdbcIO.read (reference: JdbcIO.java:145): query or table read;
    * `partitionColumn` + bounds shard the read across executors (the
    * reference reads on one worker — this exceeds it). */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: Map[String, String] = Map.empty,
               partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    partitionColumn match {
      case Some((colName, lower, upper, numParts)) =>
        spark.read.jdbc(url, table, colName, lower, upper, numParts, p)
      case None => spark.read.jdbc(url, table, p)
    }
  }

  /** JdbcIO.write (reference: JdbcIO.java:154): batched inserts per
    * partition (the reference's 1000-row statement batching is the JDBC
    * writer's `batchsize` option). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Map[String, String] = Map.empty,
                batchSize: Int = 1000, mode: SaveMode = SaveMode.Append): Unit = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, p)
  }
}
