package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Create
import graft.sources.IO

/** Round-trip tests per format (reference: TextIOTest, AvroIOTest,
  * GenerateSequenceTest, JdbcIOTest shapes). Avro is wrapper-only here —
  * the spark-avro module jar is not in this container. */
class IOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-io").toString

  test("text round-trip with numShards") {
    val dir = tmp() + "/text"
    val data = (1 to 100).map(i => s"line-$i")
    IO.writeText(Create.of(spark, data), dir, numShards = 4)
    val back = IO.readText(spark, dir).collect().toSet
    assert(back == data.toSet)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 4, s"withNumShards(4) must write 4 shard files, got $parts")
  }

  test("text write with gzip compression reads back transparently") {
    val dir = tmp() + "/gz"
    IO.writeText(Create.of(spark, Seq("a", "b")), dir, compression = Some("gzip"))
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".gz")))
    assert(IO.readText(spark, dir).collect().toSet == Set("a", "b"))
  }

  test("dynamic destinations: partitionBy writes per-key directories") {
    val dir = tmp() + "/dyn"
    val df = Create.of(spark, Seq(("a", 1), ("b", 2), ("a", 3))).toDF("dest", "v")
    IO.writePartitioned(df, dir, "parquet", Seq("dest"))
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq == Seq("dest=a", "dest=b"))
    assert(IO.readParquet(spark, dir).count() == 3)
  }

  test("parquet and csv and json round-trips") {
    val df = Create.of(spark, Seq((1L, "x"), (2L, "y"))).toDF("id", "s")
    val p = tmp()
    IO.writeParquet(df, s"$p/pq"); assert(IO.readParquet(spark, s"$p/pq").count() == 2)
    IO.writeCsv(df, s"$p/csv")
    assert(IO.readCsv(spark, s"$p/csv").collect().map(_.getString(1)).toSet == Set("x", "y"))
    IO.writeJson(df, s"$p/json")
    assert(IO.readJson(spark, s"$p/json").count() == 2)
  }

  test("generateSequence produces [from, to) split across partitions") {
    val ds = IO.generateSequence(spark, 10, 110, numPartitions = Some(5))
    assert(ds.count() == 100)
    assert(ds.agg(min(col("value")), max(col("value"))).collect()(0).toSeq == Seq(10L, 109L))
    assert(ds.rdd.getNumPartitions == 5)
  }

  test("matchFiles expands globs and directories to file metadata") {
    val dir = tmp() + "/match"
    IO.writeText(Create.of(spark, Seq("a", "b", "c")), dir, numShards = 3)
    val byGlob = IO.matchFiles(spark, s"$dir/part-*")
    assert(byGlob.count() == 3)
    val row = byGlob.orderBy(col("path")).collect().head
    assert(row.getAs[String]("path").contains("part-") &&
      row.getAs[Long]("size_bytes") > 0 && row.getAs[Long]("modified_ms") > 0)
    // a bare directory expands one level, skipping nothing that's a file
    val byDir = IO.matchFiles(spark, dir)
    assert(byDir.count() >= 3)
    assert(IO.matchFiles(spark, s"$dir/no-such-*").count() == 0)
  }

  test("jdbc round-trip against embedded Derby, sharded read") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val df = Create.of(spark, (1L to 50L).map(i => (i, s"name-$i"))).toDF("id", "name")
    IO.writeJdbc(df, url, "people", props, batchSize = 10,
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    val back = IO.readJdbc(spark, url, "people", props,
      partitionColumn = Some(("id", 1L, 50L, 4)))
    assert(back.rdd.getNumPartitions == 4, "partitioned jdbc read shards the query")
    assert(back.count() == 50)
    assert(back.filter(col("id") === 7L).collect()(0).getString(1) == "name-7")
  }

  test("KafkaIO option translation: Beam read/write config maps to Spark kafka options") {
    import graft.streaming.StreamIO
    // multi-topic subscribe, consumer properties under the kafka. prefix
    val read = StreamIO.kafkaReadOptions("b1:9092,b2:9092", Seq("t1", "t2"),
      startingOffsets = "earliest",
      consumerConfig = Map("receive.buffer.bytes" -> "1048576", "group.id" -> "g"))
    assert(read == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "t1,t2",
      "startingOffsets" -> "earliest",
      "kafka.receive.buffer.bytes" -> "1048576",
      "kafka.group.id" -> "g"), read.toString)
    // withStartReadTime displaces startingOffsets (reference KafkaIO.java:470)
    val timed = StreamIO.kafkaReadOptions("b:9092", Seq("t"), startReadTimeMs = Some(123456789L))
    assert(timed("startingTimestamp") == "123456789" && !timed.contains("startingOffsets"))
    intercept[IllegalArgumentException] { StreamIO.kafkaReadOptions("b:9092", Nil) }
    intercept[IllegalArgumentException] { StreamIO.kafkaReadOptions("", Seq("t")) }
    val write = StreamIO.kafkaWriteOptions("b:9092", "out",
      producerConfig = Map("compression.type" -> "lz4"))
    assert(write == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "out",
      "kafka.compression.type" -> "lz4"), write.toString)
  }

  test("writeSized: file count tracks target bytes; content survives; hint skips the sample") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0L until 2000L).map(i => (i, "x" * 100)).toDF("id", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft-sized").toString
    // ~2000 rows × 100B payload × 0.35 ≈ 73 KB → 8 KB target → ~9 files
    val files = graft.sources.IO.writeSized(df, s"$dir/a", targetBytes = 8L << 10)
    val onDisk = new java.io.File(s"$dir/a").listFiles.count(_.getName.endsWith(".parquet"))
    assert(files == onDisk, s"reported $files, on disk $onDisk")
    assert(files >= 4 && files <= 20, s"expected ~9 files for the estimate, got $files")
    val back = spark.read.parquet(s"$dir/a")
    assert(back.count() == 2000 && back.agg(sum(col("id"))).head.getLong(0) == 1999000L)
    // explicit hint: exact arithmetic, no sampling pass
    val f2 = graft.sources.IO.writeSized(df, s"$dir/b", targetBytes = 1000L,
      bytesPerRowHint = Some(10.0)) // 2000×10/1000 = 20 files
    assert(f2 == 20)
    // empty frame → single file dir, no crash
    val f0 = graft.sources.IO.writeSized(df.limit(0), s"$dir/c")
    assert(f0 == 1 && spark.read.parquet(s"$dir/c").count() == 0)
  }
}
