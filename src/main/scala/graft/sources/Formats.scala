package graft.sources

import java.io.{EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32C, GZIPInputStream}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** FileBasedSink's commit protocol (reference: SDK/io/FileBasedSink.java —
  * WriteOperation temp directory + finalize; WriteFiles.java): every task
  * attempt writes a uniquely-named file under `_temporary-<token>/`; the
  * driver promotes exactly one attempt per shard to
  * `part-SSSSS-of-NNNNN<suffix>` (Beam's default shard template) and
  * deletes the temp directory, so retried or speculative attempts can
  * never double-commit. Format-agnostic: the writer callback owns the
  * bytes, this owns atomicity. */
private[sources] object ShardedCommit {

  /** Run `writeShard(records, stream)` once per non-empty partition and
    * commit the results. Returns committed paths in shard order (empty
    * partitions produce no shard; NNNNN counts committed shards). */
  def write[X](ds: org.apache.spark.sql.Dataset[X], dir: String, suffix: String)(
               writeShard: (Iterator[X], java.io.OutputStream) => Unit): Seq[String] = {
    val spark = ds.sparkSession
    // ship the Hadoop conf as properties: executors must resolve `dir`
    // against the SAME filesystem config the driver sees
    val confProps = spark.sessionState.newHadoopConf().iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val bConf = spark.sparkContext.broadcast(confProps)
    val fnShard = writeShard // avoid capturing an outer `this`
    val token = java.util.UUID.randomUUID().toString
    val tmpDir = s"$dir/_temporary-$token"
    val attempts = ds.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val conf = new Configuration(false)
        bConf.value.foreach { case (k, v) => conf.set(k, v) }
        val pid = TaskContext.getPartitionId()
        val attempt = java.util.UUID.randomUUID().toString
        val tmp = new Path(s"$tmpDir/part-$pid-$attempt")
        val out = tmp.getFileSystem(conf).create(tmp, true)
        try fnShard(it, out) finally out.close()
        Iterator.single((pid, tmp.toString))
      }
    }(Encoders.tuple(Encoders.scalaInt, Encoders.STRING)).collect()
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // one attempt per shard (first wins); stable shard order by partition id
    val chosen = attempts.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.head)
    val total = chosen.size
    val dests = chosen.indices.map(i => f"$dir/part-$i%05d-of-$total%05d$suffix")
    // Overwrite semantics at the commit point, with the narrowest possible
    // destruction window: before renaming, delete ONLY prior files whose
    // names collide with this generation's destinations (each is replaced
    // within the same loop instant); every OTHER stale part-* file — e.g. a
    // prior run with more shards, whose leftovers a later glob read would
    // silently union in — is removed only AFTER the full new set is in
    // place, so a driver failure mid-commit never leaves the directory
    // empty of data that nothing replaced.
    dests.foreach(d => fs.delete(new Path(d), false))
    val committed = chosen.zipWithIndex.map { case ((_, tmp), i) =>
      val dst = new Path(dests(i))
      // HDFS-style filesystems report rename failure via `false`, not an
      // exception — swallowing it would delete the only copy below
      if (!fs.rename(new Path(tmp), dst))
        throw new java.io.IOException(s"commit rename failed: $tmp -> $dst")
      dst.toString
    }
    // qualify both sides: globStatus returns scheme-qualified paths
    // (file:/…) while the committed strings may be scheme-less
    val keep = committed.map(s => fs.makeQualified(new Path(s)).toString).toSet
    Option(fs.globStatus(new Path(s"$dir/part-*"))).getOrElse(Array.empty)
      .map(_.getPath).filterNot(p => keep.contains(fs.makeQualified(p).toString))
      .foreach(p => fs.delete(p, false))
    fs.delete(new Path(tmpDir), true) // uncommitted attempts die with it
    bConf.destroy()
    committed
  }
}

/** TFRecordIO (reference: SDK/io/TFRecordIO.java): TensorFlow's byte-record
  * container. The wire format (TFRecordIO.java:619-635) per record is
  *
  *   uint64 length                 (little-endian)
  *   uint32 masked_crc32c(length)  (little-endian; crc over the 8 LE bytes)
  *   byte   data[length]
  *   uint32 masked_crc32c(data)    (little-endian)
  *
  * with mask(crc) = ((crc >>> 15) | (crc << 17)) + 0xa282ead8.
  *
  * Records carry no sync marker, so files are NOT offset-splittable — the
  * reference's TFRecordSource declares isSplittable() = false
  * (TFRecordIO.java:465) and reads each file sequentially; parallelism is
  * across files/shards. Paths (not bytes) are distributed and each file is
  * stream-decoded on its executor ([[DistributedRead]]): per-file memory is
  * O(one record) and file size is unbounded.
  * Compression follows the reference's CompressionType.AUTO: a `.gz`
  * suffix selects gzip decompression (TFRecordIO.java:408).
  *
  * The writer reproduces FileBasedSink's temp-file + driver-rename commit
  * (SDK/io/FileBasedSink.java — "WriteOperation" temporary directory +
  * finalize): each task writes to `_temporary-<token>/`; only the driver
  * promotes one attempt per shard to `part-SSSSS-of-NNNNN<suffix>`
  * (Beam's default shard template, TFRecordIO.java:219-229), so retried or
  * speculative task attempts can never double-commit.
  */
object TFRecordIO {

  /** TFRecordIO.java:626: the mask makes embedded CRCs themselves
    * crc-resistant (TensorFlow's masked_crc32c). */
  private def mask(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + 0xa282ead8

  private def crc32c(bytes: Array[Byte]): Int = {
    val c = new CRC32C(); c.update(bytes); c.getValue.toInt
  }

  /** One framed record: header (length + masked length-crc), data, footer
    * (masked data-crc) — TFRecordIO.java:637-645 encodeData. */
  def encodeRecord(data: Array[Byte]): Array[Byte] = {
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    ByteBuffer.allocate(12 + data.length + 4).order(ByteOrder.LITTLE_ENDIAN)
      .put(lenBytes).putInt(mask(crc32c(lenBytes)))
      .put(data).putInt(mask(crc32c(data)))
      .array()
  }

  private def readFully(in: InputStream, n: Int): Option[Array[Byte]] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) {
        if (off == 0) return None
        throw new EOFException(s"truncated TFRecord: wanted $n bytes, got $off")
      }
      off += r
    }
    Some(buf)
  }

  /** Sequential record parse (TFRecordIO.java:646-668 readPossiblyTruncated
    * + readChecksummed): stops cleanly at EOF on a record boundary, throws
    * on truncation or checksum mismatch. */
  def readRecords(in: InputStream, verifyCrc: Boolean = true): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRec: Option[Array[Byte]] = advance()
      private def advance(): Option[Array[Byte]] =
        readFully(in, 12).map { header =>
          val hb = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
          val len = hb.getLong
          if (len < 0 || len > Int.MaxValue)
            throw new IllegalArgumentException(s"invalid TFRecord length: $len")
          if (verifyCrc && hb.getInt != mask(crc32c(header.take(8))))
            throw new IllegalArgumentException("TFRecord length checksum mismatch")
          val data = readFully(in, len.toInt)
            .getOrElse(throw new EOFException("truncated TFRecord data"))
          val footer = readFully(in, 4)
            .getOrElse(throw new EOFException("truncated TFRecord footer"))
          if (verifyCrc && ByteBuffer.wrap(footer).order(ByteOrder.LITTLE_ENDIAN)
                .getInt != mask(crc32c(data)))
            throw new IllegalArgumentException("TFRecord data checksum mismatch")
          data
        }
      def hasNext: Boolean = nextRec.isDefined
      def next(): Array[Byte] = {
        val r = nextRec.getOrElse(throw new NoSuchElementException)
        nextRec = advance(); r
      }
    }

  /** TFRecordIO.read() → DataFrame(file STRING, record BINARY); glob
    * patterns per the binaryFile source. */
  def read(spark: SparkSession, pattern: String,
           verifyCrc: Boolean = true): DataFrame = {
    val paths = DistributedRead.expand(spark, pattern).map(_.getPath.toString)
    require(paths.nonEmpty, s"no TFRecord files match $pattern")
    // stream-decode on executors: no whole-file byte[], no 2 GiB cap
    DistributedRead.readPaths(spark, paths) { (path, raw) =>
      val in: InputStream =
        if (path.endsWith(".gz")) new GZIPInputStream(raw) else raw
      readRecords(in, verifyCrc).map(r => (path, r))
    }(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .toDF("file", "record")
  }

  /** TFRecordIO.write(): `value` (binary) → `numShards` files named
    * `part-SSSSS-of-NNNNN<suffix>` under `dir` via [[ShardedCommit]].
    * Returns the committed paths in shard order. */
  def write(df: DataFrame, value: Column, dir: String, numShards: Int = 0,
            suffix: String = ".tfrecord"): Seq[String] = {
    val data0 = df.select(value.cast("binary").as("r"))
    val data = if (numShards > 0) data0.repartition(numShards) else data0
    ShardedCommit.write(data.as(Encoders.BINARY), dir, suffix) {
      (it, out) => it.foreach { rec =>
        // the reference's coder rejects null records (ByteArrayCoder);
        // failing here names the cause instead of an executor NPE
        require(rec != null, "TFRecordIO.write: null record value")
        out.write(encodeRecord(rec))
      }
    }
  }
}

/** XmlIO (reference: sdks/java/io/xml/.../XmlIO.java): element-per-record
  * XML files. The reference splits files on `<recordElement>` boundaries
  * and JAXB-unmarshals each record (XmlSource); Spark 4's built-in XML
  * source does the same splitting via `rowTag` with schema
  * inference/enforcement replacing JAXB. `rootElement` matters only for
  * writing (the document wrapper), as in the reference's XmlIO.write. */
object XmlIO {

  /** XmlIO.read().withRecordElement(recordElement) — XmlIO.java:336;
    * charset per withCharset (XmlIO.java:372). */
  def read(spark: SparkSession, path: String, recordElement: String,
           schema: Option[StructType] = None,
           charset: String = "UTF-8"): DataFrame = {
    val r = spark.read.format("xml")
      .option("rowTag", recordElement).option("charset", charset)
    schema.fold(r)(r.schema).load(path)
  }

  /** XmlIO.write().withRootElement(root).withRecordElement(rec) —
    * XmlIO.java:328/:336 (write side). */
  def write(df: DataFrame, path: String, rootElement: String = "records",
            recordElement: String = "record", charset: String = "UTF-8",
            numShards: Int = 0): Unit = {
    val sharded = if (numShards > 0) df.repartition(numShards) else df
    sharded.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("xml")
      .option("rootTag", rootElement).option("rowTag", recordElement)
      .option("charset", charset).save(path)
  }
}
