package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Distributed stream-decode of matched files (reference contract:
  * SDK/io/FileBasedSource.java — one bundle per file/offset-range, records
  * decoded from an open stream, never the whole file in memory).
  *
  * Spark's `binaryFile` source ships each file's full byte[] through the
  * plan, which (a) hard-caps files at Int.MaxValue bytes
  * (spark.sql.sources.binaryFile.maxLength) and (b) holds entire shards
  * on-heap. At 100 TB a reader that buffers whole files is wrong even when
  * it happens to fit. This helper instead distributes the PATHS and opens
  * each file on the executor via the Hadoop FileSystem, so decode is
  * streaming and per-file memory is O(one record). [[readPaths]] keeps
  * one-file-per-task granularity (for formats with no mid-file entry
  * points, e.g. TFRecord — TFRecordIO.java:465 isSplittable=false);
  * [[readRanges]] additionally splits inside files for formats with sync
  * markers (Avro), so a single huge shard fans out across the cluster.
  */
private[sources] object DistributedRead {

  /** Glob-expand `pattern` (directories expand one level, like
    * FileSystems.match; `_`/`.` prefixed files skipped as non-data). */
  def expand(spark: SparkSession, pattern: String): Seq[FileStatus] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    Option(fs.globStatus(p)).getOrElse(Array.empty[FileStatus])
      .flatMap(st => if (st.isDirectory) fs.listStatus(st.getPath) else Array(st))
      .filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .sortBy(_.getPath.toString)
      .toSeq
  }

  /** Distribute `paths` across executors and stream-decode each:
    * `decode(path, openStream)` returns the record iterator; the stream is
    * closed when the iterator is exhausted (or the task ends). The Hadoop
    * conf travels as properties (same idiom as ShardedCommit) so executors
    * resolve paths against the driver's filesystem config. */
  def readPaths[T](spark: SparkSession, paths: Seq[String])
                  (decode: (String, java.io.InputStream) => Iterator[T])
                  (implicit enc: Encoder[T]): Dataset[T] = {
    require(paths.nonEmpty, "DistributedRead: no files to read")
    val confProps = spark.sessionState.newHadoopConf().iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val bConf = spark.sparkContext.broadcast(confProps)
    val fnDecode = decode // avoid capturing an outer `this`
    val slots = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(paths)(Encoders.STRING)
      .repartition(slots)
      .mapPartitions { it =>
        val conf = new Configuration(false)
        bConf.value.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap { p =>
          val path = new Path(p)
          val in = path.getFileSystem(conf).open(path)
          closeOnExhaust(fnDecode(p, in), in)
        }
      }
  }

  /** Distribute byte-range splits `(path, start, end)` and decode each on
    * an executor — the offset-range bundle model (reference:
    * SDK/io/OffsetBasedSource.java) for formats that can enter mid-file
    * (Avro sync markers). `open` returns the record iterator plus the
    * resource to close when it is exhausted. Unlike [[readPaths]] the
    * parallelism floor is per SPLIT, so one huge file fans out across the
    * cluster. */
  def readRanges[T](spark: SparkSession, splits: Seq[(String, Long, Long)])
                   (open: (String, Long, Long, Configuration) => (Iterator[T], java.io.Closeable))
                   (implicit enc: Encoder[T]): Dataset[T] = {
    require(splits.nonEmpty, "DistributedRead: no splits to read")
    val confProps = spark.sessionState.newHadoopConf().iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val bConf = spark.sparkContext.broadcast(confProps)
    val fnOpen = open
    val slots = math.max(1, math.min(splits.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(splits)(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
      .repartition(slots)
      .mapPartitions { it =>
        val conf = new Configuration(false)
        bConf.value.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap { case (p, start, end) =>
          val (records, resource) = fnOpen(p, start, end, conf)
          closeOnExhaust(records, resource)
        }
      }
  }

  /** Close `resource` the first time the iterator reports empty, so a
    * flatMap over many files holds at most one stream open per task — PLUS
    * a task-completion listener as the backstop for partial consumption:
    * a limit/take or task failure abandons the iterator before exhaustion,
    * and without the listener every abandoned split would leak its FS
    * handle (fatal over a many-split object-store scan). close() is
    * idempotent-guarded so the double-close on the happy path is a no-op. */
  private def closeOnExhaust[T](it: Iterator[T], resource: java.io.Closeable): Iterator[T] = {
    val guard = new java.util.concurrent.atomic.AtomicBoolean(false)
    def closeOnce(): Unit =
      if (guard.compareAndSet(false, true)) resource.close()
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    new Iterator[T] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) closeOnce()
        h
      }
      def next(): T = it.next()
    }
  }
}
