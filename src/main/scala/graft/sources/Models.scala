package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persistence for the engine's learned model artifacts — the pieces the
  * incremental operators contractually require "from the previous run"
  * (Similarity.semDedupIncremental needs the SAME centroids;
  * Bpe.encode needs the SAME merges + vocabulary; a changed seed or a
  * re-learned table silently lands increments in a different space).
  * Centroids travel as parquet (engine-readable, schema-checked);
  * merges/vocab as the standard text formats (`merges.txt` lines that
  * [[graft.operators.Bpe.parseMerges]] reads back — interoperable with
  * every BPE implementation that writes rank-ordered pair lines).
  *
  * These are MODEL artifacts — k×dim doubles, |vocab| strings — not data:
  * the parquet paths go through Spark (any object store / HDFS), the text
  * round-trips are driver-side by design. */
object Models {

  /** Persist k-means centroids as (cell, vec) parquet. */
  def writeCentroids(spark: SparkSession, centroids: Array[Array[Double]],
                     dir: String): Unit = {
    require(centroids.nonEmpty, "writeCentroids: empty centroid set")
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim),
      s"writeCentroids: ragged centroids (expected dim $dim)")
    import spark.implicits._
    centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "vec")
      .write.mode("overwrite").parquet(dir)
  }

  /** Load centroids written by [[writeCentroids]] — cell order restored,
    * gaps/duplicates fail loud (a corrupted store must not silently
    * re-cluster increments). */
  def readCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(dir)
      .select(col("cell").cast("int"), col("vec").cast("array<double>"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    require(rows.nonEmpty, s"readCentroids: no centroids at $dir")
    val cells = rows.map(_._1).sorted
    require(cells.toSeq == (0 until rows.length),
      s"readCentroids: cells not a dense [0, ${rows.length}) range at $dir " +
      s"(got ${cells.take(10).mkString(",")}…) — corrupted store")
    rows.sortBy(_._1).map(_._2)
  }

  /** Write a learned merge table in the standard `merges.txt` shape
    * (header line + one "a b" pair per line, rank = position) —
    * the exact format [[graft.operators.Bpe.parseMerges]] consumes. */
  def writeMerges(merges: Seq[(String, String)], path: String): Unit = {
    merges.foreach { case (a, b) =>
      require(!a.contains(" ") && !b.contains(" ") &&
        !a.contains("\n") && !b.contains("\n"),
        s"writeMerges: symbol with whitespace ('$a','$b') cannot round-trip " +
        "the space-separated merges.txt format") }
    val lines = "#version: graft-bpe-1" +: merges.map { case (a, b) => s"$a $b" }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** Read a merges.txt written by [[writeMerges]] (or any standard BPE
    * trainer). */
  def readMerges(path: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try graft.operators.Bpe.parseMerges(src.getLines())
    finally src.close()
  }

  /** Vocabulary as one symbol per line, id = line number. */
  def writeVocab(vocab: Seq[String], path: String): Unit = {
    require(vocab.forall(v => !v.contains("\n")),
      "writeVocab: symbol containing a newline cannot round-trip")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      vocab.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  def readVocab(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().toVector finally src.close()
  }
}
