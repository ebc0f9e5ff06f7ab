package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** Semantics + plan pins for DSIR importance resampling. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  // two clearly-separated vocabularies: target docs talk about cats,
  // raw noise talks about stocks; one raw doc is cat-like
  private lazy val docs = Seq(
    (1L, "the cat sat on the mat with the cat", true),
    (2L, "a cat and another cat play with cats", true),
    (3L, "stocks fell as markets tumbled on rates", false),
    (4L, "bond yields and stocks slid lower today", false),
    (5L, "the cat chased the mat across the room", false)
  ).toDF("doc_id", "text", "is_target")

  test("weights rank the target-like raw doc above off-target raw docs") {
    val w = Dsir.importanceWeights(docs, col("doc_id"), col("text"),
        col("is_target"), buckets = 1 << 12, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 5)
    // doc 5 (cat-like) must out-weigh docs 3 and 4 (stock-talk)
    assert(w(5L) > w(3L) && w(5L) > w(4L),
      s"expected cat-like doc 5 to score highest among raw docs: $w")
    // target docs themselves score high (calibration property)
    assert(w(1L) > w(3L) && w(2L) > w(4L))
  }

  test("ngram features are unigrams + bigrams of lowered letters-only words") {
    val ngs = docs.filter($"doc_id" === 3L)
      .select(Dsir.wordNgrams(col("text"))).as[Seq[String]].head()
    assert(ngs.contains("stocks") && ngs.contains("stocks fell") &&
      ngs.contains("on rates"))
    // 7 words → 7 unigrams + 6 bigrams
    assert(ngs.length == 13 && ngs.count(_.contains(" ")) == 6)
    // single-word and empty docs don't blow up
    val tiny = Seq((9L, "word", false), (10L, "!!!", false))
      .toDF("doc_id", "text", "is_target")
    val ws = tiny.select(Dsir.wordNgrams(col("text"))).as[Seq[String]].collect()
    assert(ws(0) == Seq("word") && ws(1).isEmpty)
  }

  test("resample returns exactly k docs, deterministic across runs") {
    val w = Dsir.importanceWeights(docs, col("doc_id"), col("text"),
      col("is_target"), buckets = 1 << 12, alpha = 0.5)
    val a = Dsir.resample(w.filter(!col("is_target"))
      .select(col("doc_id"), col("dsir_logw")), k = 2)
      .collect().map(_.getLong(0)).toSet
    val b = Dsir.resample(w.filter(!col("is_target"))
      .select(col("doc_id"), col("dsir_logw")), k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(a.size == 2 && a == b)
  }

  test("WordNgramCounts kernel ≡ the lambda specification on the real corpus") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val fromLambda = docs.select($"doc_id",
        explode(Dsir.wordNgrams(col("text"))).as("ng"))
      .groupBy("doc_id", "ng").count()
    val fromKernel = docs.select($"doc_id",
        explode(graft.expressions.TextExpressions.wordNgramCounts(lower(col("text")))))
      .select($"doc_id", $"key".as("ng"), $"value".as("count"))
    assert(fromLambda.exceptAll(fromKernel).isEmpty &&
      fromKernel.exceptAll(fromLambda).isEmpty)
    // and on adversarial strings: leading/trailing separators, unicode,
    // single word, empty, null
    val edge = Seq((1L, "  héllo world—again "), (2L, "solo"), (3L, "!!!"),
      (4L, ""), (5L, null)).toDF("doc_id", "text")
    val a = edge.select($"doc_id", explode(Dsir.wordNgrams(col("text"))).as("ng"))
      .groupBy("doc_id", "ng").count()
    val b = edge.select($"doc_id",
        explode(graft.expressions.TextExpressions.wordNgramCounts(lower(col("text")))))
      .select($"doc_id", $"key".as("ng"), $"value".as("count"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("writeShuffled: one dir per shard, in-shard order = sort_key, reproducible") {
    import graft.operators.Curation
    val docs = (0L until 200L).toDF("doc_id")
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-shuf").toString
    try {
      val n = Curation.writeShuffled(docs, col("doc_id"), shards = 4, dir)
      assert(n == 200)
      val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
      assert(shardDirs.length == 4)
      // in-file order matches the deterministic sort_key order per shard
      val back = spark.read.parquet(dir)
      val keys = Curation.shuffleKeys(docs, col("doc_id"), 4)
      (0 until 4).foreach { sh =>
        val onDisk = back.filter($"shard" === sh).collect().map(_.getLong(0)).toSeq
        val expected = keys.filter($"shard" === sh)
          .orderBy($"sort_key", $"doc_id").collect().map(_.getLong(0)).toSeq
        assert(onDisk.sorted == expected.sorted, s"shard $sh membership")
      }
      // the permutation actually permutes (not identity order overall)
      val all = keys.orderBy($"sort_key").collect().map(_.getLong(0)).toSeq
      assert(all != (0L until 200L).toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("plan: scoring is join-free (driver-folded dense model), no global rank window, no cartesian") {
    // r18 contract: the model collects (<= buckets rows by design) and
    // rides as a dense double[] inside the WeightedBucketDot kernel, so
    // the scored frame must contain NO join of any strategy — the old pin
    // asserted the broadcast model JOIN this shape replaced.
    val p = SparkEntry.queries("q_dsir")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"q_dsir must be join-free:\n${p.take(3000)}")
    assert(p.contains("weighted_bucket_dot") || p.contains("Scan ExistingRDD"),
      s"expected the kernel-scored (or checkpointed) frame:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // selection must ride the salted top-k: every window partitions by salt
    val windowSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowSpecs.forall(_.contains("__salt")),
      s"unsalted window funnel in q_dsir:\n${windowSpecs.mkString("\n")}")
  }
}
