package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Similarity}
import graft.sources.Models

/** Model-artifact persistence: the round-trips the incremental operators
  * depend on across runs. */
class ModelsSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-models-$name").toString

  test("centroids round-trip parquet bit-exactly; incremental assignment agrees") {
    val embs = (0L until 40L).map { i =>
      (i, Seq(math.sin(i * 1.7).toFloat, math.cos(i * 0.9).toFloat, (i % 5) / 5.0f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(embs, col("vec_id"), col("embedding"),
      k = 4, iters = 1)
    val dir = tmp("cents") + "/c"
    Models.writeCentroids(spark, cents, dir)
    val back = Models.readCentroids(spark, dir)
    assert(back.length == cents.length)
    assert(back.zip(cents).forall { case (a, b) => a.toSeq == b.toSeq },
      "centroids must survive bit-exactly (doubles through parquet)")
    // the contract that matters: assignments from the loaded store match
    val a1 = Similarity.assignToCentroids(embs, col("vec_id"), col("embedding"), cents)
      .select(col("id"), col("cell")).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val a2 = Similarity.assignToCentroids(embs, col("vec_id"), col("embedding"), back)
      .select(col("id"), col("cell")).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a1 == a2)
  }

  test("readCentroids fails loud on a gapped cell range") {
    val dir = tmp("gap") + "/c"
    Seq((0, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0))).toDF("cell", "vec")
      .write.parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Models.readCentroids(spark, dir)
    }
    assert(e.getMessage.contains("dense"))
  }

  test("merges round-trip the merges.txt format; learned table survives") {
    val docs = Seq((1L, "low lower lowest low low")).toDF("doc_id", "text")
    val learned = Bpe.learnMerges(docs, col("text"), rounds = 3)
      .map(m => (m._2, m._3))
    val path = tmp("merges") + "/merges.txt"
    Models.writeMerges(learned, path)
    assert(Models.readMerges(path) == learned)
    // whitespace-bearing symbols can't round-trip → loud error
    val e = intercept[IllegalArgumentException] {
      Models.writeMerges(Seq(("a b", "c")), tmp("bad") + "/m.txt")
    }
    assert(e.getMessage.contains("whitespace"))
  }

  test("vocab round-trip preserves ids; encode from reloaded artifacts is identical") {
    val docs = Seq((1L, "low lower lowest"), (2L, "slow glow")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val vocab = Bpe.vocabFromCorpus(docs, col("text"), merges)
    val base = tmp("vocab")
    Models.writeVocab(vocab, s"$base/vocab.txt")
    Models.writeMerges(merges, s"$base/merges.txt")
    val enc1 = Bpe.encode(docs, col("text"), col("doc_id"), merges, vocab)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val enc2 = Bpe.encode(docs, col("text"), col("doc_id"),
        Models.readMerges(s"$base/merges.txt"), Models.readVocab(s"$base/vocab.txt"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(enc1 == enc2)
  }
}
