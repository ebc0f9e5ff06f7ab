package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Standalone k-means operator semantics (the clustering engine the ANN
  * family shares, exposed first-class in round 10). */
class KmeansSpec extends SparkSpec {

  import spark.implicits._

  // two tight clusters on the 3-sphere, well separated
  private lazy val vecs = {
    val a = Seq(1.0f, 0.0f, 0.0f); val b = Seq(0.0f, 1.0f, 0.0f)
    (0L to 19L).map { i =>
      val base = if (i < 10) a else b
      val eps = 0.01f * (i % 5)
      (i, Seq(base(0) + eps, base(1) + eps, base(2)))
    }.toDF("vec_id", "embedding")
  }

  test("two separated clusters land in two cells, co-members together") {
    val asgn = Similarity.kmeans(vecs, col("vec_id"), col("embedding"),
      k = 2, iters = 2).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asgn.size == 20)
    val cellsA = (0L to 9L).map(asgn).toSet
    val cellsB = (10L to 19L).map(asgn).toSet
    assert(cellsA.size == 1 && cellsB.size == 1 && cellsA != cellsB,
      s"expected clean separation, got $asgn")
  }

  test("iterations are deterministic: same input → same assignment") {
    val a = Similarity.kmeans(vecs, col("vec_id"), col("embedding"), k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val b = Similarity.kmeans(vecs, col("vec_id"), col("embedding"), k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("empty corpus fails loud") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.kmeans(empty, col("vec_id"), col("embedding"), k = 4)
    }
  }
}
