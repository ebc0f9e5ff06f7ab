package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Logistic-regression quality-classifier semantics. */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  // positives talk about cats, negatives about stocks; held-out docs of
  // each flavor must score on the right side of 0.5 after training
  private lazy val train = Seq(
    (1L, "the cat sat on the mat", true),
    (2L, "a cat and another cat play", true),
    (3L, "cats on mats play all day", true),
    (4L, "stocks fell as markets tumbled", false),
    (5L, "bond yields and stocks slid", false),
    (6L, "markets rallied as yields fell", false)
  ).toDF("doc_id", "text", "is_good")

  test("3 GD rounds separate two disjoint vocabularies") {
    val (b, w) = Classifier.trainLogReg(train, col("doc_id"), col("text"),
      col("is_good"), buckets = 1 << 12, rounds = 8, lr = 1.0)
    val heldOut = Seq(
      (10L, "the cat play on the mat"), (11L, "stocks and markets fell")
    ).toDF("doc_id", "text")
    val scored = Classifier.scoreLogReg(heldOut, col("doc_id"), col("text"), b, w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(10L) > 0.5 && scored(11L) < 0.5,
      s"expected cat doc > 0.5 > stock doc, got $scored")
  }

  test("training reduces mean log-loss round over round") {
    def loss(bias: Double, w: Array[Double]): Double = {
      val scored = Classifier.scoreLogReg(train, col("doc_id"), col("text"), bias, w)
        .join(train.select(col("doc_id"), col("is_good")), "doc_id")
        .select(col("quality_prob"), col("is_good").cast("double").as("y"))
        .collect()
      scored.map { r =>
        val p = r.getDouble(0).max(1e-12).min(1 - 1e-12); val y = r.getDouble(1)
        -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }.sum / scored.length
    }
    val (b1, w1) = Classifier.trainLogReg(train, col("doc_id"), col("text"),
      col("is_good"), buckets = 1 << 12, rounds = 1, lr = 1.0)
    val (b4, w4) = Classifier.trainLogReg(train, col("doc_id"), col("text"),
      col("is_good"), buckets = 1 << 12, rounds = 4, lr = 1.0)
    assert(loss(b4, w4) < loss(b1, w1),
      s"loss must fall: r1=${loss(b1, w1)} r4=${loss(b4, w4)}")
  }

  test("invalid hyperparameters fail loud") {
    intercept[IllegalArgumentException] {
      Classifier.trainLogReg(train, col("doc_id"), col("text"),
        col("is_good"), rounds = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.trainLogReg(train, col("doc_id"), col("text"),
        col("is_good"), lr = 0.0)
    }
  }
}
