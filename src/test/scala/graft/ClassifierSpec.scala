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

  // r18 kernel pins: the classifier's hot path moved to two native
  // expressions (HashedNgramBuckets, WeightedBucketDot). Each is pinned
  // against its interpreted HOF/SQL specification on real-ish text, plus
  // the edge cases (the VectorKernelSpec convention for new kernels).
  test("HashedNgramBuckets is bit-identical to the wordNgramCounts + md5-conv HOF specification") {
    import graft.expressions.TextExpressions
    val buckets = 977 // non-power-of-two so a modulo slip can't hide
    val docs = (train.select(col("text")) union Seq(
      "", "  ", "NO lowercase HERE 123", "a", "a a a b", "über café naïve",
      "x\ny\tz", (1 to 50).map(i => s"w$i").mkString(" ")
    ).toDF("text")).withColumn("low", lower(col("text")))
    val kernel = docs.select(
      TextExpressions.hashedNgramBuckets(col("low"), buckets).as("h"))
      .select(col("h.bkts").as("bkts"), col("h.cnts").as("cnts"))
    val spec = docs.select(
      TextExpressions.wordNgramCounts(col("low")).as("m"))
      .select(
        transform(map_keys(col("m")), k =>
          pmod(conv(substring(md5(k), 1, 15), 16, 10).cast("long"),
            lit(buckets.toLong))).as("bkts"),
        map_values(col("m")).as("cnts"))
    val k = kernel.collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    val s = spec.collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    assert(k.toSeq == s.toSeq, "kernel diverged from the HOF specification")
  }

  test("HashedNgramBuckets: null text yields empty arrays") {
    import graft.expressions.TextExpressions
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TextExpressions.hashedNgramBuckets(col("text"), 64).as("h"))
      .select(col("h.bkts"), col("h.cnts")).collect()(0)
    assert(r.getSeq[Long](0).isEmpty && r.getSeq[Long](1).isEmpty)
  }

  test("WeightedBucketDot agrees with the interpreted HOF aggregate; null array -> null; bad bucket fails loud") {
    import graft.expressions.TextExpressions
    val w = Array.tabulate(97)(i => math.sin(i) * 3.7)
    val rows = Seq(
      (Seq(0L, 5L, 96L, 5L), Seq(2L, 1L, 4L, 3L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(42L), Seq(7L))
    ).toDF("bkts", "cnts")
    val got = rows.select(
      TextExpressions.weightedBucketDot(col("bkts"), col("cnts"), w).as("d"))
      .collect().map(_.getDouble(0))
    val want = rows.select(aggregate(
      zip_with(col("bkts"), col("cnts"),
        (b, c) => c.cast("double") * element_at(lit(w), b.cast("int") + 1)),
      lit(0.0), (acc, x) => acc + x).as("d")).collect().map(_.getDouble(0))
    assert(got.toSeq == want.toSeq, s"dot mismatch: ${got.toSeq} vs ${want.toSeq}")
    val withNull = Seq((Option.empty[Seq[Long]], Option(Seq(1L))))
      .toDF("bkts", "cnts")
      .select(TextExpressions.weightedBucketDot(col("bkts"), col("cnts"), w))
      .collect()(0)
    assert(withNull.isNullAt(0), "null bkts must yield NULL")
    val bad = intercept[Exception] {
      Seq((Seq(999L), Seq(1L))).toDF("bkts", "cnts")
        .select(TextExpressions.weightedBucketDot(col("bkts"), col("cnts"), w))
        .collect()
    }
    assert(bad.getMessage != null)
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
