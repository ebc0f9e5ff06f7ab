package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Discriminative quality classifier: logistic regression over hashed
  * unigram+bigram bucket counts (the fastText-/CCNet-classifier shape every
  * production corpus filter uses — public technique: a linear model on
  * hashed bag-of-ngram features, trained to separate a trusted slice from
  * the raw crawl, then applied as a keep/drop score).
  *
  * Training is full-batch gradient descent, driver-coordinated like Lloyd
  * rounds: per round ONE broadcast join (weights ≤ `buckets` rows) + two
  * aggregates (per-doc margin, per-bucket gradient), and the collected
  * driver state is ≤ `buckets` doubles. No per-round corpus rescans beyond
  * the cached hashed-count frame, whose size is Σ min(|doc ngrams|, B) —
  * the same bounded feature space [[Dsir]] uses (and the same
  * engine-neutral md5 hash, so the oracle replays training bit-for-bit
  * modulo sub-rounding float noise).
  *
  * Plan shape (the 100 TB argument): the hashed frame is partitioned by
  * `doc_id` ONCE and cached — the per-round margin aggregate
  * (groupBy doc_id: clustering satisfied), the margin cache, and the
  * gradient join (both sides doc_id-partitioned) then run with ZERO
  * exchanges per round; the only per-round shuffle is the per-bucket
  * gradient rollup, which map-side combines to ≤ `buckets` rows per
  * partition before it moves. Nothing per-doc is ever broadcast or
  * collected — driver state stays ≤ `buckets` doubles however many
  * documents train.
  *
  * Semantics note: docs with zero extracted features (empty/no-letter
  * text) have no feature rows — they neither vote during training nor
  * receive scores. Filter them beforehand if a verdict for every row is
  * needed.
  */
object Classifier {

  /** Hashed features partitioned by doc: (doc_id, y, bucket, cnt),
    * doc_id-hash-partitioned and cached. Callers running train AND score
    * over the same docs should build this once ([[trainAndScore]]) — the
    * corpus tokenizes a single time. Caller unpersists. */
  private[graft] def hashedByDoc(docs: DataFrame, id: Column, text: Column,
                                 label: Column, buckets: Int): DataFrame =
    Dsir.hashedCounts(docs, id, text, label, buckets)
      .select(col("doc_id"), col("is_target").cast("double").as("y"),
        col("bucket"), col("cnt"))
      .repartition(col("doc_id"))
      .cache()

  /** (bias, weights[buckets]) after `rounds` full-batch GD steps from zero
    * init: p = sigmoid(b + Σ c·w), gradient of mean log-loss. */
  def trainLogReg(docs: DataFrame, id: Column, text: Column, label: Column,
                  buckets: Int = 1 << 16, rounds: Int = 3,
                  lr: Double = 0.5): (Double, Array[Double]) = {
    val hashed = hashedByDoc(docs, id, text, label, buckets)
    try trainOnHashed(hashed, buckets, rounds, lr)
    finally hashed.unpersist()
  }

  private[graft] def trainOnHashed(hashed: DataFrame, buckets: Int,
                                   rounds: Int, lr: Double): (Double, Array[Double]) = {
    require(rounds >= 1 && lr > 0 && buckets > 0,
      s"trainLogReg needs rounds>=1, lr>0, buckets>0 (got $rounds, $lr, $buckets)")
    val spark = hashed.sparkSession
    import spark.implicits._
    val n = hashed.select(col("doc_id")).distinct().count().toDouble
    require(n > 0, "trainLogReg: no documents with extractable features")
    var bias = 0.0
    var w = new Array[Double](buckets)
    (1 to rounds).foreach { _ =>
      val wDf = w.toIndexedSeq.zipWithIndex.collect {
        case (v, b) if v != 0.0 => (b.toLong, v)
      }.toDF("bucket", "wt")
      // per-doc margins compute ONCE per round: both gradient reads (the
      // per-bucket join and the bias sum) hit the cached frame — and the
      // aggregate itself is exchange-free (doc_id partitioning satisfies
      // the groupBy clustering)
      val z = hashed.join(broadcast(wDf), Seq("bucket"), "left")
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("cnt") * coalesce(col("wt"), lit(0.0))).as("s"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-(lit(bias) + col("s")))) - col("y")).as("err"))
        .cache()
      try {
        val grads = hashed.join(z, "doc_id")
          .groupBy(col("bucket")).agg(sum(col("err") * col("cnt")).as("g"))
          .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
        val g0 = z.agg(sum(col("err"))).head().getDouble(0)
        bias -= lr * g0 / n
        w = w.zipWithIndex.map { case (v, b) => v - lr * grads.getOrElse(b, 0.0) / n }
      } finally z.unpersist()
    }
    (bias, w)
  }

  /** Apply a trained model: (doc_id, quality_prob, predicted). Row-bounded
    * like training: one broadcast join + one per-doc aggregate. */
  def scoreLogReg(docs: DataFrame, id: Column, text: Column,
                  bias: Double, weights: Array[Double]): DataFrame = {
    val hashed = Dsir.hashedCounts(docs, id, text, lit(false), weights.length)
    scoreHashed(hashed, bias, weights)
  }

  private[graft] def scoreHashed(hashed: DataFrame,
                                 bias: Double, weights: Array[Double]): DataFrame = {
    val spark = hashed.sparkSession
    import spark.implicits._
    val wDf = weights.toIndexedSeq.zipWithIndex.collect {
      case (v, b) if v != 0.0 => (b.toLong, v)
    }.toDF("bucket", "wt")
    hashed.join(broadcast(wDf), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * coalesce(col("wt"), lit(0.0))).as("s"))
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-(lit(bias) + col("s"))))).as("quality_prob"))
      .withColumn("predicted", col("quality_prob") >= 0.5)
  }

  /** Train on `docs` and score the SAME docs — the corpus tokenizes and
    * hashes exactly once (shared cached feature frame) instead of once for
    * training and again for scoring. Output: (doc_id, quality_prob,
    * predicted), identical values to trainLogReg + scoreLogReg. */
  def trainAndScore(docs: DataFrame, id: Column, text: Column, label: Column,
                    buckets: Int = 1 << 16, rounds: Int = 3,
                    lr: Double = 0.5): DataFrame = {
    val hashed = hashedByDoc(docs, id, text, label, buckets)
    try {
      val (bias, w) = trainOnHashed(hashed, buckets, rounds, lr)
      // score from the cached frame, then materialize the NARROW verdict
      // frame (one (id, double, bool) row per doc — the minimal state that
      // lets the feature cache release). Build-time execution is inherent
      // to this operator either way: training is driver-coordinated, so
      // constructing the result already ran `rounds` collect jobs.
      scoreHashed(hashed.select(col("doc_id"), col("bucket"), col("cnt")),
        bias, w).localCheckpoint(true)
    } finally hashed.unpersist()
  }
}
