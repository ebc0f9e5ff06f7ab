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
  * Semantics note: docs with zero extracted features (empty/no-letter
  * text) have no feature rows — they neither vote during training nor
  * receive scores. Filter them beforehand if a verdict for every row is
  * needed.
  */
object Classifier {

  /** (bias, weights[buckets]) after `rounds` full-batch GD steps from zero
    * init: p = sigmoid(b + Σ c·w), gradient of mean log-loss. */
  def trainLogReg(docs: DataFrame, id: Column, text: Column, label: Column,
                  buckets: Int = 1 << 16, rounds: Int = 3,
                  lr: Double = 0.5): (Double, Array[Double]) = {
    require(rounds >= 1 && lr > 0 && buckets > 0,
      s"trainLogReg needs rounds>=1, lr>0, buckets>0 (got $rounds, $lr, $buckets)")
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = Dsir.hashedCounts(docs, id, text, label, buckets)
      .select(col("doc_id"), col("is_target").cast("double").as("y"),
        col("bucket"), col("cnt")).cache()
    val n = hashed.select(col("doc_id")).distinct().count().toDouble
    require(n > 0, "trainLogReg: no documents with extractable features")
    var bias = 0.0
    var w = new Array[Double](buckets)
    (1 to rounds).foreach { _ =>
      val wDf = w.toIndexedSeq.zipWithIndex.collect {
        case (v, b) if v != 0.0 => (b.toLong, v)
      }.toDF("bucket", "wt")
      // per-doc margins compute ONCE per round: both gradient reads (the
      // per-bucket join and the bias sum) hit the cached frame — without
      // this, the bias job recomputed the whole broadcast-join + per-doc
      // aggregate a second time (~2x redundant work per round, the r13
      // bench's single most expensive redundancy)
      val z = hashed.join(broadcast(wDf), Seq("bucket"), "left")
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("cnt") * coalesce(col("wt"), lit(0.0))).as("s"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-(lit(bias) + col("s")))) - col("y")).as("err"))
        .cache()
      val grads = hashed.join(z, "doc_id")
        .groupBy(col("bucket")).agg(sum(col("err") * col("cnt")).as("g"))
        .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
      val g0 = z.agg(sum(col("err"))).head().getDouble(0)
      z.unpersist()
      bias -= lr * g0 / n
      w = w.zipWithIndex.map { case (v, b) => v - lr * grads.getOrElse(b, 0.0) / n }
    }
    hashed.unpersist()
    (bias, w)
  }

  /** Apply a trained model: (doc_id, quality_prob, predicted). Row-bounded
    * like training: one broadcast join + one per-doc aggregate. */
  def scoreLogReg(docs: DataFrame, id: Column, text: Column,
                  bias: Double, weights: Array[Double]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val buckets = weights.length
    val hashed = Dsir.hashedCounts(docs, id, text, lit(false), buckets)
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
}
