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
  * rounds. r18 shape (guide §1.2 "fix the distributed algorithm first"):
  * features live as per-doc ARRAYS (bkts, cnts) — one cached row per doc,
  * never exploded at rest — so the per-doc margin is a row-local codegen'd
  * dot against the weight vector riding as a plain double[] reference
  * (no per-round broadcast join, no groupBy(doc_id)
  * re-aggregation), and the whole gradient round is a single codegen'd
  * pass: explode the zipped arrays with a virtual bucket −1 element
  * prepended per doc (the bias gradient and the doc count ride the same
  * rollup), partial-aggregate map-side to ≤ buckets+1 rows per partition,
  * collect. One job and ONE scan of the cached frame per round, vs the
  * previous shape's two jobs + three scans (margin aggregate, margin
  * cache, per-bucket gradient JOIN of the corpus-sized exploded frame).
  *
  * Plan shape (the 100 TB argument): driver state stays ≤ buckets doubles
  * however many documents train; per-round shuffle bytes are ≤ buckets+1
  * rows per partition (map-side combined); nothing per-doc is broadcast or
  * collected; the cached feature frame holds each doc's distinct-ngram
  * buckets exactly once (smaller than the old exploded form, which
  * duplicated doc_id and y per feature row).
  *
  * Semantics note: docs with zero extracted features (empty/no-letter
  * text) have no feature row — they neither vote during training nor
  * receive scores (same contract as the exploded formulation: the oracle's
  * replay derives its doc set from the feature table). Filter them
  * beforehand if a verdict for every row is needed.
  */
object Classifier {

  /** Per-doc hashed feature arrays: (doc_id, y, bkts, cnts), aligned
    * arrays over the doc's DISTINCT ngrams (collisions into one bucket
    * stay as separate entries — every consumer sums Σ cnt·f(bucket), which
    * distributes over the split), cached. Callers running train AND score
    * over the same docs should build this once ([[trainAndScore]]) — the
    * corpus tokenizes a single time. Caller unpersists. */
  private[graft] def hashedByDoc(docs: DataFrame, id: Column, text: Column,
                                 label: Column, buckets: Int): DataFrame =
    docs.select(id.cast("long").as("doc_id"),
        label.cast("double").as("y"),
        graft.expressions.TextExpressions
          .hashedNgramBuckets(lower(text), buckets).as("__h"))
      .select(col("doc_id"), col("y"),
        col("__h.bkts").as("bkts"), col("__h.cnts").as("cnts"))
      .filter(size(col("bkts")) > 0)
      .cache()

  /** Row-local margin Σ c·w over the doc's feature arrays; `w` rides as a
    * plain double[] codegen reference inside the [[graft.expressions.WeightedBucketDot]]
    * kernel (one tight JVM loop per doc — never an interpreted HOF, never
    * a per-round broadcast join). */
  private def marginExpr(w: Array[Double]): Column =
    graft.expressions.TextExpressions
      .weightedBucketDot(col("bkts"), col("cnts"), w)

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
    // ONE collect per round carries all three statistics: per-bucket
    // gradients, the bias gradient (bucket −1: contrib = err·1 per doc),
    // and the doc count n (count(1) of bucket −1 — the frame is one row
    // per doc by construction). Per-bucket addend SETS are identical to
    // the exploded-join formulation; only the accumulation order moves,
    // which was already task-completion-nondeterministic — the float-noise
    // class the 6-dp output rounding absorbs.
    var n = -1.0
    var bias = 0.0
    var w = new Array[Double](buckets)
    (1 to rounds).foreach { _ =>
      val err = (lit(1.0) / (lit(1.0) + exp(-(lit(bias) + marginExpr(w))))
        - col("y")).as("err")
      val rows = hashed.select(err,
          explode(concat(
            array(struct(lit(-1L).as("bkts"), lit(1L).as("cnts"))),
            arrays_zip(col("bkts"), col("cnts")))).as("e"))
        .groupBy(col("e.bkts").as("bucket"))
        .agg(sum(col("err") * col("e.cnts")).as("g"), count(lit(1)).as("rows"))
        .collect()
      val grads = rows.map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
      if (n < 0) n = rows.collectFirst {
        case r if r.getLong(0) == -1L => r.getLong(2)
      }.getOrElse(0L).toDouble
      require(n > 0, "trainLogReg: no documents with extractable features")
      bias -= lr * grads.getOrElse(-1, 0.0) / n
      w = w.zipWithIndex.map { case (v, b) => v - lr * grads.getOrElse(b, 0.0) / n }
    }
    (bias, w)
  }

  /** Apply a trained model: (doc_id, quality_prob, predicted). Row-local:
    * one codegen'd pass, zero shuffles. */
  def scoreLogReg(docs: DataFrame, id: Column, text: Column,
                  bias: Double, weights: Array[Double]): DataFrame = {
    val hashed = hashedByDoc(docs, id, text, lit(false), weights.length)
    try scoreHashed(hashed, bias, weights).localCheckpoint(true)
    finally hashed.unpersist()
  }

  private[graft] def scoreHashed(hashed: DataFrame,
                                 bias: Double, weights: Array[Double]): DataFrame =
    hashed.select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-(lit(bias) + marginExpr(weights)))))
          .as("quality_prob"))
      .withColumn("predicted", col("quality_prob") >= 0.5)

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
      scoreHashed(hashed, bias, w).localCheckpoint(true)
    } finally hashed.unpersist()
  }
}
