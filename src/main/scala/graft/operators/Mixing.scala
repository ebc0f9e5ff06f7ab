package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mixture-targeted corpus composition — the "data mixing" stage of a
  * training-data pipeline (the Pile / Dolma / RefinedWeb recipe): given
  * per-domain target weights and a total token budget, resample each
  * domain deterministically so the output token mass matches the target
  * mixture, UPSAMPLING scarce domains by whole epochs + a fractional
  * Bernoulli epoch and DOWNSAMPLING abundant ones by hash-fraction
  * thinning. Not in the reference (Beam has no corpus-composition
  * transform); first-class here because every LLM pretraining run needs
  * exactly this step between curation and sharding.
  *
  * Determinism: all randomness is xxhash64(id, seed) — stable under
  * retries, engine-neutral, identical run-to-run (the same discipline as
  * [[Curation.stratifiedFractions]]).
  *
  * 100 TB story: the only full-corpus work is ONE narrow (domain, tokens)
  * aggregate (map-side combined, output bounded by |domains|) and ONE
  * row-local apply pass; the per-domain rate table is collected (fail-loud
  * cap) and re-joined via broadcast, so the corpus never shuffles.
  */
object Mixing {

  /** Per-domain epoch plan: (domain, full_epochs, frac_epoch, target_tok).
    * `full_epochs` = whole copies of every domain doc; `frac_epoch` = the
    * probability each doc gets one more copy — together they achieve
    * `rate = target_tok / observed_tok` in expectation, exactly the
    * epoch-mixing construction used by Pile-style samplers.
    *
    * `maxDomains` caps the collected stats table (fail-loud, names the
    * fix); `maxEpochs` fail-louds on a weight/budget combination that
    * would repeat a tiny domain absurdly often (the standard guard against
    * a mis-typed weight melting the corpus). Domains absent from
    * `targetWeights` get rate 0 (dropped) — list them explicitly to keep
    * them. */
  def epochPlan(docs: DataFrame, domain: Column, tokens: Column,
                targetWeights: Map[String, Double], budgetTokens: Long,
                maxEpochs: Int = 64, maxDomains: Int = 100000): Seq[(String, Int, Double, Long)] = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(targetWeights.nonEmpty, "targetWeights must be non-empty")
    targetWeights.foreach { case (d, w) =>
      require(w >= 0.0, s"negative weight $w for domain '$d'") }
    val wsum = targetWeights.values.sum
    require(wsum > 0.0, "targetWeights must sum > 0")
    val stats = docs.select(domain.cast("string").as("__d"), tokens.cast("long").as("__t"))
      .groupBy(col("__d")).agg(sum(col("__t")).as("__m"))
      .limit(maxDomains + 1).collect()
    require(stats.length <= maxDomains,
      s"more than $maxDomains distinct domains — the collected rate table " +
      "would not be driver-bounded; coarsen the domain column or raise maxDomains")
    stats.toSeq.flatMap { r =>
      val d = r.getString(0)
      val m = r.getLong(1)
      val w = targetWeights.getOrElse(d, 0.0)
      if (w == 0.0 || m <= 0L) None
      else {
        val target = (w / wsum * budgetTokens).toLong
        val rate = target.toDouble / m.toDouble
        val full = math.floor(rate).toInt
        require(full <= maxEpochs,
          s"domain '$d' would be repeated $full× (target $target tok over " +
          s"$m observed) — exceeds maxEpochs=$maxEpochs; check the weight " +
          "or raise maxEpochs explicitly")
        Some((d, full, rate - full, target))
      }
    }
  }

  /** Apply an [[epochPlan]]: one row per (doc, epoch), `epoch` 1-based.
    * Row-local — copies = full_epochs + Bernoulli(frac_epoch) from
    * xxhash64(id, seed), then a posexplode of a `sequence`; docs with 0
    * copies vanish. The plan joins in via broadcast (≤ |domains| rows). */
  def applyPlan(docs: DataFrame, domain: Column, id: Column,
                plan: Seq[(String, Int, Double, Long)], seed: Long = 0L): DataFrame = {
    val reserved = Seq("__d", "__full", "__frac", "__copies", "epoch")
    reserved.filter(docs.columns.contains).foreach { c =>
      throw new IllegalArgumentException(
        s"applyPlan: input already has a column named '$c' (reserved: $reserved)")
    }
    val s = docs.sparkSession
    import s.implicits._
    val planDf = plan.map { case (d, f, fr, _) => (d, f, fr) }
      .toDF("__d", "__full", "__frac")
    val space = 1L << 40 // low 40 bits: uniform, exact at double precision
    val u = pmod(xxhash64(id, lit(seed)), lit(space)).cast("double") / lit(space.toDouble)
    docs.withColumn("__d", domain.cast("string"))
      .join(broadcast(planDf), Seq("__d"))
      .withColumn("__copies",
        col("__full") + when(u < col("__frac"), 1).otherwise(0))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__copies"))))
      .drop("__d", "__full", "__frac", "__copies")
  }

  /** One-call composition: plan + apply. Output = input columns + `epoch`. */
  def mixToWeights(docs: DataFrame, domain: Column, id: Column, tokens: Column,
                   targetWeights: Map[String, Double], budgetTokens: Long,
                   seed: Long = 0L, maxEpochs: Int = 64): DataFrame =
    applyPlan(docs, domain, id,
      epochPlan(docs, domain, tokens, targetWeights, budgetTokens, maxEpochs), seed)

  /** Deterministic train/val/test (or any N-way) split by hash threshold:
    * fractions partition the unit interval, a doc lands in the split whose
    * sub-interval contains xxhash64(id, seed)/2^40. Every doc gets EXACTLY
    * one split (total, disjoint — by construction of the interval
    * partition); reproducible run-to-run and append-stable (a doc's split
    * never changes when the corpus grows — the property per-split
    * `sample(fraction)` calls do NOT give you). Fractions must sum to 1
    * within 1e-9 (fail-loud). Row-local, zero shuffle. */
  def hashSplit(docs: DataFrame, id: Column, fractions: Seq[(String, Double)],
                seed: Long = 0L): DataFrame = {
    require(!docs.columns.contains("split"),
      "hashSplit: input already has a column named 'split'")
    require(fractions.nonEmpty, "fractions must be non-empty")
    fractions.foreach { case (n, f) =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f for split '$n' outside [0,1]") }
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val space = 1L << 40
    val u = pmod(xxhash64(id, lit(seed)), lit(space)).cast("double") / lit(space.toDouble)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    // last split takes the remainder of the interval so double rounding in
    // the cumulative sum can never drop a row
    val expr = fractions.init.zip(cum.init).reverse.foldLeft(
      lit(fractions.last._1)) { case (acc, ((name, _), hi)) =>
        when(u < lit(hi), lit(name)).otherwise(acc)
    }
    docs.withColumn("split", expr)
  }
}
