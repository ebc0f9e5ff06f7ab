package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix curation: the sampling ops a pretraining pipeline runs
  * after dedup/quality-scoring to compose the final data mixture. The
  * reference samples globally only (SDK/transforms/Sample.java:240
  * FixedSizedSampleFn); these run the same reservoir machinery per
  * stratum, plus a deterministic proportional thinning — both shapes a
  * 100 TB mixture job needs (exact per-language quotas; weighted blends).
  */
object Curation {

  /** The sampling/packing paths encode ids as Long; a silent cast("long")
    * of a string/UUID id would null every id out (phantom id 0 in the
    * reservoir's primitive encoder, or a mid-job null-field crash in the
    * packing scan). Fail loudly at call time instead — derive a surrogate
    * (e.g. xxhash64) for non-numeric keys. Mirrors the ANN ops' guard
    * (Similarity.requireIntegralId). */
  private def requireIntegralId(df: DataFrame, id: Column): Unit =
    Guards.requireIntegralId(df, id, "curation id")

  /** Exact-size per-stratum sample: exactly min(n, |stratum|) ids per
    * stratum, deterministic for a seed regardless of partitioning (the
    * reservoir's stable 64-bit hash priorities, ReservoirSampleFn). One
    * HashAggregate whose accumulator holds ≤ n ids per stratum per
    * partition — at 100 TB the shuffle carries ≤ n·partitions rows per
    * stratum, never the corpus. Output: the strata columns +
    * `sample_id`. */
  def stratifiedFixedSize(df: DataFrame, strata: Seq[Column], id: Column,
                          n: Int, seed: Long): DataFrame = {
    requireIntegralId(df, id)
    val s = df.sparkSession
    import s.implicits._
    val sampler = udaf(
      new graft.functions.ReservoirSampleFn[Long](n, seed).asAggregator,
      org.apache.spark.sql.Encoders.scalaLong)
    val grouped = df.groupBy(strata: _*)
      .agg(sampler(id.cast("long")).as("__sample"))
    val keep = grouped.columns.filter(_ != "__sample").map(col)
    grouped.select(keep :+ explode(col("__sample")).as("sample_id"): _*)
  }

  /** Sequence packing: assign documents to training bins of at most
    * `capacity` tokens (greedy next-fit in doc-id order). Packing is a
    * sequential scan, so the corpus is hash-split into `numGroups`
    * independent streams first — each group packs alone, bins never cross
    * groups, and the result is deterministic for a seed regardless of
    * partitioning (one shuffle on the group key; the per-partition scan
    * is O(rows), no buffering). A document larger than `capacity` gets a
    * singleton bin. At 100 TB, pick numGroups ≈ executor-core count ×
    * a few: each group is an independent sequential pack, so parallelism
    * = numGroups while every bin except a group's last stays
    * greedily tight. Output: (doc, group, bin, tok). */
  def packTokens(df: DataFrame, id: Column, tokens: Column, capacity: Long,
                 numGroups: Int, seed: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(numGroups > 0, "numGroups must be positive")
    requireIntegralId(df, id)
    val s = df.sparkSession
    import s.implicits._
    df.select(
        pmod(xxhash64(id, lit(seed)), lit(numGroups.toLong)).as("group"),
        id.cast("long").as("doc"), tokens.cast("long").as("tok"))
      .as[(Long, Long, Long)]
      .repartition(col("group"))
      .sortWithinPartitions(col("group"), col("doc"))
      .mapPartitions { it =>
        // several groups may share a partition; the accumulator resets on
        // every group change, so each group's packing is self-contained
        var curGroup = Long.MinValue
        var bin = 0L
        var used = 0L
        it.map { case (g, d, t) =>
          if (g != curGroup) { curGroup = g; bin = 0L; used = 0L }
          if (used > 0 && used + t > capacity) { bin += 1; used = 0L }
          used += t
          (d, g, bin, t)
        }
      }
      .toDF("doc", "group", "bin", "tok")
  }

  /** Packed TRAINING SEQUENCES — the artifact trainers actually load:
    * [[packTokens]]'s bin assignment joined back to each doc's encoded
    * `input_ids` ([[graft.operators.Bpe.encode]]'s output shape), every
    * (group, bin) emitting ONE concatenated id sequence plus the
    * document-boundary spans (doc_id, start, len) an attention mask /
    * loss mask is built from. Docs concatenate in ascending doc_id — the
    * same order the packer filled the bin, so spans are contiguous
    * prefix-sum offsets by construction.
    *
    * 100 TB shape: the per-bin collect is bounded by `capacity` TOKENS
    * (the one place a collect_list is genuinely capacity-bounded — an
    * oversize single doc still lands alone in its own bin, flagged by
    * the overflow column); the span walk is a row-local fold over the
    * bin's ≤capacity contents. */
  def packSequences(enc: DataFrame, capacity: Long, numGroups: Int,
                    seed: Long): DataFrame = {
    require(Seq("doc_id", "input_ids", "n_tokens").forall(enc.columns.contains),
      s"packSequences expects Bpe.encode's (doc_id, input_ids, n_tokens) " +
      s"shape, got ${enc.columns.toSeq}")
    val packed = packTokens(enc, col("doc_id"), col("n_tokens"), capacity,
      numGroups, seed)
    packed.join(enc, packed("doc") === enc("doc_id"))
      .groupBy(col("group"), col("bin"))
      .agg(sort_array(collect_list(struct(col("doc").as("doc_id"),
        col("input_ids"), col("tok")))).as("__docs"))
      .select(col("group"), col("bin"),
        flatten(transform(col("__docs"), d => d.getField("input_ids")))
          .as("input_ids"),
        // spans via a row-local prefix-sum fold over the bin's docs
        expr("""aggregate(__docs,
                 struct(CAST(0 AS BIGINT) AS off,
                        CAST(array() AS array<struct<doc_id: bigint, start: bigint, len: bigint>>) AS spans),
                 (acc, d) -> struct(acc.off + d.tok AS off,
                   array_append(acc.spans,
                     named_struct('doc_id', d.doc_id, 'start', acc.off,
                                  'len', d.tok)) AS spans),
                 acc -> acc.spans)""").as("spans"),
        aggregate(col("__docs"), lit(0L), (a, d) => a + d.getField("tok"))
          .as("n_tokens"),
        (aggregate(col("__docs"), lit(0L), (a, d) => a + d.getField("tok"))
          > capacity).as("overflow"))
  }

  /** Weighted sample WITHOUT replacement (Efraimidis–Spirakis A-ES): keep
    * the n rows with the largest priority ln(u)/w, where u ∈ (0,1) derives
    * from xxhash64(id, seed) — inclusion probability proportional to
    * `weight` (token counts, so a mixture samples long documents at their
    * token share rather than their document share). One bounded
    * TakeOrderedAndProject pass: per-partition top-n heaps + a driver
    * merge of n·partitions candidates — never a full sort, never the
    * corpus on one node. Deterministic for a (seed, id-set) regardless of
    * partitioning. Rows with weight ≤ 0 are dropped (never sampled).
    *
    * The seed is hashed as a second xxhash64 input — full 64-bit mixing,
    * the same scheme as stratifiedFractions/packTokens (an affine mod-p
    * fold of the seed only shifts every hash by a constant and barely
    * reorders). ln() is engine-varying, so the oracle gates this by
    * CONTRACT (size/distinct/weight-bias) rather than value replay — same
    * policy as the reservoir. */
  def weightedSample(df: DataFrame, id: Column, weight: Column, n: Int,
                     seed: Long = 42L): DataFrame = {
    requireIntegralId(df, id)
    require(n > 0, s"sample size must be positive, got $n")
    val m = 1L << 53 // u on the double-exact integer grid, u ∈ (0, 1)
    val u = (pmod(xxhash64(id, lit(seed)), lit(m)) + lit(1L)).cast("double") /
      lit((m + 2).toDouble)
    df.filter(weight > 0)
      .withColumn("__wpri", log(u) / weight.cast("double"))
      .orderBy(col("__wpri").desc, id.asc)
      .limit(n)
      .drop("__wpri")
  }

  /** Deterministic global training shuffle: every LLM data pipeline's last
    * step is a reproducible random permutation of the corpus into N output
    * shards. Each row gets (shard, sort_key) from an engine-neutral seeded
    * hash — no RNG state, stable under retries, and an independent engine
    * can replay the exact layout (the md5 scheme the DSIR/ANN oracles use:
    * DuckDB spells it CAST('0x' || substr(md5(...),1,15) AS BIGINT)).
    * Write with [[writeShuffled]]: `repartition(shard)` +
    * `sortWithinPartitions(sort_key)` — one shuffle, each task writes one
    * shard, no global sort. Collision note: sort_key ties (60-bit space)
    * break by id in the writer, so the layout stays total-ordered. */
  def shuffleKeys(df: DataFrame, id: Column, shards: Int,
                  seed: Long = 42L): DataFrame = {
    requireIntegralId(df, id)
    require(shards > 0, s"shards must be positive, got $shards")
    val h = conv(substring(md5(
      concat(lit(s"shuf:$seed:"), id.cast("string"))), 1, 15), 16, 10).cast("long")
    df.withColumn("sort_key", h)
      .withColumn("shard", pmod(col("sort_key"), lit(shards.toLong)).cast("int"))
  }

  /** Materialize the deterministic shuffle: one shuffle to co-locate each
    * shard, in-task sort by (sort_key, id), one parquet directory per
    * shard via partitionBy. Returns the written row count. */
  def writeShuffled(df: DataFrame, id: Column, shards: Int, dir: String,
                    seed: Long = 42L): Long = {
    val keyed = shuffleKeys(df, id, shards, seed)
    keyed.repartition(shards, col("shard"))
      .sortWithinPartitions(col("sort_key"), id)
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    keyed.sparkSession.read.parquet(dir).count()
  }

  /** Deterministic per-stratum Bernoulli thinning for mixture WEIGHTS:
    * keep a row iff xxhash64(id, seed) lands below its stratum's fraction
    * of the hash space. Reproducible run-to-run and engine-neutral (no
    * RNG state to schedule), pure codegen, zero shuffle. Strata missing
    * from `fractions` — and rows whose stratum is NULL, which no string
    * key can match — get `defaultFraction` (0 = dropped, the safe default
    * for a mixture job; pass 1.0 to keep unknown strata whole). */
  def stratifiedFractions(df: DataFrame, stratum: Column, id: Column,
                          fractions: Map[String, Double],
                          seed: Long, defaultFraction: Double = 0.0): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    require(defaultFraction >= 0.0 && defaultFraction <= 1.0,
      "defaultFraction must be in [0, 1]")
    val space = 1L << 40 // low 40 bits of the hash: uniform, exact at double precision
    // fold base = defaultFraction: a null stratum nulls every `===` test, so
    // the when-chain falls through to the base for both unknown and null keys
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(stratum === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(id, lit(seed)), lit(space)).cast("double") <
      frac * lit(space.toDouble))
  }
}
