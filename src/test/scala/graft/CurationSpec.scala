package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Laws for the training-mix curation ops: exact per-stratum sample sizes,
  * partitioning-independent determinism, and the hash-thinning subset /
  * monotonicity properties (reference sampling contract:
  * SDK/transforms/Sample.java:240 FixedSizedSampleFn — here run per
  * stratum rather than globally). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 900L).map { i =>
    val lang = i % 3 match { case 0 => "en"; case 1 => "fr"; case _ => "zh" }
    (i, lang)
  }.toDF("id", "lang")

  test("stratifiedFixedSize: exactly min(n, |stratum|) distinct members per stratum") {
    val tiny = corpus.filter(col("lang") =!= "zh" || col("id") <= 30) // zh stratum: 10 rows
    val out = Curation.stratifiedFixedSize(tiny, Seq(col("lang")), col("id"), n = 50, seed = 1L)
    val sizes = out.groupBy("lang").agg(
      count(lit(1)).as("n"), countDistinct(col("sample_id")).as("nd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sizes("en") == ((50L, 50L)) && sizes("fr") == ((50L, 50L)))
    assert(sizes("zh") == ((10L, 10L)))
    // membership: every sampled id carries its own stratum's label
    val bad = out.join(tiny.withColumnRenamed("id", "sample_id"), Seq("lang", "sample_id"), "left_anti")
    assert(bad.count() == 0)
  }

  test("stratifiedFixedSize: seed-deterministic regardless of partitioning") {
    def run(parts: Int) =
      Curation.stratifiedFixedSize(corpus.repartition(parts), Seq(col("lang")),
          col("id"), n = 25, seed = 42L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(1) == run(13))
    // and a different seed draws a different sample
    val other = Curation.stratifiedFixedSize(corpus, Seq(col("lang")), col("id"),
      n = 25, seed = 43L).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(1) != other)
  }

  test("stratifiedFractions: exact at 0 and 1, absent strata dropped, deterministic") {
    val fr = Map("en" -> 1.0, "fr" -> 0.0) // zh absent -> dropped
    val kept = Curation.stratifiedFractions(corpus, col("lang"), col("id"), fr, seed = 5L)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("en", 0L) == 300L)
    assert(!byLang.contains("fr") && !byLang.contains("zh"))
    // run-to-run determinism (no RNG state): identical kept set
    val again = Curation.stratifiedFractions(corpus.repartition(7), col("lang"),
      col("id"), fr, seed = 5L)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("stratifiedFractions: kept sets are monotone in the fraction") {
    def keptIds(f: Double) = Curation.stratifiedFractions(corpus, col("lang"),
        col("id"), Map("en" -> f, "fr" -> f, "zh" -> f), seed = 9L)
      .select("id").collect().map(_.getLong(0)).toSet
    val (a, b, c) = (keptIds(0.2), keptIds(0.5), keptIds(0.9))
    assert(a.subsetOf(b) && b.subsetOf(c))
    // rates land near the fractions (5σ band at n=300 per stratum)
    assert(math.abs(b.size / 900.0 - 0.5) < 5 * math.sqrt(0.25 / 900) + 2 / 900.0)
  }

  test("stratifiedFractions: null strata follow defaultFraction (dropped unless told otherwise)") {
    val withNulls = Seq((1L, "en"), (2L, null), (3L, null), (4L, "fr"))
      .toDF("id", "lang")
    val fr = Map("en" -> 1.0, "fr" -> 1.0)
    // default: null-stratum rows are dropped, like any unknown stratum
    val dropped = Curation.stratifiedFractions(withNulls, col("lang"), col("id"), fr, 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(dropped == Set(1L, 4L))
    // defaultFraction=1.0 keeps null/unknown strata whole
    val kept = Curation.stratifiedFractions(withNulls, col("lang"), col("id"), fr, 3L,
        defaultFraction = 1.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("stratifiedFractions: rejects fractions outside [0, 1]") {
    intercept[IllegalArgumentException] {
      Curation.stratifiedFractions(corpus, col("lang"), col("id"), Map("en" -> 1.5), 1L)
    }
  }

  test("non-integral id columns fail loudly instead of nulling out") {
    val stringIds = Seq(("doc-1", "en", 10L)).toDF("id", "lang", "n_tok")
    intercept[IllegalArgumentException] {
      Curation.stratifiedFixedSize(stringIds, Seq(col("lang")), col("id"), 5, 1L)
    }
    intercept[IllegalArgumentException] {
      Curation.packTokens(stringIds, col("id"), col("n_tok"), 100L, 2, 1L)
    }
  }

  // ------------------------------------------------------------- packTokens

  private def tokenDocs = (1L to 400L).map(i => (i, 10L + (i * 37) % 90))
    .toDF("id", "n_tok")

  test("packTokens: every doc in exactly one bin, caps respected, bins dense") {
    val packed = Curation.packTokens(tokenDocs, col("id"), col("n_tok"),
      capacity = 200L, numGroups = 4, seed = 1L).cache()
    assert(packed.count() == 400L)
    assert(packed.select("doc").distinct().count() == 400L)
    val bins = packed.groupBy("group", "bin")
      .agg(sum("tok").as("t"), count(lit(1)).as("c"))
    assert(bins.filter(col("t") > 200 && col("c") > 1).count() == 0)
    // dense bin ids 0..max per group
    val dense = bins.groupBy("group")
      .agg((countDistinct(col("bin")) === max(col("bin")) + 1).as("ok"))
    assert(dense.filter(!col("ok")).count() == 0)
    packed.unpersist()
  }

  test("packTokens: greedy tightness — next bin's first doc would overflow") {
    val packed = Curation.packTokens(tokenDocs, col("id"), col("n_tok"),
      capacity = 200L, numGroups = 2, seed = 5L)
    val bins = packed.groupBy(col("group"), col("bin")).agg(
      sum(col("tok")).as("t"), min_by(col("tok"), col("doc")).as("first_tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("bin"))
    val loose = bins.withColumn("nf", lead(col("first_tok"), 1).over(w))
      .filter(col("nf").isNotNull && col("t") + col("nf") <= 200)
    assert(loose.count() == 0)
  }

  test("packTokens: deterministic regardless of input partitioning") {
    def run(parts: Int) = Curation.packTokens(tokenDocs.repartition(parts),
        col("id"), col("n_tok"), capacity = 150L, numGroups = 4, seed = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(11))
  }

  test("weightedSample: deterministic, exact size, drops non-positive weights") {
    val rows = (1L to 300L).map(i => (i, if (i % 50 == 0) 0L else 10L + i % 7)).toDF("id", "w")
    val s1 = Curation.weightedSample(rows, col("id"), col("w"), 40, seed = 9L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Curation.weightedSample(rows.repartition(7), col("id"), col("w"), 40, seed = 9L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2, "must be deterministic regardless of partitioning")
    assert(s1.size == 40 && s1.distinct.size == 40)
    assert(s1.forall(_ % 50 != 0), "zero-weight rows must never be sampled")
    val s3 = Curation.weightedSample(rows, col("id"), col("w"), 40, seed = 10L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 != s3, "different seeds must (generically) pick different samples")
  }

  test("weightedSample prefers heavy items across seeds (Efraimidis-Spirakis law)") {
    // one item carries ~90% of the total weight; in a size-5 sample of 105
    // items it should be present for nearly every seed
    val rows = ((1L to 104L).map(i => (i, 1L)) :+ (999L, 1000L)).toDF("id", "w")
    val hits = (1 to 20).count { seed =>
      Curation.weightedSample(rows, col("id"), col("w"), 5, seed = seed.toLong)
        .collect().exists(_.getLong(0) == 999L)
    }
    assert(hits >= 16, s"heavy item sampled in only $hits/20 seeds")
  }

  test("packTokens: an oversize doc gets a singleton bin without derailing the scan") {
    val docs = Seq((1L, 50L), (2L, 900L), (3L, 60L), (4L, 70L))
      .toDF("id", "n_tok")
    val packed = Curation.packTokens(docs, col("id"), col("n_tok"),
      capacity = 100L, numGroups = 1, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(packed(1L) == 0L)             // fits alone
    assert(packed(2L) == 1L)             // oversize -> own bin
    assert(packed(3L) == 2L && packed(4L) == 3L) // 60+70 > 100 -> split
  }

  test("packSequences: exact concatenation, prefix-sum spans, oversize flagged") {
    // numGroups = 1 → every doc in one group, bins fill in doc_id order
    val enc = Seq(
      (1L, Seq(10, 11, 12), 3L),
      (2L, Seq(20, 21), 2L),
      (3L, Seq(30, 31, 32, 33), 4L),       // 3+2 fit cap 5; doc 3 opens bin 1
      (4L, (100 to 107).map(identity), 8L) // oversize (8 > 5) → own bin, flagged
    ).toDF("doc_id", "input_ids", "n_tokens")
    val out = Curation.packSequences(enc, capacity = 5L, numGroups = 1, seed = 1L)
      .collect().map { r =>
        (r.getLong(1),
          r.getSeq[Int](2),
          r.getSeq[org.apache.spark.sql.Row](3)
            .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))),
          r.getLong(4), r.getBoolean(5))
      }.sortBy(_._1)
    assert(out.length == 3, out.mkString("; "))
    val (b0, b1, b2) = (out(0), out(1), out(2))
    assert(b0._2 == Seq(10, 11, 12, 20, 21) &&
      b0._3 == Seq((1L, 0L, 3L), (2L, 3L, 2L)) && b0._4 == 5L && !b0._5)
    assert(b1._2 == Seq(30, 31, 32, 33) &&
      b1._3 == Seq((3L, 0L, 4L)) && !b1._5)
    assert(b2._2 == (100 to 107).toSeq &&
      b2._3 == Seq((4L, 0L, 8L)) && b2._5, "oversize singleton must flag overflow")
    // shape guard
    val e = intercept[IllegalArgumentException] {
      Curation.packSequences(enc.drop("n_tokens"), 5L, 1, 1L)
    }
    assert(e.getMessage.contains("n_tokens"))
  }
}
