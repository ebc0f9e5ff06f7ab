package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.{Aggregates, Curation, Dsir}

/** Task-retry determinism (r12 verdict item 3). The seeded operators —
  * reservoir sampling, weighted A-ES sampling, DSIR's Gumbel resample,
  * sequentialIds, groupIntoBatches' ranged path, the z-order writer —
  * claim results that are deterministic under task RE-EXECUTION because
  * every random draw is an engine-bounded seeded hash of row identity,
  * never RNG state (a `rand()` would re-draw on retry and a lost task
  * could silently change the sample). Until now no test actually killed
  * a task. Each scenario here poisons one input partition with a
  * first-attempt-only failure (TaskContext.attemptNumber-gated throw),
  * lets the scheduler's task retry (maxFailures = 2 in the shared
  * session) recompute it, and asserts the result is IDENTICAL to the
  * unpoisoned run.
  *
  * Local mode runs tasks inside this JVM, so a static counter proves
  * each planted failure really fired — accumulator updates from failed
  * tasks are discarded by design, so an accumulator could not. */
object RetryDeterminismSpec {
  val fired = new AtomicInteger(0)
}

class RetryDeterminismSpec extends SparkSpec {
  import spark.implicits._

  /** Partition 1 throws on its first attempt — every job over the
    * poisoned frame replays the failure (fresh tasks start at attempt 0)
    * and every retry succeeds, so multi-job operators (range-partition
    * sampling, offset-table collection, the final pass) each exercise a
    * recomputation of the seeded map-side work. */
  private def poison(df: DataFrame): DataFrame = {
    val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 1 && tc.attemptNumber() == 0) {
        RetryDeterminismSpec.fired.incrementAndGet()
        throw new RuntimeException("planted first-attempt task failure")
      }
      it
    }(enc)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def duel(tag: String, input: DataFrame)(op: DataFrame => DataFrame): Unit = {
    val before = RetryDeterminismSpec.fired.get()
    val clean = canon(op(input))
    val retried = canon(op(poison(input)))
    assert(RetryDeterminismSpec.fired.get() > before,
      s"$tag: the planted failure never fired (poison not in the executed plan?)")
    assert(retried == clean, s"$tag: task retry changed the result")
  }

  private def docs = spark.range(2000).repartition(4).select(
    col("id").as("doc_id"),
    (pmod(col("id"), lit(7)) + 1).cast("double").as("w"),
    pmod(col("id"), lit(5)).as("stratum"),
    pmod(xxhash64(col("id")), lit(97)).cast("double").as("lw"))

  test("stratified reservoir sample is identical under a retried task") {
    duel("stratifiedFixedSize", docs)(d =>
      Curation.stratifiedFixedSize(d, Seq(col("stratum")), col("doc_id"), 11, seed = 7L))
  }

  test("weighted A-ES sample is identical under a retried task") {
    duel("weightedSample", docs)(d =>
      Curation.weightedSample(d, col("doc_id"), col("w"), 40, seed = 7L))
  }

  test("DSIR Gumbel resample is identical under a retried task") {
    duel("dsirResample", docs.select(col("doc_id"), col("lw").as("dsir_logw")))(d =>
      Dsir.resample(d, k = 25))
  }

  test("sequentialIds is identical under a retried task (range sampling + offset passes)") {
    duel("sequentialIds", docs)(d =>
      Aggregates.sequentialIds(d, Seq(col("w").desc, col("doc_id").asc)))
  }

  test("groupIntoBatches ranged path is identical under a retried task") {
    duel("groupIntoBatchesRanged", docs)(d =>
      Aggregates.groupIntoBatches(d, Seq(col("stratum")), col("doc_id"), 64,
        lowCardinality = Some(true)))
  }

  test("zorderWrite under a retried task: identical rows, still a valid z-clustered layout") {
    // NOTE file BOUNDARIES are deliberately not compared across the two
    // writes: repartitionByRange seeds its range-bound sample from the
    // RDD id, so two separate runs (clean vs poisoned) may legally split
    // the z-range at different points. The retry guarantee is (a) no row
    // lost/duplicated/changed by the replayed task + commit protocol, and
    // (b) the committed result is still a disjoint z-range-per-file
    // layout — asserted via per-file morton min/max non-overlap.
    import graft.sources.Layout
    import graft.expressions.LayoutExpressions
    val dir = java.nio.file.Files.createTempDirectory("graft-retry-z").toString
    val input = docs.withColumn("a", pmod(xxhash64(col("doc_id")), lit(1000)))
      .withColumn("b", pmod(xxhash64(col("doc_id"), lit(1)), lit(1000)))
    val before = RetryDeterminismSpec.fired.get()
    Layout.zorderWrite(input, col("a"), col("b"), s"$dir/clean", numFiles = 3)
    Layout.zorderWrite(poison(input), col("a"), col("b"), s"$dir/retried", numFiles = 3)
    assert(RetryDeterminismSpec.fired.get() > before, "planted failure never fired")
    def rows(path: String): Seq[String] =
      spark.read.parquet(path).collect().map(_.toSeq.toString).sorted.toSeq
    assert(rows(s"$dir/clean") == rows(s"$dir/retried"),
      "zorderWrite: retry changed the written rows")
    // z-range disjointness of the retried write. The codes must be
    // recomputed under the WRITER'S normalization grid — the data's actual
    // min/max per dimension, exactly as zorderWrite derives it — not an
    // assumed 0..999 grid: 2000 hashed draws over pmod(...,1000) miss the
    // exact endpoints with probability ~1-e^-2 per end, and a mismatched
    // grid reorders morton codes, turning genuinely-disjoint files into
    // apparent overlaps depending on where the RDD-id-seeded range sample
    // put the boundaries (a suite-order-dependent flake, seen once in a
    // full run).
    val scale = (1 << 16) - 1
    val bounds = input.agg(
      min(col("a")).cast("double"), max(col("a")).cast("double"),
      min(col("b")).cast("double"), max(col("b")).cast("double")).collect()(0)
    def norm(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      floor((c.cast("double") - lo) / (hi - lo) * scale).cast("long")
    val spans = spark.read.parquet(s"$dir/retried")
      .withColumn("__z", LayoutExpressions.mortonCode(
        norm(col("a"), bounds.getDouble(0), bounds.getDouble(1)),
        norm(col("b"), bounds.getDouble(2), bounds.getDouble(3)), 16))
      .withColumn("__f", input_file_name())
      .groupBy(col("__f")).agg(min(col("__z")).as("lo"), max(col("__z")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"retried z-order files overlap: $spans")
      case _ => ()
    }
  }
}
