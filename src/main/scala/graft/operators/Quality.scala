package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks, computed in ONE scan — the
  * Deequ-style contract gate a pipeline runs between stages ("doc_id
  * unique, text ≥99.9% non-null, lang ∈ {…}, n_chars ∈ [0, 10M]") without
  * paying one job per assertion. Every check compiles to aggregate
  * expressions folded into a single `agg(...)` pass (count-distincts
  * included — Catalyst plans them through one Expand over the same scan),
  * then the 1-row result explodes into a (check, column, metric, ok)
  * report frame.
  *
  * 100 TB story: cost = one full scan + one tiny aggregate regardless of
  * how many checks run; adding a check adds a column to the agg, not a
  * job. Metrics are exact (no sampling) and the report is deterministic
  * (6-dp ratios), so it oracle-replays.
  */
object Quality {

  sealed trait Check {
    def name: String
    def column: String
    /** The metric aggregate (computed over the single pass). */
    private[operators] def metric(n: Column): Column
    /** Pass/fail from the metric value. */
    private[operators] def ok(metric: Column): Column
  }

  /** Fraction of non-null values ≥ minRatio. */
  final case class NotNull(column: String, minRatio: Double = 1.0) extends Check {
    val name = "not_null"
    private[operators] def metric(n: Column): Column =
      round(count(col(column)).cast("double") / n, 6)
    private[operators] def ok(m: Column): Column = m >= minRatio
  }

  /** Column is a key: exact distinct count == non-null count. */
  final case class Unique(column: String) extends Check {
    val name = "unique"
    private[operators] def metric(n: Column): Column =
      (count(col(column)) - countDistinct(col(column))).cast("double")
    private[operators] def ok(m: Column): Column = m === 0.0
  }

  /** Every non-null value within [lo, hi]. Metric = violation count. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = "in_range"
    private[operators] def metric(n: Column): Column =
      sum(when(col(column).isNotNull &&
        (col(column) < lo || col(column) > hi), 1L).otherwise(0L)).cast("double")
    private[operators] def ok(m: Column): Column = m === 0.0
  }

  /** Every non-null value in the allowed set. Metric = violation count. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    val name = "in_set"
    private[operators] def metric(n: Column): Column =
      sum(when(col(column).isNotNull &&
        !col(column).isin(values: _*), 1L).otherwise(0L)).cast("double")
    private[operators] def ok(m: Column): Column = m === 0.0
  }

  /** Fraction of non-null values matching the regex ≥ minRatio. */
  final case class MatchesRegex(column: String, re: String,
                                minRatio: Double = 1.0) extends Check {
    val name = "matches_regex"
    private[operators] def metric(n: Column): Column =
      round(sum(when(col(column).rlike(re), 1L).otherwise(0L)).cast("double") /
        greatest(count(col(column)), lit(1L)), 6)
    private[operators] def ok(m: Column): Column = m >= minRatio
  }

  /** Row count within [lo, hi] (hi = Long.MaxValue for a floor-only). */
  final case class SizeBetween(lo: Long, hi: Long = Long.MaxValue) extends Check {
    val name = "size_between"
    val column = "*"
    private[operators] def metric(n: Column): Column = n
    private[operators] def ok(m: Column): Column = m >= lo && m <= hi
  }

  /** Run all checks in one scan → (check, column, metric, ok), one row
    * per check, in the given order. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Quality.run needs at least one check")
    val n = count(lit(1)).cast("double")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.metric(n).as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val report = array(checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        col(s"__m$i").cast("double").as("metric"),
        c.ok(col(s"__m$i")).as("ok"))
    }: _*)
    one.select(explode(report).as("r"))
      .select(col("r.check").as("check"), col("r.column").as("column"),
        col("r.metric").as("metric"), col("r.ok").as("ok"))
  }

  /** Fail loud (naming every violated check) unless all checks pass —
    * the pipeline-gate form. */
  def assertAll(df: DataFrame, checks: Seq[Check]): Unit = {
    val bad = run(df, checks).filter(!col("ok")).collect()
    require(bad.isEmpty,
      s"${bad.length} data-quality check(s) failed:\n" +
        bad.map(r => s"  ${r.getString(0)}(${r.getString(1)}): metric=${r.getDouble(2)}")
          .mkString("\n"))
  }
}
