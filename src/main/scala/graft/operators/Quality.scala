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

  /** One-scan column profile: per column — null count, exact distinct
    * count, min/max (numeric & timestamp columns as doubles — timestamps
    * as epoch seconds — string columns as strings; engine-neutral
    * renderings, so the report oracle-replays). The "what am I even
    * looking at" pass on a new corpus; like [[run]], every column adds
    * aggregate expressions to ONE agg, never a job. Exact distincts are
    * the honest default at profile time; swap mentally to
    * approx_count_distinct when profiling hundreds of columns at 100 TB
    * (documented in SCALING.md). */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
              approxDistinct: Boolean = false): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"profile: column(s) ${missing.mkString(", ")} not in the frame " +
      s"(has: ${df.columns.mkString(", ")})")
    // the SCALING.md swap: exact distincts cost one Expand multiplier per
    // column; at hundreds of columns over 100 TB, HLL sketches instead
    def distinctAgg(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c)) else countDistinct(col(c))
    val numTypes: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.FloatType, org.apache.spark.sql.types.DoubleType)
    val schema = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def minMax(c: String): (Column, Column, Column, Column) = schema(c) match {
      case t if numTypes(t) =>
        (round(min(col(c)).cast("double"), 6), round(max(col(c)).cast("double"), 6),
          lit(null).cast("string"), lit(null).cast("string"))
      case org.apache.spark.sql.types.TimestampType =>
        (min(unix_timestamp(col(c))).cast("double"),
          max(unix_timestamp(col(c))).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
      case org.apache.spark.sql.types.StringType =>
        (lit(null).cast("double"), lit(null).cast("double"),
          min(col(c)), max(col(c)))
      case _ => // arrays/structs/binary: counts only
        (lit(null).cast("double"), lit(null).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
    }
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      val (mnN, mxN, mnS, mxS) = minMax(c)
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn$i"),
        distinctAgg(c).as(s"__nd$i"),
        mnN.as(s"__mnn$i"), mxN.as(s"__mxn$i"), mnS.as(s"__mns$i"), mxS.as(s"__mxs$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("column"), col("__n").as("n_rows"),
          col(s"__nn$i").as("n_nulls"), col(s"__nd$i").as("n_distinct"),
          col(s"__mnn$i").as("min_num"), col(s"__mxn$i").as("max_num"),
          col(s"__mns$i").as("min_str"), col(s"__mxs$i").as("max_str"))
      }: _*)).as("r"))
      .select(col("r.*"))
  }

  /** Population Stability Index between two frames' categorical
    * distributions — the standard "did the mix shift between snapshots /
    * increments" drift metric (PSI < 0.1 stable, 0.1–0.25 moderate,
    * > 0.25 major, the conventional bands). Per category:
    * (p_a − p_b) · ln(p_a / p_b) with `eps` floors so a category present
    * on one side only contributes finitely; `psi_total` repeats on every
    * row. Two |categories|-bounded aggregates + one tiny join; 6-dp
    * rounding → oracle-replayable. */
  def psiDrift(a: DataFrame, b: DataFrame, cat: Column,
               eps: Double = 1e-6): DataFrame = {
    def dist(df: DataFrame, side: String): DataFrame = {
      val c = df.select(cat.cast("string").as("category"))
        .groupBy(col("category")).agg(count(lit(1)).as(s"__c$side"))
      val totRow = c.agg(sum(col(s"__c$side"))).head()
      require(!totRow.isNullAt(0),
        s"psiDrift: the '$side' side is empty — PSI against an empty " +
        "distribution is undefined (gate on SizeBetween first)")
      val tot = totRow.getLong(0).toDouble
      c.withColumn(s"__p$side", col(s"__c$side") / lit(tot))
    }
    val joined = dist(a, "A").join(dist(b, "B"), Seq("category"), "full")
      .select(col("category"),
        greatest(coalesce(col("__pA"), lit(0.0)), lit(eps)).as("pa"),
        greatest(coalesce(col("__pB"), lit(0.0)), lit(eps)).as("pb"))
    val contrib = joined.select(col("category"),
      round(col("pa"), 6).as("p_a"), round(col("pb"), 6).as("p_b"),
      round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6).as("psi"))
    contrib.withColumn("psi_total",
      round(sum(col("psi")).over(), 6)) // |categories| rows — the window is fine
  }

  /** Schema contract gate: the frame must carry EXACTLY the expected
    * columns and types (order-insensitive; nullability ignored by default
    * — parquet round-trips routinely flip it). Fails loud with the full
    * diff: missing columns, unexpected extras, and type mismatches — the
    * zero-cost check (no data touched) every pipeline stage should run
    * before the data-level gates. */
  def expectSchema(df: DataFrame,
                   expected: org.apache.spark.sql.types.StructType,
                   checkNullability: Boolean = false): Unit = {
    val got = df.schema.fields.map(f => f.name -> f).toMap
    val want = expected.fields.map(f => f.name -> f).toMap
    val missing = want.keySet -- got.keySet
    val extra = got.keySet -- want.keySet
    val mismatched = (want.keySet & got.keySet).filter { n =>
      got(n).dataType != want(n).dataType ||
        (checkNullability && got(n).nullable != want(n).nullable)
    }
    val problems = Seq(
      if (missing.nonEmpty) Some(s"missing: ${missing.toSeq.sorted.mkString(", ")}") else None,
      if (extra.nonEmpty) Some(s"unexpected: ${extra.toSeq.sorted.mkString(", ")}") else None,
      if (mismatched.nonEmpty) Some("type mismatch: " + mismatched.toSeq.sorted.map(n =>
        s"$n (got ${got(n).dataType.simpleString}, want ${want(n).dataType.simpleString})")
        .mkString(", ")) else None).flatten
    require(problems.isEmpty, s"schema contract violated — ${problems.mkString("; ")}")
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
