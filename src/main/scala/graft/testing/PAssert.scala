package graft.testing

import org.apache.spark.sql.{DataFrame, Dataset}

/** In-pipeline assertion helpers (reference: SDK/testing/PAssert.java:357
  * `that`, :263 `containsInAnyOrder` — Beam ships these in the SDK proper,
  * not test scope, so pipeline authors can assert inside their own suites).
  * Spark-native: collect-and-compare with Seq-flavor/row normalization.
  * Windowed/pane variants (PAssert.inOnTimePane, :239) are expressed by
  * filtering the pane columns the trigger engine emits (timing/is_final)
  * before asserting.
  */
object PAssert {

  /** Normalize rows so ArraySeq/List/Row flavors compare equal. */
  def normalize(v: Any): Any = v match {
    case r: org.apache.spark.sql.Row => r.toSeq.map(normalize).toList
    case s: scala.collection.Seq[_]  => s.map(normalize).toList
    case other                       => other
  }

  private def canon(rows: Seq[Any]): Seq[String] =
    rows.map(r => normalize(r).toString).sorted

  /** containsInAnyOrder (reference: PAssert.java:263). Throws
    * AssertionError with both sides rendered on mismatch. */
  def containsInAnyOrder(df: DataFrame, expected: Seq[Seq[Any]]): Unit = {
    val got = canon(df.collect().toSeq)
    val exp = canon(expected)
    if (got != exp)
      throw new AssertionError(s"containsInAnyOrder failed\ngot:      $got\nexpected: $exp")
  }

  /** Typed variant over a Dataset. */
  def containsInAnyOrderT[T](ds: Dataset[T], expected: Seq[T]): Unit = {
    val got = canon(ds.collect().toSeq)
    val exp = canon(expected)
    if (got != exp)
      throw new AssertionError(s"containsInAnyOrder failed\ngot:      $got\nexpected: $exp")
  }

  /** that(...).empty() */
  def isEmpty(df: DataFrame): Unit = {
    val n = df.count()
    if (n != 0) throw new AssertionError(s"expected empty result, got $n rows")
  }

  /** that(...).satisfies(fn): arbitrary predicate over the collected bag. */
  def satisfies(df: DataFrame, check: Seq[Seq[Any]] => Boolean, hint: String = ""): Unit = {
    val rows = df.collect().toSeq.map(r => r.toSeq)
    if (!check(rows))
      throw new AssertionError(s"satisfies() failed $hint; rows: ${rows.take(20)}")
  }

  /** Window-scoped assertion (PAssert.inWindow, PAssert.java:215 analogue):
    * restrict to the panes of ONE window before comparing. Columns must
    * include `wstart`/`wend` (the Pane shape from graft.streaming.Triggers). */
  def inWindow(panes: DataFrame, windowStartMs: Long, windowEndMs: Long)(
      expected: Seq[Seq[Any]]): Unit = {
    import org.apache.spark.sql.functions.col
    containsInAnyOrder(
      panes.filter(col("wstart") === windowStartMs && col("wend") === windowEndMs),
      expected)
  }

  /** Pane-scoped assertion over a trigger-engine output
    * (PAssert.inOnTimePane :239 / inFinalPane :230 analogue): filter by
    * timing and/or finality, then compare. Columns must include
    * `timing` and `is_final` (the Pane shape from graft.streaming.Triggers). */
  def inPane(panes: DataFrame, timing: Option[String] = None,
             isFinal: Option[Boolean] = None)(expected: Seq[Seq[Any]]): Unit = {
    import org.apache.spark.sql.functions.col
    val filtered = Seq(
      timing.map(t => col("timing") === t),
      isFinal.map(f => col("is_final") === f)
    ).flatten.foldLeft(panes)((d, c) => d.filter(c))
    containsInAnyOrder(filtered, expected)
  }
}
