package graft

import graft.plans.PlanLint

/** The closing invariant: NO query in the entire catalog plans a
  * scale-fatal shape. Every entry builds against sf0.001 fixtures and
  * must lint with zero `error`-level findings — the PlanShapeSpec pins
  * check specific queries deeply; this sweeps all of them shallowly, so
  * a new catalog entry can never quietly ship a cartesian product, a
  * raw-row single-partition window, or a repartition(1) funnel. */
class CatalogLintSpec extends SparkSpec {

  test("all catalog queries lint with zero scale-fatal findings") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val errs = PlanLint.lint(SparkEntry.queries(q)(spark, dir))
        .filter(_.severity == "error")
      if (errs.nonEmpty) Some(q -> errs) else None
    }
    assert(bad.isEmpty, bad.map { case (q, e) =>
      s"$q:\n  ${e.mkString("\n  ")}" }.mkString("\n"))
  }
}
