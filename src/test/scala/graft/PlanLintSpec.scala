package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.PlanLint

/** PlanLint catches each scale-fatal shape AND stays quiet on the
  * library's own plans (both directions pinned — a linter that cries wolf
  * on every catalog query is as useless as one that misses funnels). */
class PlanLintSpec extends SparkSpec {

  import spark.implicits._

  private lazy val a = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
  private lazy val b = (0L until 50L).map(i => (i, i * 2)).toDF("id2", "w")

  /** Force the genuinely-cartesian plan (small frames broadcast otherwise). */
  private def withoutAutoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("flags a cartesian product as error") {
    withoutAutoBroadcast {
      val f = PlanLint.lint(a.crossJoin(b))
      assert(f.exists(x => x.severity == "error" && x.node == "CartesianProduct"), f.toString)
    }
  }

  test("flags an unpartitioned window as error") {
    val f = PlanLint.lint(a.withColumn("rn",
      row_number().over(Window.orderBy(col("id")))))
    assert(f.exists(x => x.severity == "error" && x.message.contains("PARTITION BY")),
      f.toString)
  }

  test("flags repartition(1) as error; keyed repartition is clean") {
    val f1 = PlanLint.lint(a.repartition(1).select(sum(col("id"))))
    assert(f1.exists(x => x.severity == "error" && x.message.contains("single partition")),
      f1.toString)
    assert(!PlanLint.lint(a.repartition(8, col("id"))).exists(_.severity == "error"))
  }

  test("warns on global sort without limit; TakeOrdered (limit) is clean") {
    val f = PlanLint.lint(a.orderBy(col("v")))
    assert(f.exists(x => x.severity == "warn" && x.message.contains("global sort")),
      f.toString)
    assert(PlanLint.lint(a.orderBy(col("v")).limit(5)).isEmpty)
  }

  test("info on collect_list; error-free") {
    val f = PlanLint.lint(a.groupBy(col("v")).agg(collect_list(col("id"))))
    assert(f.exists(x => x.severity == "info" && x.message.contains("unbounded")),
      f.toString)
    assert(!f.exists(_.severity == "error"))
  }

  test("assertScalable throws on a funnel, passes a clean aggregation") {
    val e = intercept[IllegalArgumentException] {
      withoutAutoBroadcast { PlanLint.assertScalable(a.crossJoin(b)) }
    }
    assert(e.getMessage.contains("CartesianProduct"))
    PlanLint.assertScalable(a.groupBy(col("v")).agg(sum(col("id"))))
  }

  test("catalog spot-check: core scale-audited queries lint with zero errors") {
    val dir = "/root/testdata/sf0.001"
    // queries whose plans PlanShapeSpec already pins as scale-clean must
    // also lint clean — the linter and the pins agree
    Seq("q1_agg", "q_top_per_key", "q_latest_per_key", "q_dedup_minhash",
        "q_broadcast_join", "q_tpch_q3", "q_tpch_q5", "q_domain_mix",
        "q_key_skew", "q_corpus_diff", "q_rand_proj").foreach { q =>
      val errors = PlanLint.lint(SparkEntry.queries(q)(spark, dir))
        .filter(_.severity == "error")
      assert(errors.isEmpty, s"$q: $errors")
    }
  }
}
