package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality
import graft.operators.Quality._

/** One-scan declarative data-quality checks. */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 10.0, "click"),
    (2L, Some("b"), 20.0, "view"),
    (3L, None, -5.0, "click"),
    (3L, Some("d"), 999.0, "bogus") // dup id, out-of-set type
  ).toDF("id", "tag", "value", "typ")

  test("each check computes the exact metric and verdict") {
    val got = Quality.run(df, Seq(
      Unique("id"),                       // 1 dup → fail
      NotNull("tag", minRatio = 0.9),     // 3/4 = .75 → fail
      NotNull("tag", minRatio = 0.7),     // .75 → pass
      InRange("value", -10, 100),         // 999 → 1 violation → fail
      InSet("typ", Seq("click", "view")), // bogus → 1 violation → fail
      SizeBetween(4, 4)))                 // exactly 4 → pass
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("unique", "id", 1.0, false),
      ("not_null", "tag", 0.75, false),
      ("not_null", "tag", 0.75, true),
      ("in_range", "value", 1.0, false),
      ("in_set", "typ", 1.0, false),
      ("size_between", "*", 4.0, true)), got.mkString("; "))
  }

  test("matches_regex ratio over non-null values") {
    val got = Quality.run(df, Seq(MatchesRegex("tag", "^[ab]$", minRatio = 0.6)))
      .collect().head
    // a, b match of 3 non-null → 2/3 = 0.666667 ≥ 0.6
    assert(got.getDouble(2) == 0.666667 && got.getBoolean(3))
  }

  test("assertAll names every failed check; passes a clean spec") {
    val e = intercept[IllegalArgumentException] {
      Quality.assertAll(df, Seq(Unique("id"), SizeBetween(1)))
    }
    assert(e.getMessage.contains("unique(id)"), e.getMessage)
    Quality.assertAll(df, Seq(NotNull("id"), SizeBetween(1, 10)))
  }

  test("profile: per-column nulls/distincts/min-max, typed rendering, one scan") {
    val p = Quality.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(2) == 0 && p("id").getLong(3) == 3)       // 0 nulls, 3 distinct
    assert(p("id").getDouble(4) == 1.0 && p("id").getDouble(5) == 3.0)
    assert(p("tag").getLong(2) == 1 && p("tag").getLong(3) == 3)
    assert(p("tag").getString(6) == "a" && p("tag").getString(7) == "d")
    assert(p("value").getDouble(4) == -5.0 && p("value").getDouble(5) == 999.0)
    val plan = Quality.profile(df).queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1, plan.take(1500))
    // timestamp columns render as epoch seconds in the numeric slot
    val ts = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00")).toDF("t")
    val tp = Quality.profile(ts).collect().head
    assert(tp.getDouble(5) - tp.getDouble(4) == 86400.0, tp.toString)
    // approx mode: HLL distincts within the standard rel error on small n
    val ap = Quality.profile(df, approxDistinct = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ap("id") == 3L && ap("typ") == 3L, ap.toString)
  }

  test("expectSchema: exact-match passes; missing/extra/mismatched named in the diff") {
    import org.apache.spark.sql.types._
    val want = StructType(Seq(StructField("id", LongType),
      StructField("tag", StringType), StructField("value", DoubleType),
      StructField("typ", StringType)))
    Quality.expectSchema(df, want) // order-insensitive, nullability ignored
    val e = intercept[IllegalArgumentException] {
      Quality.expectSchema(df.drop("tag").withColumn("rogue", lit(1)),
        StructType(want.fields.map(f =>
          if (f.name == "value") f.copy(dataType = IntegerType) else f)))
    }
    assert(e.getMessage.contains("missing: tag") &&
      e.getMessage.contains("unexpected: rogue") &&
      e.getMessage.contains("value (got double, want int)"), e.getMessage)
  }

  test("edge cases fail loud: unknown profile column, empty PSI side") {
    val e1 = intercept[IllegalArgumentException] {
      Quality.profile(df, Seq("id", "nope"))
    }
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException] {
      Quality.psiDrift(df.limit(0), df, col("typ")).collect()
    }
    assert(e2.getMessage.contains("empty"))
  }

  test("psiDrift: identical distributions → 0; known shift → hand-computed PSI") {
    val x = Seq("a", "a", "a", "b").toDF("c")
    val same = Quality.psiDrift(x, x, col("c")).collect()
    assert(same.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
    // a: .75 vs .25, b: .25 vs .75 → psi = 2 * (.5 * ln(3)) = ln(3)
    val y = Seq("a", "b", "b", "b").toDF("c")
    val got = Quality.psiDrift(x, y, col("c")).collect()
    val half = BigDecimal(0.5 * math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.forall(r => r.getDouble(3) == half), got.mkString("; "))
    assert(math.abs(got.head.getDouble(4) - 2 * half) < 1e-9)
    // category on one side only: finite contribution via the eps floor
    val z = Seq("a", "zz").toDF("c")
    val f = Quality.psiDrift(x, z, col("c")).collect()
    assert(f.forall(r => !r.getDouble(3).isInfinite && !r.getDouble(3).isNaN))
  }

  test("one scan regardless of check count (single-pass contract)") {
    val plan = SparkEntry.queries("q_data_checks")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"six checks must share ONE scan:\n${plan.take(2500)}")
  }
}
