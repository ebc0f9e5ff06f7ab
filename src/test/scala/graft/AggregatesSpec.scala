package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, Create}

/** Mirrors transforms/{Combine,Count,Top,Distinct,GroupByKey}Test
  * (reference: sdks/java/core/src/test/.../transforms/). */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def kv = Create.of(spark,
    Seq(("a", 3), ("a", 1), ("a", 2), ("b", 10), ("b", 20))).toDF("k", "v")

  test("countGlobally / countPerKey / countPerElement") {
    assertRows(Aggregates.countGlobally(kv), Seq(Seq(5L)))
    assertRows(Aggregates.countPerKey(kv, col("k")), Seq(Seq("a", 3L), Seq("b", 2L)))
    val dup = Create.of(spark, Seq("x", "x", "y")).toDF("e")
    assertRows(Aggregates.countPerElement(dup), Seq(Seq("x", 2L), Seq("y", 1L)))
  }

  test("topPerKey keeps k per key in order with deterministic tiebreak") {
    val top = Aggregates.topPerKey(kv, Seq(col("k")), Seq(col("v").desc), 2)
    assertRows(top, Seq(Seq("a", 3), Seq("a", 2), Seq("b", 20), Seq("b", 10)))
  }

  test("topKPerKeySalted agrees with the rank-window top-k") {
    val viaWindow = Aggregates.topPerKey(kv, Seq(col("k")), Seq(col("v").desc), 2)
      .select(col("k"), col("v"))
    val viaSalted = Aggregates.topKPerKeySalted(kv, Seq(col("k")),
        struct((-col("v")).as("negv")), col("v"), 2)
      .select(col("k"), (-col("item.negv")).as("v"))
    assert(viaSalted.collect().map(_.toSeq).toSet == viaWindow.collect().map(_.toSeq).toSet)
  }

  test("topKPerKeySalted descending agrees with the rank-window top-k (string tiebreak)") {
    // descending=true ranks by the struct's DESC order — the mode needed
    // when the tiebreak is a string (no negation); here (cnt DESC, w DESC),
    // the AutoComplete/Top.largestPerKey ordering
    val d = Create.of(spark, Seq(
      ("p", 5L, "apple"), ("p", 5L, "apricot"), ("p", 5L, "ant"), ("p", 9L, "ax"),
      ("q", 1L, "bat"), ("q", 1L, "bar"))).toDF("k", "cnt", "w")
    val viaWindow = Aggregates.topPerKey(d, Seq(col("k")),
        Seq(col("cnt").desc, col("w").desc), 2)
      .select(col("k"), col("cnt"), col("w"))
    val viaSalted = Aggregates.topKPerKeySalted(d, Seq(col("k")),
        struct(col("cnt"), col("w")), col("w"), 2, descending = true)
      .select(col("k"), col("item.cnt").as("cnt"), col("item.w").as("w"))
    assert(viaSalted.collect().map(_.toSeq).toSet == viaWindow.collect().map(_.toSeq).toSet)
  }

  test("latestPerKey picks max-ts row with tiebreak") {
    val e = Create.of(spark, Seq(("a", 1L, "old"), ("a", 5L, "new"), ("a", 5L, "zz")))
      .toDF("k", "ts", "val")
    assertRows(Aggregates.latestPerKey(e, Seq(col("k")), col("ts"), col("val")),
      Seq(Seq("a", 5L, "zz")))
  }

  test("distinctByRepresentative keeps the minimum pick per id") {
    val d = Create.of(spark, Seq(("seg", 5, "e"), ("seg", 2, "b"), ("seg2", 9, "z")))
      .toDF("seg", "id", "name")
    assertRows(Aggregates.distinctByRepresentative(d, Seq(col("seg")), col("id")),
      Seq(Seq("seg", 2, "b"), Seq("seg2", 9, "z")))
  }

  test("groupIntoBatches caps batch size and covers all rows") {
    val rows = Create.of(spark, (1 to 25).map(i => ("k", i))).toDF("k", "v")
    val batches = Aggregates.groupIntoBatches(rows, Seq(col("k")), col("v"), 10)
    val sizes = batches.select(col("batch_size")).as[Long].collect().sorted
    assert(sizes.toSeq == Seq(5L, 10L, 10L))
  }

  test("sortValues orders values by secondary key inside each key") {
    val d = Create.of(spark, Seq(("k", 2, "b"), ("k", 1, "a"), ("k", 3, "c")))
      .toDF("k", "pos", "v")
    val out = Aggregates.sortValues(d, col("k"), col("pos"), col("v"))
    assertRows(out, Seq(Seq("k", Seq("a", "b", "c"))))
  }

  test("groupedValues folds a grouped array without reshuffle") {
    val g = Create.of(spark, Seq(("k", Seq(1, 2, 3)))).toDF("k", "vals")
    val out = Aggregates.groupedValues(g, col("vals"), lit(0), (a, x) => a + x, "total")
    assertRows(out.select(col("k"), col("total")), Seq(Seq("k", 6)))
  }

  test("sumPerKeyWithFanout equals plain per-key sum") {
    val big = Create.of(spark, (1 to 1000).map(i => (s"k${i % 3}", i.toLong))).toDF("k", "v")
    val expected = big.groupBy(col("k").as("key")).agg(sum(col("v")).as("sum_value"))
    val fanned = Aggregates.sumPerKeyWithFanout(big, col("k"), col("v"), 8)
    assert(fanned.collect().map(_.toSeq).toSet == expected.collect().map(_.toSeq).toSet)
  }

  test("exactQuantile median matches hand-computed value") {
    val d = Create.of(spark, Seq(1.0, 2.0, 3.0, 4.0)).toDF("x")
    val q = Aggregates.exactQuantile(d, Seq.empty, col("x"), 0.5)
    assert(q.collect()(0).getDouble(0) == 2.5)
  }

  test("globally folds the whole frame; groupByKeyList yields sorted per-key bags") {
    assertRows(Aggregates.globally(kv, count(lit(1)).as("n"), sum(col("v")).as("s")),
      Seq(Seq(5L, 36L)))
    assertRows(Aggregates.groupByKeyList(kv, Seq(col("k")), col("v")),
      Seq(Seq("a", Seq(1, 2, 3)), Seq("b", Seq(10, 20))))
  }

  test("sortValuesLarge: spill-path secondary sort orders rows within key partitions") {
    val big = Create.of(spark, (1 to 200).map(i => (s"k${i % 2}", 200 - i))).toDF("k", "pos")
    val sorted = Aggregates.sortValuesLarge(big, col("k"), col("pos"))
    // within each partition, (k, pos) must be non-decreasing
    val ok = sorted.rdd.mapPartitions { it =>
      val rows = it.map(r => (r.getString(0), r.getInt(1))).toSeq
      Iterator(rows.sliding(2).forall {
        case Seq((k1, p1), (k2, p2)) => k1 < k2 || (k1 == k2 && p1 <= p2)
        case _ => true
      })
    }.collect()
    assert(ok.forall(identity) && sorted.count() == 200)
  }

  test("reshuffle preserves data and changes partitioning") {
    val out = Aggregates.reshuffle(kv, 7)
    assert(out.rdd.getNumPartitions == 7 && out.count() == 5)
  }

  test("groupIntoBatches: both cardinality paths produce identical batches") {
    import spark.implicits._
    val rows = (1 to 137).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("batch_id"),
          array_join(transform(col("batch"), x => x.cast("string")), ",").as("b"),
          col("batch_size"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val ranged = canon(Aggregates.groupIntoBatches(rows, Seq(col("k")), col("v"), 10,
      lowCardinality = Some(true)))
    val windowed = canon(Aggregates.groupIntoBatches(rows, Seq(col("k")), col("v"), 10,
      lowCardinality = Some(false)))
    assert(ranged.nonEmpty && ranged == windowed, s"$ranged\nvs\n$windowed")
  }

  test("cmsFrequencies honors the count-min contract and is deterministic") {
    val items = Seq.fill(100)("a") ++ Seq.fill(40)("b") ++ Seq.fill(1)("c")
    val df = items.toDF("item")
    val eps = 0.01
    val run1 = Aggregates.cmsFrequencies(df, col("item"), Seq("a", "b", "c", "absent"), eps = eps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("a" -> 100L, "b" -> 40L, "c" -> 1L, "absent" -> 0L)
    val slack = (eps * items.size).toLong + 1
    exact.foreach { case (k, e) =>
      assert(run1(k) >= e, s"$k: CMS must never underestimate (${run1(k)} < $e)")
      assert(run1(k) <= e + slack, s"$k: ${run1(k)} > $e + $slack")
    }
    val run2 = Aggregates.cmsFrequencies(df, col("item"), Seq("a", "b", "c", "absent"), eps = eps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run1 == run2, "fixed seed must make the sketch deterministic")
  }

  test("cmsFrequencies: NULL items are no item — skipped, not an NPE") {
    val df = Seq[String]("a", null, "a", null, "b").toDF("item")
    val got = Aggregates.cmsFrequencies(df, col("item"), Seq("a", "b"), eps = 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") >= 2L && got("b") >= 1L)
    assert(got("a") <= 2L + 1 && got("b") <= 1L + 1)
  }

  test("risingPairs: randomized differential vs a brute-force sliding walk") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    // 200 arrays over sizes 0..12 with heavy value collisions (the 'equal
    // speeds count as falling' edge the reference's <-comparison implies)
    val fixtures = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(13))(rnd.nextInt(5).toLong))
    }
    val expected = fixtures.map { case (id, xs) =>
      id -> xs.sliding(2).count(p => p.length == 2 && p(1) > p.head).toLong
    }.toMap
    val got = fixtures.toDF("id", "arr")
      .select(col("id"),
        Aggregates.risingPairs(transform(col("arr"), x => struct(x.as("speed"))),
          _.getField("speed")).cast("long").as("ups"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("sequentialIds: dense 0-based global ids in total order, across many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = rnd.shuffle((0L until 5000L).toList).map(i => (i, i % 17))
    val df = rows.toDF("id", "grp").repartition(16)
    val out = Aggregates.sequentialIds(df, Seq(col("grp"), col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 5000)
    // expected: rank in (grp, id) order
    val expected = rows.sortBy { case (id, g) => (g, id) }
      .zipWithIndex.map { case ((id, g), i) => (id, g, i.toLong) }.toSet
    assert(out.toSet == expected)
    // fail-loud on a clobbered output column
    val e = intercept[IllegalArgumentException] {
      Aggregates.sequentialIds(df.withColumn("seq_id", lit(1)), Seq(col("id")))
    }
    assert(e.getMessage.contains("seq_id"))
  }
}
