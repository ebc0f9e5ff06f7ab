package graft

import org.apache.spark.sql.functions._
import graft.operators.{Create, ElementWise}
import ElementWise.{DataFrameOps, RegexOps, ToStringOps}

/** Mirrors the reference's transforms/{MapElements,Filter,Partition,Regex,
  * ToString}Test matrix (reference: sdks/java/core/src/test/.../transforms/). */
class ElementWiseSpec extends SparkSpec {
  import spark.implicits._

  private def df = Create.of(spark, Seq((1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")))
    .toDF("id", "name")

  test("mapElements projects 1:1") {
    assertRows(df.mapElements(col("id"), length(col("name")).as("len")),
      Seq(Seq(1, 5), Seq(2, 4), Seq(3, 5), Seq(4, 5)))
  }

  test("filterBy keeps matching rows only") {
    assertRows(df.filterBy(col("id") % 2 === 0).select(col("name")),
      Seq(Seq("beta"), Seq("delta")))
  }

  test("flatMapElements is 1:N via explode") {
    val out = df.flatMapElements(split(col("name"), "a"), "piece")
    assert(out.count() == 10) // alpha->3, beta->2, gamma->3, delta->2
  }

  test("partitionBy routes every row to exactly one output") {
    val parts = df.partitionBy(2, col("id") % 2)
    assert(parts.map(_.count()).sum == 4)
    assertRows(parts(0).select(col("id")), Seq(Seq(2), Seq(4)))
    assertRows(parts(1).select(col("id")), Seq(Seq(1), Seq(3)))
  }

  test("withKeys / kvSwap / keysOnly round-trip") {
    val kv = df.withKeys(col("id") * 10)
    assertRows(kv.keysOnly, Seq(Seq(10), Seq(20), Seq(30), Seq(40)))
    val swapped = Create.of(spark, Seq(("k", 1))).toDF("key", "value").kvSwap
    assertRows(swapped, Seq(Seq(1, "k")))
  }

  test("parDo runs setup per partition and flatMaps") {
    val ds = Create.of(spark, Seq(1, 2, 3))
    val out = ElementWise.parDo[Int, Int](ds)(() => ())(x => Seq(x, x * 100))
    assertRows(out.toDF(), Seq(Seq(1), Seq(100), Seq(2), Seq(200), Seq(3), Seq(300)))
  }

  test("parDoMultiOutput tags rows into disjoint views") {
    val outs = ElementWise.parDoMultiOutput(df,
      when(col("id") <= 2, "small").otherwise("big"), Seq("small", "big"))
    assert(outs("small").count() == 2 && outs("big").count() == 2)
  }

  test("Regex matchesGroup / findAll / replaceAll") {
    val t = Create.of(spark, Seq("a1 b22 c333")).toDF("s")
    assertRows(t.select(RegexOps.matchesGroup(col("s"), "b(\\d+)", 1)), Seq(Seq("22")))
    assertRows(t.select(RegexOps.findAll(col("s"), "\\d+")),
      Seq(Seq(Seq("1", "22", "333"))))
    assertRows(t.select(RegexOps.replaceAll(col("s"), "\\d+", "#")),
      Seq(Seq("a# b# c#")))
  }

  test("Regex replaceFirst replaces only the first occurrence") {
    val t = Create.of(spark, Seq("a1 b2 c3", "no digits")).toDF("s")
    assertRows(t.select(RegexOps.replaceFirst(col("s"), "\\d", "#")),
      Seq(Seq("a# b2 c3"), Seq("no digits")))
  }

  test("Regex matchesKV extracts key and value groups") {
    val t = Create.of(spark, Seq("k=v")).toDF("s")
    val kv = t.select(RegexOps.matchesKV(col("s"), "(\\w+)=(\\w+)", 1, 2).as("kv"))
      .select(col("kv.key"), col("kv.value"))
    assertRows(kv, Seq(Seq("k", "v")))
  }

  test("Regex allMatchesGroup and splitBy") {
    val t = Create.of(spark, Seq("a=1,b=22,c=333")).toDF("s")
    assertRows(t.select(RegexOps.allMatchesGroup(col("s"), "(\\w)=(\\d+)", 2)),
      Seq(Seq(Seq("1", "22", "333"))))
    assertRows(t.select(RegexOps.splitBy(col("s"), ",")),
      Seq(Seq(Seq("a=1", "b=22", "c=333"))))
  }

  test("ToString kvs and iterables") {
    val t = Create.of(spark, Seq(("a", 1))).toDF("k", "v")
    assertRows(t.select(ToStringOps.kvs(col("k"), col("v"))), Seq(Seq("a,1")))
    val arr = Create.of(spark, Seq(Seq("x", "y"))).toDF("a")
    assertRows(arr.select(ToStringOps.iterables(col("a"))), Seq(Seq("x,y")))
  }

  test("Create.timestamped attaches event_time; Create.empty has schema but no rows") {
    val ts = Create.timestamped(spark, Seq(("a", 1000L), ("b", 2000L)))
    assert(ts.schema.fieldNames.toSeq == Seq("value", "event_time"))
    assert(ts.count() == 2)
    val empty = Create.emptyDs[String](spark)
    assert(empty.count() == 0)
  }

  test("splittableParDo: skewed restrictions split into chunks and redistribute") {
    import graft.operators.Splittable
    // one elephant element (10000-wide restriction) next to two mice: the
    // SDF expansion must chunk the elephant so no single task owns it
    val ds = Seq(("big", 0L, 10000L), ("s1", 0L, 7L), ("s2", 100L, 103L))
      .toDS()
    val out = Splittable.splittableParDo(
      ds, (e: (String, Long, Long)) => (e._2, e._3), chunkSize = 1000L)(
      (e, from, to) => Iterator.range(from, to).map(i => (e._1, i)))
    // every claimed offset produced exactly once
    assert(out.count() == 10000 + 7 + 3)
    assert(out.filter(_._1 == "s1").collect().map(_._2).sorted.sameElements(0L until 7L))
    assert(out.filter(_._1 == "big").distinct().count() == 10000)
    // the elephant's 10 chunks landed on more than one partition — the
    // redistribution that makes the expansion worth a shuffle
    // explicit numPartitions: AQE coalesces a no-arg repartition() of 13
    // tiny rows to one partition (correct at real scale, where chunk rows
    // fill size targets), which would make this assertion vacuous
    val spreadCheck = Splittable.splittableParDo(
      ds, (e: (String, Long, Long)) => (e._2, e._3), chunkSize = 1000L,
      numPartitions = 8)(
      (e, from, _) => Iterator.single(
        (e._1 + ":" + from, org.apache.spark.TaskContext.getPartitionId().toLong)))
    val bigParts = spreadCheck.filter(_._1.startsWith("big")).collect().map(_._2).distinct
    assert(bigParts.length > 1, s"elephant chunks all on one partition: ${bigParts.mkString(",")}")
    // an empty restriction yields nothing (from >= to)
    val none = Splittable.splittableParDo(
      Seq(("z", 5L, 5L)).toDS(), (e: (String, Long, Long)) => (e._2, e._3), 10L)(
      (e, f, t) => Iterator.single(e._1))
    assert(none.count() == 0)
  }

  test("JsonOps: parse/serialize round trip, permissive nulls, FAILFAST throws") {
    import graft.operators.ElementWise.JsonOps
    val df = Seq("""{"a": 7, "b": "x"}""", """{"a": 9}""", "not json")
      .toDF("js")
    val parsed = df.select(JsonOps.parseJsons(col("js"), "a INT, b STRING").as("p"))
    assertRows(parsed.select(col("p.a"), col("p.b")),
      Seq(Seq(7, "x"), Seq(9, null), Seq(null, null)))
    // AsJsons: canonical serialization drops null fields (Jackson default)
    assertRows(parsed.filter(col("p.a").isNotNull).select(JsonOps.asJsons(col("p"))),
      Seq(Seq("""{"a":7,"b":"x"}"""), Seq("""{"a":9}""")))
    // FAILFAST matches ParseJsons' exception-on-malformed contract
    intercept[org.apache.spark.SparkException] {
      df.select(JsonOps.parseJsonsOrDie(col("js"), "a INT").as("p")).collect()
    }
  }
}
