package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Joins, Windows}
import graft.operators.Windows.{CalendarWindows, FixedWindows, WindowingStrategy}

/** Schema-drift armor. The driver has regenerated /root/testdata twice with
  * a different physical encoding for `events.ts` (int64-nanos through round
  * 7, no-timezone timestamp[us] — Spark TIMESTAMP_NTZ — from round 8), and
  * each rotation silently broke green queries until the next driver run.
  * This suite writes the SAME logical events table in all three encodings
  * Spark can produce and pins the invariant the whole catalog rests on:
  * `GraftSession.table` yields session-LTZ timestamps with identical values
  * regardless of encoding, and a representative query slice (fixed-window
  * agg, point-in-interval range join, calendar window) returns identical
  * results over each. If the driver rotates to a FOURTH encoding, the
  * schema pin here fails loudly instead of shipping a locally-green commit
  * that is red in the driver's environment. */
class SchemaDriftSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // 3 days of deterministic events, microsecond-grained, some sub-second
  // parts so truncation bugs (ns div vs double /) would show.
  private val baseUs = 1704067200L * 1000000L // 2024-01-01 00:00:00 UTC
  private val rows: Seq[(Long, Long, Long, String, Double)] =
    (0L until 2000L).map { i =>
      val tsUs = baseUs + i * 127000037L // ~127 s apart, odd µs remainder
      (i, tsUs, i % 37, Seq("click", "signup", "error")(i.toInt % 3), i * 0.25)
    }

  // fixtures live under target/ (repo scratch convention) and are removed
  // in afterAll, so repeated runs don't leak three parquet trees each
  private val scratch = {
    val p = java.nio.file.Paths.get("target", "schema-drift-fixtures")
    java.nio.file.Files.createDirectories(p)
    p
  }

  override def afterAll(): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    if (Files.exists(scratch)) {
      val all = Files.walk(scratch).iterator().asScala.toSeq
      all.sortBy(-_.getNameCount).foreach(p => Files.deleteIfExists(p))
    }
    super.afterAll()
  }

  private def writeEncoding(encoding: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(scratch, s"graft-drift-$encoding").toString
    val df = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val withTs = encoding match {
      // int64 ns-since-epoch: what nanosAsLong surfaces for parquet
      // TIMESTAMP(NANOS) (Spark cannot WRITE nanos, but the LongType code
      // path in GraftSession.table is identical either way)
      case "int64ns" => df.withColumn("ts", col("ts_us") * 1000L)
      // no-timezone timestamp[us] — reads back as TIMESTAMP_NTZ
      case "ntz" => df.withColumn("ts",
        timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      // isAdjustedToUTC timestamp[us] — reads back as TIMESTAMP (LTZ)
      case "ltz" => df.withColumn("ts", timestamp_micros(col("ts_us")))
    }
    withTs.drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val encodings = Seq("int64ns", "ntz", "ltz")
  private lazy val dirs: Map[String, String] =
    encodings.map(e => e -> writeEncoding(e)).toMap

  // sanity: the three fixtures really are physically different
  test("fixtures cover three distinct physical ts encodings") {
    def rawType(dir: String): DataType = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    }
    assert(rawType(dirs("int64ns")) == LongType)
    assert(rawType(dirs("ntz")) == TimestampNTZType)
    assert(rawType(dirs("ltz")) == TimestampType)
  }

  test("GraftSession.table normalizes every encoding to LTZ with identical values") {
    val loaded = encodings.map(e => e -> GraftSession.table(spark, dirs(e), "events"))
    for ((e, df) <- loaded)
      assert(df.schema("ts").dataType == TimestampType,
        s"$e: table() must yield session-LTZ ts, got ${df.schema("ts").dataType} " +
          "— the driver likely rotated the testdata encoding again; teach " +
          "GraftSession.table the new physical type")
    val micros = loaded.map { case (e, df) =>
      e -> df.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }.toMap
    assert(micros("ntz") == micros("ltz"), "NTZ wall clock must be read as UTC")
    assert(micros("int64ns") == micros("ltz"), "ns div 1000 truncation drifted")
    assert(micros("ltz").take(2).map(_._2) == Seq(baseUs, baseUs + 127000037L))
  }

  // --- representative query slice: identical results across encodings ---

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString("|"))

  private def assertSliceAgrees(name: String)(q: DataFrame => DataFrame): Unit = {
    val results = encodings.map { e =>
      e -> canon(q(GraftSession.table(spark, dirs(e), "events")))
    }
    val (_, expected) = results.head
    assert(expected.nonEmpty, s"$name: empty result proves nothing")
    for ((e, got) <- results.tail)
      assert(got == expected, s"$name: encoding $e diverged from ${results.head._1}")
  }

  test("windowed agg slice is encoding-invariant") {
    assertSliceAgrees("fixed-window agg") { ev =>
      Windows.aggregate(ev, WindowingStrategy(FixedWindows("1 hour")), col("ts"),
          Seq(col("event_type")), Seq(count(lit(1)).as("n"), sum(col("value")).as("v")))
        .select(col("window.start").cast("string"), col("event_type"), col("n"), col("v"))
    }
  }

  test("range-join slice is encoding-invariant") {
    assertSliceAgrees("point-in-interval join") { ev =>
      val hourUs = 3600L * 1000000
      val intervals = ev.filter(col("event_type") === "signup" && col("event_id") % 7 === 1)
        .select(col("event_id").as("interval_id"),
          GraftSession.epochMicros(col("ts")).as("lo"),
          (GraftSession.epochMicros(col("ts")) + 4 * hourUs).as("hi"))
      val points = ev.filter(col("event_type") === "click")
        .select(GraftSession.epochMicros(col("ts")).as("p"))
      Joins.pointInIntervalJoin(points, col("p"), intervals, col("lo"), col("hi"),
          bucketWidth = 4 * hourUs)
        .groupBy(col("interval_id")).agg(count(lit(1)).as("n_clicks"))
    }
  }

  test("calendar-window slice is encoding-invariant") {
    assertSliceAgrees("calendar day window") { ev =>
      Windows.aggregate(ev, WindowingStrategy(CalendarWindows("day")), col("ts"),
          Seq.empty, Seq(count(lit(1)).as("n")))
        .select(col("window.start").cast("string"), col("n"))
    }
  }

  test("epochMicros fail-louds on NTZ under a non-UTC session instead of shifting silently") {
    val ntz = rows.take(5).toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[Exception] {
        ntz.select(GraftSession.epochMicros(col("ts"))).collect()
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("epochMicros accepts semantically-UTC zone aliases (Etc/UTC)") {
    val ntz = rows.take(5).toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    spark.conf.set("spark.sql.session.timeZone", "Etc/UTC")
    try {
      val got = ntz.select(GraftSession.epochMicros(col("ts")).as("us"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == rows.take(5).map(_._2).sorted)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("epochMicros rejects a LongType epoch column at analysis (10^6-error guard)") {
    // the old cast-based formulation would have read these micros as SECONDS
    val longs = Seq(baseUs, baseUs + 1L).toDF("lo")
    val e = intercept[Exception] {
      longs.select(GraftSession.epochMicros(col("lo"))).collect()
    }
    assert(e.getMessage.contains("SECONDS") || e.getMessage.contains("TIMESTAMP"))
  }
}
