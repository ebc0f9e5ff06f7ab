package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Randomized differential gate on the RangeJoinRewrite optimizer rule:
  * the crafted ExtensionsSpec scenarios cover each matcher arm once; this
  * spec sweeps the matcher's WHOLE input space with a seeded generator —
  * boundary-op combinations ([lo,hi) / BETWEEN / (lo,hi) / (lo,hi]),
  * flipped comparison spellings, keyed equalities, residual conjuncts,
  * LEFT OUTER shapes, interval-OVERLAP shapes (strict/closed), integral
  * AND timestamp domains — over frames that deliberately contain
  * inverted and zero-length intervals (the degenerate rows whose naive
  * semantics the rewrite's partitioned legs must reproduce exactly).
  * Every generated join runs WITH the rewrite fired (required
  * structurally) and its full (id, id) result multiset is hash-compared
  * against DuckDB evaluating the same predicate on the raw long domain
  * (timestamps compare identically to their epoch-micros, so the long
  * rendering is exact).
  */
class FuzzRangeRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val Seed = 20260814L
  private val N = sys.env.getOrElse("SPARK_GRAFT_RANGEFUZZ_N", "24").toInt
  private val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  // one corpus for every trial: points (id, p, pk), intervals (id, lo,
  // hi, ik) with ~10% inverted and ~10% zero-length bound pairs
  private val rnd0 = new scala.util.Random(Seed)
  private val pointRows = (0 until 2500).map { i =>
    (i.toLong, rnd0.nextInt(1000).toLong, (i % 3).toLong)
  }
  private val ivRows = (0 until 160).map { i =>
    val lo = rnd0.nextInt(1000).toLong
    val hi = rnd0.nextInt(10) match {
      case 0 => lo - 1 - rnd0.nextInt(40) // inverted
      case 1 => lo                        // zero-length
      case _ => lo + 1 + rnd0.nextInt(120)
    }
    (10000L + i, lo, hi, (i % 3).toLong)
  }

  private case class Shape(overlap: Boolean, loIncl: Boolean, hiIncl: Boolean,
                           keyed: Boolean, residual: Boolean, outer: Boolean,
                           timestamps: Boolean, flip: Boolean, width: Long)

  private def randomShape(rnd: scala.util.Random): Shape = {
    val overlap = rnd.nextInt(3) == 0
    // residual only on INNER point shapes: outer+residual is a correct
    // SKIP by the rule's contract (outer extras decide null-extension and
    // can't be post-filtered — ExtensionsSpec pins the skip), so the
    // fire-required sweep must not emit it
    val residual = !overlap && rnd.nextInt(3) == 0
    Shape(
      overlap = overlap,
      loIncl = rnd.nextBoolean(), hiIncl = rnd.nextBoolean(),
      keyed = rnd.nextBoolean(),
      residual = residual,
      outer = !overlap && !residual && rnd.nextInt(4) == 0,
      timestamps = rnd.nextInt(3) == 0,
      flip = rnd.nextBoolean(),
      width = Seq(16L, 64L, 128L)(rnd.nextInt(3)))
  }

  /** The long value columns as the trial's domain (timestamps via
    * timestamp_micros on the Spark side only — DuckDB compares the raw
    * longs, which is exactly the epoch-micros order). */
  private def frames(sh: Shape): (DataFrame, DataFrame) = {
    val p0 = pointRows.toDF("p_id", "p", "pk")
    val i0 = ivRows.toDF("iv_id", "lo", "hi", "ik")
    if (!sh.timestamps) (p0, i0)
    else (p0.withColumn("p", timestamp_micros($"p")),
      i0.withColumn("lo", timestamp_micros($"lo"))
        .withColumn("hi", timestamp_micros($"hi")))
  }

  private def sparkJoin(sh: Shape): DataFrame = {
    val (pts, ivs) = frames(sh)
    def cmp(a: Column, b: Column, incl: Boolean, lower: Boolean): Column =
      (lower, incl) match {
        case (true, true) => if (sh.flip) b <= a else a >= b
        case (true, false) => if (sh.flip) b < a else a > b
        case (false, true) => if (sh.flip) b >= a else a <= b
        case (false, false) => if (sh.flip) b > a else a < b
      }
    if (sh.overlap) {
      // two same-strictness comparisons; reuse loIncl as THE strictness
      val c1 = if (sh.loIncl) $"lo" <= $"hi2" else $"lo" < $"hi2"
      // second interval side derives from points: p as lo2, p + 40 as hi2
      val pts2 = pts.withColumn("lo2", $"p")
        .withColumn("hi2",
          if (sh.timestamps) $"p" + expr("INTERVAL 0.00004 SECONDS") // 40 µs
          else $"p" + 40L)
        .drop("p")
      val c2 = if (sh.loIncl) $"lo2" <= $"hi" else $"lo2" < $"hi"
      val cond0 = c1 && c2
      val cond = if (sh.keyed) cond0 && $"pk" === $"ik" else cond0
      pts2.join(ivs, cond).select($"p_id", $"iv_id")
    } else {
      val cond0 = cmp($"p", $"lo", sh.loIncl, lower = true) &&
        cmp($"p", $"hi", sh.hiIncl, lower = false)
      val cond1 = if (sh.keyed) cond0 && $"pk" === $"ik" else cond0
      val cond = if (sh.residual) cond1 && $"p_id" % 7 =!= $"iv_id" % 5 else cond1
      if (sh.outer) pts.join(ivs, cond, "left_outer").select($"p_id", $"iv_id")
      else pts.join(ivs, cond).select($"p_id", $"iv_id")
    }
  }

  private def duckSql(sh: Shape): String = {
    def op(incl: Boolean, lower: Boolean) =
      (lower, incl) match {
        case (true, true) => ">="
        case (true, false) => ">"
        case (false, true) => "<="
        case (false, false) => "<"
      }
    if (sh.overlap) {
      val lt = if (sh.loIncl) "<=" else "<"
      val key = if (sh.keyed) " AND pk = ik" else ""
      val delta = 40L // micros and longs share the numeric domain here
      s"SELECT p_id, iv_id FROM pts JOIN ivs ON lo $lt p + $delta AND p $lt hi$key"
    } else {
      val key = if (sh.keyed) " AND pk = ik" else ""
      val res = if (sh.residual) " AND p_id % 7 <> iv_id % 5" else ""
      val join = if (sh.outer) "LEFT JOIN" else "JOIN"
      s"SELECT p_id, iv_id FROM pts $join ivs ON " +
        s"p ${op(sh.loIncl, lower = true)} lo AND " +
        s"p ${op(sh.hiIncl, lower = false)} hi$key$res"
    }
  }

  test(s"$N random rewrite shapes match DuckDB exactly with the rule fired (seed=$Seed)") {
    val rnd = new scala.util.Random(Seed)
    val shapes = (0 until N).map(_ => randomShape(rnd))
    // DuckDB side: long-domain frames as parquet views (timestamps are
    // compared as their epoch micros — identical order and equality)
    val workDir = java.nio.file.Files.createTempDirectory("graft-rangefuzz")
    pointRows.toDF("p_id", "p", "pk").write.mode("overwrite")
      .parquet(workDir.resolve("pts").toString)
    ivRows.toDF("iv_id", "lo", "hi", "ik").write.mode("overwrite")
      .parquet(workDir.resolve("ivs").toString)
    java.nio.file.Files.writeString(workDir.resolve("views.json"),
      s"""{"pts": "${workDir.resolve("pts")}", "ivs": "${workDir.resolve("ivs")}"}""")
    val sqls = shapes.zipWithIndex.map { case (sh, i) => f"r$i%03d" -> duckSql(sh) }
    java.nio.file.Files.writeString(workDir.resolve("queries.json"),
      sqls.map { case (n, q) => s""""$n": "$q"""" }.mkString("{", ",\n", "}"))
    val outDir = workDir.resolve("duck")
    val log = new StringBuilder
    val rc = scala.sys.process.Process(
      Seq("python3", "/root/repo/tools/fuzz_oracle.py", "/root/testdata/sf0.001",
        workDir.resolve("queries.json").toString, outDir.toString)) !
      scala.sys.process.ProcessLogger(l => log.append(l).append('\n'),
        l => log.append(l).append('\n'))
    assert(rc == 0, s"fuzz_oracle.py failed:\n$log")

    spark.conf.unset(WidthConf)
    val failures = Seq.newBuilder[String]
    shapes.zipWithIndex.foreach { case (sh, i) =>
      spark.conf.set(WidthConf, sh.width.toString)
      try {
        val df = sparkJoin(sh)
        val plan = df.queryExecution.optimizedPlan
        // the rule must actually FIRE on every eligible shape (outer with
        // residual would skip — the generator never emits that combo)
        import org.apache.spark.sql.catalyst.plans.logical.Join
        val fired = plan.collect {
          case j: Join if j.condition.exists(_.references.exists(
            _.name.startsWith("__bin"))) => j
        }.nonEmpty
        if (!fired)
          failures += s"r$i: rewrite did not fire on $sh\n${plan.toString.take(1200)}"
        else {
          import scala.jdk.CollectionConverters._
          val duckLines = java.nio.file.Files.readAllLines(
            outDir.resolve(f"r$i%03d.txt")).asScala.toSeq
          if (duckLines.headOption.exists(_.startsWith("ERROR")))
            failures += s"r$i: duck error ${duckLines.head} for ${duckSql(sh)}"
          else {
            // duck emits columns sorted by name (iv_id, p_id); spark
            // selects (p_id, iv_id) — realign to the duck order
            val gotAligned = df.select($"iv_id", $"p_id").collect()
              .map(_.toSeq.map(v => if (v == null) "\u0000" else v.toString)
                .mkString("\u001f")).sorted.toSeq
            val duckRows = duckLines.drop(1)
            if (gotAligned != duckRows) {
              val firstDiff = gotAligned.zipAll(duckRows, "<none>", "<none>")
                .find(p => p._1 != p._2)
              failures += s"r$i: ${gotAligned.size} spark vs ${duckRows.size} duck rows " +
                s"for $sh\nSQL ${duckSql(sh)}\nfirst diff $firstDiff"
            }
          }
        }
      } finally spark.conf.unset(WidthConf)
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size}/$N shapes diverged:\n${fs.take(3).mkString("\n---\n")}")
  }
}
