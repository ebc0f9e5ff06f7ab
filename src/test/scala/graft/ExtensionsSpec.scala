package graft

import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: RangeJoinRewrite turns a
  * user-written nested-loop range join into the bucketed plan when
  * `spark.graft.rangeJoin.bucketWidth` is set, and leaves everything else
  * alone. */
class ExtensionsSpec extends SparkSpec {

  import spark.implicits._

  private val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private lazy val points = (0L until 2000L).map(i => (i, i * 7 % 1000))
    .toDF("point_id", "p")
  private lazy val intervals = (0L until 100L).map(i => (i, i * 10, i * 10 + 25))
    .toDF("interval_id", "lo", "hi")

  private def naive = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")

  test("rule OFF (conf unset): the naive plan keeps its nested loop") {
    spark.conf.unset(WidthConf)
    val p = naive.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("rule ON: same query plans as a bucketed equi-join, identical results") {
    spark.conf.unset(WidthConf)
    val expected = naive.collect().map(_.toSeq).toSet
    spark.conf.set(WidthConf, "16")
    try {
      val rewritten = naive
      val p = rewritten.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"expected the bucketed rewrite:\n${p.take(2500)}")
      val got = rewritten.collect().map(_.toSeq).toSet
      assert(got == expected,
        s"rewrite changed results: ${got.size} vs ${expected.size} rows")
      // column order and names preserved
      assert(rewritten.columns.toSeq == naive.columns.toSeq)
    } finally spark.conf.unset(WidthConf)
  }

  test("rule ON: downstream operators resolve over the rewritten join") {
    spark.conf.set(WidthConf, "16")
    try {
      val agg = naive.groupBy($"interval_id").agg(count(lit(1)).as("n"))
        .orderBy($"interval_id")
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
      assert(agg.count() > 0)
    } finally spark.conf.unset(WidthConf)
  }

  test("rule carries extra conjuncts: keyed range join, residual predicate") {
    spark.conf.unset(WidthConf)
    // keyed range join — the common production shape: equality + range
    def kPoints = points.withColumn("pk", $"point_id" % 4)
    def kIntervals = intervals.withColumn("ik", $"interval_id" % 4)
    def keyed = kPoints.join(kIntervals,
      $"pk" === $"ik" && $"p" >= $"lo" && $"p" < $"hi")
    // residual: a deterministic non-equality extra must be preserved
    def residual = points.join(intervals,
      $"p" >= $"lo" && $"p" < $"hi" && $"point_id" =!= $"interval_id")
    val expK = keyed.collect().map(_.toSeq).toSet
    val expR = residual.collect().map(_.toSeq).toSet
    spark.conf.set(WidthConf, "16")
    try {
      for ((df, exp) <- Seq((keyed, expK), (residual, expR))) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"expected the bucketed rewrite:\n${p.take(2500)}")
        assert(df.collect().map(_.toSeq).toSet == exp,
          "rewrite changed results for a join with extra conjuncts")
      }
      // the equality key must ride the hash join, not the post-filter:
      // the join's key list mentions the derived __k column
      assert(keyed.queryExecution.executedPlan.toString.contains("__k0"),
        keyed.queryExecution.executedPlan.toString.take(2500))
    } finally spark.conf.unset(WidthConf)
  }

  test("rule skips what it cannot prove: equi-join, non-integral") {
    // (a non-deterministic conjunct never reaches the rule — Spark's
    // analyzer rejects it in a join condition [INVALID_NON_DETERMINISTIC_
    // EXPRESSIONS]; classifyExtras' determinism guard is defense-in-depth)
    spark.conf.set(WidthConf, "16")
    try {
      // plain equi-join → untouched (no bins anywhere)
      val equi = points.join(intervals, $"p" === $"lo")
      assert(!equi.queryExecution.executedPlan.toString.contains("__bin"))
      // doubles → untouched
      val dPoints = points.select($"point_id", $"p".cast("double").as("p"))
      val dIv = intervals.select($"interval_id",
        $"lo".cast("double").as("lo"), $"hi".cast("double").as("hi"))
      assert(dPoints.join(dIv, $"p" >= $"lo" && $"p" < $"hi")
        .queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.unset(WidthConf)
  }

  test("rule ON: BETWEEN and exclusive-lower shapes rewrite with exact boundary semantics") {
    spark.conf.unset(WidthConf)
    // defs: a val Dataset caches its optimized plan at first action, so
    // the expected-side collect would freeze the UNrewritten plan
    def between = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
    def exclusive = points.join(intervals, $"p" > $"lo" && $"p" < $"hi")
    def flippedClosed = points.join(intervals, $"lo" <= $"p" && $"hi" >= $"p")
    val expB = between.collect().map(_.toSeq).toSet
    val expE = exclusive.collect().map(_.toSeq).toSet
    spark.conf.set(WidthConf, "16")
    try {
      for ((df, exp) <- Seq((between, expB), (exclusive, expE), (flippedClosed, expB))) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"expected the bucketed rewrite:\n${p.take(2500)}")
        assert(df.collect().map(_.toSeq).toSet == exp,
          "rewrite changed results for an inclusive/exclusive boundary shape")
      }
    } finally spark.conf.unset(WidthConf)
  }

  test("rule ON: outer range joins rewrite when the outer side is the points side") {
    spark.conf.unset(WidthConf)
    def leftOuter = points.join(intervals,
      $"p" >= $"lo" && $"p" < $"hi", "left_outer")
    def rightOuter = intervals.join(points,
      $"p" >= $"lo" && $"p" < $"hi", "right_outer")
    // outer side = intervals → must SKIP (pointInIntervalJoinLeft
    // preserves points, not intervals)
    def wrongSide = intervals.join(points,
      $"p" >= $"lo" && $"p" < $"hi", "left_outer")
    val expL = leftOuter.collect().map(_.toSeq).toSet
    val expR = rightOuter.collect().map(_.toSeq).toSet
    spark.conf.set(WidthConf, "16")
    try {
      for ((df, exp) <- Seq((leftOuter, expL), (rightOuter, expR))) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"expected the outer rewrite:\n${p.take(2500)}")
        assert(df.collect().map(_.toSeq).toSet == exp,
          "outer rewrite changed results")
      }
      assert(wrongSide.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "intervals-outer shape must skip")
      // residual extras can't be post-filtered on an outer join → skip
      val resid = points.join(intervals,
        $"p" >= $"lo" && $"p" < $"hi" && $"point_id" =!= $"interval_id", "left_outer")
      assert(resid.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "outer with residual must skip")
    } finally spark.conf.unset(WidthConf)
  }

  test("rule ON: interval-overlap shape rewrites, exactly — including degenerate bound pairs") {
    spark.conf.unset(WidthConf)
    val rnd = new scala.util.Random(20260817L)
    // inverted (hi < lo) and zero-length pairs PLANTED: the naive
    // predicate can still match them ("b covers the inverted pair"), so
    // the rewrite's degenerate legs must reproduce those rows exactly
    def mkIv(n: Int, idBase: Long) = (0 until n).map { i =>
      val lo = rnd.nextInt(1000).toLong
      val kind = rnd.nextInt(10)
      val hi = if (kind == 0) lo - 1 - rnd.nextInt(50) // inverted
               else if (kind == 1) lo                  // zero-length
               else lo + 1 + rnd.nextInt(80)           // well-formed
      (idBase + i, lo, hi)
    }
    val aIv = mkIv(300, 0L).toDF("a_id", "a_lo", "a_hi")
    val bIv = mkIv(200, 10000L).toDF("b_id", "b_lo", "b_hi")
    def strictJ = aIv.join(bIv, $"a_lo" < $"b_hi" && $"b_lo" < $"a_hi")
    def closedJ = aIv.join(bIv, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
    def flippedJ = aIv.join(bIv, $"b_hi" > $"a_lo" && $"a_hi" > $"b_lo")
    def mixedJ = aIv.join(bIv, $"a_lo" < $"b_hi" && $"b_lo" <= $"a_hi")
    val expS = strictJ.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val expC = closedJ.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    spark.conf.set(WidthConf, "64")
    try {
      for ((df, exp, tag) <- Seq((strictJ, expS, "strict"), (closedJ, expC, "closed"),
                                 (flippedJ, expS, "flipped"))) {
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("__bin"), s"$tag: expected the bucketed main leg:\n${p.take(2000)}")
        val got = df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        assert(got == exp, s"$tag: overlap rewrite changed results — " +
          s"${(exp.keySet -- got.keySet).take(2)} missing, ${(got.keySet -- exp.keySet).take(2)} extra")
      }
      // mixed </<= strictness → operator can't express it → untouched
      assert(mixedJ.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "mixed strictness must skip")
    } finally spark.conf.unset(WidthConf)
  }

  test("rule ON: keyed interval-overlap rides the equality through the bucketed join") {
    spark.conf.unset(WidthConf)
    val aIv = (0 until 200).map(i => (i.toLong, i % 3L, (i * 7 % 500).toLong, (i * 7 % 500 + 30).toLong))
      .toDF("a_id", "ak", "a_lo", "a_hi")
    val bIv = (0 until 150).map(i => (1000L + i, i % 3L, (i * 11 % 500).toLong, (i * 11 % 500 + 25).toLong))
      .toDF("b_id", "bk", "b_lo", "b_hi")
    def keyed = aIv.join(bIv,
      $"ak" === $"bk" && $"a_lo" < $"b_hi" && $"b_lo" < $"a_hi")
    // multiset compare: a toSet would hide duplicate pair emission (the
    // first-shared-bin guard's failure mode)
    val exp = keyed.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    spark.conf.set(WidthConf, "64")
    try {
      val p = keyed.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && p.contains("__k0"),
        s"expected the keyed bucketed overlap:\n${p.take(2500)}")
      assert(keyed.collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap == exp)
    } finally spark.conf.unset(WidthConf)
  }

  test("rule ON: TimestampType range join rewrites — µs boundary exactness, NTZ under UTC") {
    spark.conf.unset(WidthConf)
    // interval [1s, 2s) in µs; points planted ±1µs around both edges —
    // the rewrite's epochMicros threading must keep [inclusive-lo,
    // exclusive-hi) exact at microsecond resolution
    def tsIv = Seq((1L, 1000000L, 2000000L)).toDF("interval_id", "lo_us", "hi_us")
      .select($"interval_id", timestamp_micros($"lo_us").as("lo_ts"),
        timestamp_micros($"hi_us").as("hi_ts"))
    def tsPts = Seq(999999L, 1000000L, 1000001L, 1999999L, 2000000L)
      .toDF("p_us").select($"p_us", timestamp_micros($"p_us").as("p_ts"))
    def j = tsPts.join(tsIv, $"p_ts" >= $"lo_ts" && $"p_ts" < $"hi_ts")
    // larger randomized frame for full value parity vs the naive plan
    // data drawn ONCE into vals (a def would re-draw per evaluation and
    // the expected/actual sides would see different frames); only the
    // JOINED Dataset stays a def so the conf change is visible
    val rnd = new scala.util.Random(20260814L)
    val bigIvRows = (0 until 80).map { i =>
      val lo = rnd.nextInt(1000000).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(200000))
    }
    val bigPtRows = (0 until 1500).map(i => (i.toLong, rnd.nextInt(1200000).toLong))
    def bigIv = bigIvRows.toDF("interval_id", "lo_us", "hi_us")
      .select($"interval_id", timestamp_micros($"lo_us").as("lo_ts"),
        timestamp_micros($"hi_us").as("hi_ts"))
    def bigPts = bigPtRows
      .toDF("point_id", "p_us").select($"point_id", timestamp_micros($"p_us").as("p_ts"))
    def bigJ = bigPts.join(bigIv, $"p_ts" >= $"lo_ts" && $"p_ts" < $"hi_ts")
    val expBig = bigJ.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    spark.conf.set(WidthConf, "500000") // µs domain: 0.5s bins
    try {
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"expected the timestamp rewrite:\n${p.take(2500)}")
      assert(j.collect().map(_.getLong(0)).sorted.toSeq == Seq(1000000L, 1000001L, 1999999L),
        "µs boundary semantics drifted through the timestamp rewrite")
      val gotBig = bigJ.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(gotBig == expBig, "timestamp rewrite changed results on the randomized frame")
      // NTZ flavor fires too (session is UTC in tests)
      def ntzJ = tsPts.withColumn("p_ts", $"p_ts".cast("timestamp_ntz"))
        .join(tsIv.withColumn("lo_ts", $"lo_ts".cast("timestamp_ntz"))
          .withColumn("hi_ts", $"hi_ts".cast("timestamp_ntz")),
          $"p_ts" >= $"lo_ts" && $"p_ts" < $"hi_ts")
      val pNtz = ntzJ.queryExecution.executedPlan.toString
      assert(!pNtz.contains("BroadcastNestedLoopJoin"),
        s"NTZ under UTC must rewrite:\n${pNtz.take(2000)}")
      assert(ntzJ.collect().map(_.getLong(0)).sorted.toSeq == Seq(1000000L, 1000001L, 1999999L))
      // mixed-family overlap quadruple (timestamp pair × long pair) must
      // SKIP — binning µs against raw longs would be incoherent
      def mixedFam = tsIv.select($"interval_id", $"lo_ts".as("a_lo"), $"hi_ts".as("a_hi"))
        .join(Seq((1L, 500000L, 2500000L)).toDF("b_id", "b_lo", "b_hi"),
          graft.GraftSession.epochMicros($"a_lo") < $"b_hi" &&
            $"b_lo" < graft.GraftSession.epochMicros($"a_hi"))
      // (epochMicros wrapping makes the bounds non-bare attrs → skip path)
      assert(mixedFam.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "non-bare-attr bounds must skip")
    } finally spark.conf.unset(WidthConf)
  }

  test("catalog q_range_rewrite_ts: naive TIMESTAMP comparisons over real tables hit the rewrite") {
    spark.conf.unset(WidthConf)
    val df = Queries.qRangeRewriteTs(spark, "/root/testdata/sf0.001")
    assert(spark.conf.getOption(WidthConf).isEmpty,
      "q_range_rewrite_ts leaked the width conf into the session")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"expected the bucketed rewrite in the catalog query's plan:\n${p.take(2500)}")
    assert(p.contains("__bin"), s"expected the bin equi-join:\n${p.take(2500)}")
    assert(df.count() > 0)
  }

  test("catalog q_range_rewrite: the naive join over real tables hits the rewrite, conf scoped") {
    // end-to-end on the events table, not a crafted frame: the catalog
    // query writes `p >= lo && p < hi`, scopes the width conf to its own
    // builder, and returns the already-rewritten plan
    spark.conf.unset(WidthConf)
    val df = Queries.qRangeRewrite(spark, "/root/testdata/sf0.001")
    assert(spark.conf.getOption(WidthConf).isEmpty,
      "q_range_rewrite leaked the width conf into the session")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"expected the bucketed rewrite in the catalog query's plan:\n${p.take(2500)}")
    assert(p.contains("__bin"), s"expected the bin equi-join:\n${p.take(2500)}")
    // non-empty at sf0.001 (value correctness is the DuckDB oracle's job);
    // count() builds a FRESH QueryExecution with the conf unset — the
    // shipped plan must stay bucketed on its own
    assert(df.count() > 0)
  }

  test("catalog q_overlap_rewrite: the naive overlap join over real tables hits the rewrite, conf scoped") {
    spark.conf.unset(WidthConf)
    val df = Queries.qOverlapRewrite(spark, "/root/testdata/sf0.001")
    assert(spark.conf.getOption(WidthConf).isEmpty,
      "q_overlap_rewrite leaked the width conf into the session")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("__bin"), s"expected the bucketed overlap main leg:\n${p.take(2500)}")
    assert(df.count() > 0)
  }

  test("SQL users reach the native kernels: vec_dot / word_ngram_counts / morton / epoch_micros") {
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(dot == 11.0)
    val wc = spark.sql(
      "SELECT word_ngram_counts('the cat the') AS m").head()
      .getMap[String, Long](0)
    assert(wc("the") == 2L && wc("the cat") == 1L && wc("cat the") == 1L)
    val sh = spark.sql("SELECT word_shingles('a b c', 2) AS s").head()
      .getSeq[String](0)
    assert(sh == Seq("a b", "b c"))
    assert(spark.sql("SELECT epoch_micros(TIMESTAMP '1970-01-01 00:00:01') AS e")
      .head().getLong(0) == 1000000L)
    assert(spark.sql("SELECT morton(0L, 0L) AS m").head().getLong(0) == 0L)
    // literal-parameter contract fails loud
    val e = intercept[Exception] {
      spark.sql("SELECT s, n FROM (SELECT 'x' AS s, 2 AS n)")
        .selectExpr("char_ngram_counts(s, n)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
    // session-3 kernels: JL projection + unicode normalization
    val rp = spark.sql(
      "SELECT random_project(array(1.0D, 2.0D, 3.0D), 4, 42) AS p").head()
      .getSeq[Double](0)
    assert(rp.length == 4)
    val rp2 = spark.sql(
      "SELECT random_project(array(1.0D, 2.0D, 3.0D), 4, 42) AS p").head()
      .getSeq[Double](0)
    assert(rp == rp2, "same seed → same projection via SQL")
    assert(spark.sql("SELECT unicode_normalize('cafe\u0301', 'NFC') AS s")
      .head().getString(0) == "caf\u00E9")
    val e2 = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
    assert(e2.getMessage != null)
  }

  test("rule is idempotent across optimizer fixpoint (results stable, one rewrite)") {
    spark.conf.set(WidthConf, "16")
    try {
      val q = naive
      val optimized = q.queryExecution.optimizedPlan.toString
      // exactly one bucketed join layer: the __bin key appears, and no
      // nested second rewrite stacked another sequence/explode on top
      assert(optimized.contains("__bin"), optimized.take(2000))
      assert(q.count() == naive.count())
    } finally spark.conf.unset(WidthConf)
  }
}
