package graft

import graft.functions._

import scala.util.Random

/** Algebraic laws for every CombineFn — the reference's CombineFnTester
  * contract (reference: SDK/testing/CombineFnTester.java: result must not
  * depend on input order or on how inputs are sharded into accumulators).
  * Seeded random cases (no scalatestplus bridge in the offline cache). */
class CombineFnLawsSpec extends SparkSpec {

  /** Apply fn over inputs split into `shards` accumulators, merged pairwise
    * in sequence — any shard/merge plan must give one result. */
  private def run[IN, ACC, OUT](fn: CombineFn[IN, ACC, OUT], inputs: Seq[IN], shards: Int): OUT = {
    val groups = if (inputs.isEmpty) Seq(Seq.empty[IN])
      else inputs.grouped(math.max(1, math.ceil(inputs.size.toDouble / shards).toInt)).toSeq
    val accs = groups.map(g => g.foldLeft(fn.createAccumulator())(fn.addInput))
    fn.extractOutput(accs.reduce(fn.mergeAccumulators))
  }

  /** 100 seeded cases: random input list, random shard count, random
    * permutation — sequential single-accumulator result must match. */
  private def lawCheck[IN, ACC, OUT](fn: CombineFn[IN, ACC, OUT], gen: Random => IN): Unit = {
    val rnd = new Random(20260812L)
    (1 to 100).foreach { i =>
      val xs = List.fill(rnd.nextInt(40))(gen(rnd))
      val shards = 1 + rnd.nextInt(7)
      val shuffled = rnd.shuffle(xs)
      assert(run(fn, xs, 1) == run(fn, shuffled, shards),
        s"case $i: order/shard dependence for input $xs")
    }
  }

  test("MeanFn is shard- and order-insensitive (integral doubles: exact)") {
    lawCheck(new MeanFn, r => (r.nextInt(2001) - 1000).toDouble)
  }

  test("TopKCombineFn(k) is shard- and order-insensitive") {
    lawCheck(new TopKCombineFn[Int](3), r => r.nextInt(101) - 50)
  }

  test("TopKCombineFn returns k best, best-first") {
    val fn = new TopKCombineFn[Int](3)
    assert(run(fn, Seq(5, 1, 9, 7, 3), 2) == List(9, 7, 5))
    assert(run(fn, Seq(1), 1) == List(1))
    assert(run(fn, Seq.empty[Int], 1) == List())
  }

  test("ReservoirSampleFn is deterministic under sharding/order and exact-size") {
    lawCheck(new ReservoirSampleFn[Int](5, seed = 7L), r => r.nextInt(10000))
    val fn = new ReservoirSampleFn[Int](5, seed = 7L)
    assert(run(fn, 1 to 100, 4).size == 5)
    assert(run(fn, 1 to 3, 2).toSet == Set(1, 2, 3))
  }

  test("ReservoirSampleFn different seeds draw different samples") {
    val a = run(new ReservoirSampleFn[Int](5, 1L), 1 to 1000, 3)
    val b = run(new ReservoirSampleFn[Int](5, 2L), 1 to 1000, 3)
    assert(a != b)
  }

  test("ReservoirSampleFn sample is roughly uniform (chi-square sanity)") {
    // sample 10 of 0..99, 200 seeds; each element should be drawn ~20 times
    val counts = new Array[Int](100)
    (0 until 200).foreach { s =>
      run(new ReservoirSampleFn[Int](10, s.toLong), 0 until 100, 4).foreach(counts(_) += 1)
    }
    assert(counts.forall(c => c > 2 && c < 60), s"skewed sample: ${counts.toList}")
  }

  test("ApproximateUniqueFn: shard/order-insensitive; exact below sample size; ~accurate above") {
    lawCheck(new ApproximateUniqueFn[Int](16), r => r.nextInt(500))
    val fn = new ApproximateUniqueFn[Int](64)
    // below sample size: exact
    assert(run(fn, (1 to 50) ++ (1 to 50), 3) == 50L)
    // above: within the KMV error envelope (~2/sqrt(64) = 25%)
    val est = run(fn, 1 to 10000, 5)
    assert(est > 7000 && est < 13000, s"estimate $est for true 10000")
  }

  test("ApproximateUniqueFn: merge-heavy sharding — many singleton accumulators " +
      "merged in random order equal the one-shot estimate (r9 array-accumulator rewrite)") {
    // adversarial for the array rewrite: every accumulator holds exactly one
    // hash, so EVERY insert during the merge phase exercises the
    // binary-search + arraycopy path rather than the steady-state rejection
    val fn = new ApproximateUniqueFn[Int](32)
    val rnd = new Random(20260813L)
    (1 to 20).foreach { i =>
      val xs = List.fill(50 + rnd.nextInt(400))(rnd.nextInt(300))
      val oneShot = run(fn, xs, 1)
      // one accumulator per element, merged pairwise in a shuffled order
      val singletons = rnd.shuffle(xs).map(x => fn.addInput(fn.createAccumulator(), x))
      val merged = fn.extractOutput(singletons.reduce(fn.mergeAccumulators))
      assert(merged == oneShot, s"case $i: merge-heavy $merged != one-shot $oneShot")
    }
    // degenerate sampleSize is a loud constructor error, not a runtime AIOOBE
    val e = intercept[IllegalArgumentException](new ApproximateUniqueFn[Int](0))
    assert(e.getMessage.contains("sampleSize"))
  }

  test("BottomKDistinctFn: shard/order-insensitive; k smallest distinct, sorted") {
    lawCheck(new BottomKDistinctFn(4), r => r.nextInt(30).toString)
    val fn = new BottomKDistinctFn(3)
    // dedups, sorts lexicographically, caps at k
    assert(run(fn, Seq("d", "b", "b", "a", "c", "a"), 2) == Seq("a", "b", "c"))
    // below k: everything, still sorted + distinct
    assert(run(fn, Seq("x", "x", "m"), 3) == Seq("m", "x"))
    assert(run(fn, Seq.empty[String], 1) == Seq.empty)
    // merge-heavy: singleton accumulators merged in shuffled order — every
    // merge insert exercises binary-search + arraycopy, result must match
    // the one-shot accumulation (mirrors the ApproximateUniqueFn pin)
    val rnd = new Random(20260816L)
    (1 to 20).foreach { i =>
      val xs = List.fill(30 + rnd.nextInt(200))(rnd.nextInt(80).toString)
      val oneShot = run(fn, xs, 1)
      val singletons = rnd.shuffle(xs).map(x => fn.addInput(fn.createAccumulator(), x))
      val merged = fn.extractOutput(singletons.reduce(fn.mergeAccumulators))
      assert(merged == oneShot, s"case $i: merge-heavy $merged != one-shot $oneShot")
    }
    // equivalence with the distinct-sort-take formulation it replaces in
    // kmvSketch (the KMV contract: k lexicographically smallest distinct)
    (1 to 20).foreach { i =>
      val xs = List.fill(rnd.nextInt(300))(rnd.nextInt(100).toString)
      val expect = xs.distinct.sorted.take(3)
      assert(run(fn, xs, 1 + rnd.nextInt(6)) == expect, s"case $i vs distinct-sort-take")
    }
    val e = intercept[IllegalArgumentException](new BottomKDistinctFn(0))
    assert(e.getMessage.contains("k >= 1"))
  }

  test("ApproximateQuantilesFn: epsilon accuracy under any sharding/order") {
    val fn = new ApproximateQuantilesFn(numQuantiles = 5, bufferSize = 64)
    val rnd = new Random(7L)
    (1 to 10).foreach { _ =>
      val data = rnd.shuffle((1 to 5000).map(_.toDouble).toList)
      val shards = 1 + rnd.nextInt(8)
      val qs = run(fn, data, shards)
      assert(qs.size == 5)
      assert(qs.head == 1.0 && qs.last == 5000.0, s"min/max exact: $qs")
      // interior quantiles (25/50/75%) within ~5% of true
      Seq(1 -> 1250.0, 2 -> 2500.0, 3 -> 3750.0).foreach { case (i, truth) =>
        assert(math.abs(qs(i) - truth) < 250, s"q$i=${qs(i)} vs $truth in $qs")
      }
    }
    assert(run(fn, Seq.empty[Double], 1) == Nil)
    assert(run(fn, Seq(42.0), 3) == List(42.0, 42.0, 42.0, 42.0, 42.0))
  }

  test("LatestFn picks max-timestamp value, ties to larger value") {
    val fn = new LatestFn[String]
    lawCheck(fn, r => (r.nextInt(20).toLong, r.alphanumeric.take(3).mkString))
    assert(run(fn, Seq((1L, "a"), (9L, "z"), (9L, "b")), 2).contains("z"))
    assert(run(fn, Seq.empty[(Long, String)], 1).isEmpty)
  }

  test("compose2 runs both fns in one pass") {
    val fn = CombineFns.compose2(new MeanFn, new TopKCombineFn[Double](2))
    val (mean, top) = run(fn, Seq(1.0, 2.0, 3.0, 4.0), 2)
    assert(mean == 2.5 && top == List(4.0, 3.0))
  }

  test("compose3 runs three heterogeneous fns in one pass") {
    val fn = CombineFns.compose3(new MeanFn, new TopKCombineFn[Double](1),
      new ApproximateUniqueFn[Double](64))
    val ((mean, top), uniq) = run(fn, Seq(1.0, 2.0, 3.0, 3.0), 2)
    assert(mean == 2.25 && top == List(3.0) && uniq == 3L)
  }

  test("composeAll runs n homogeneous fns in one pass") {
    val fn = CombineFns.composeAll[Int, List[Int], List[Int]](
      Seq(new TopKCombineFn[Int](1), new TopKCombineFn[Int](2)))
    assert(run(fn, Seq(3, 1, 2), 2) == List(List(3), List(3, 2)))
  }

  test("contramap and map adapt input/output sides") {
    val fn = new MeanFn().contramap[(String, Double)](_._2).map(m => m * 10)
    assert(run(fn, Seq(("a", 1.0), ("b", 3.0)), 2) == 20.0)
  }

  test("CombineFnWithContext: aggregator closes over a broadcast side input") {
    // reference: SDK/transforms/CombineWithContext.java — a CombineFn that
    // reads a side input; Spark-native form is an Aggregator closure over
    // a broadcast value, applied here through a real distributed agg
    import spark.implicits._
    val factor = spark.sparkContext.broadcast(10.0)
    val fn = new MeanFn().contramap[(String, Double)](_._2).map(m => m * factor.value)
    val out = graft.operators.Create.of(spark, Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)))
      .groupByKey(_._1)
      .agg(fn.asAggregator.toColumn.name("scaled_mean"))
      .collect().toMap
    assert(out == Map("a" -> 20.0, "b" -> 50.0))
  }

  test("MisraGriesFn: exact (= shard/order-insensitive) when distinct ≤ capacity") {
    // below capacity no decrement/truncation ever fires, so the summary is
    // the exact count map — the strong law holds and lawCheck applies
    lawCheck(new MisraGriesFn[Int](10), rnd => rnd.nextInt(8))
  }

  test("MisraGriesFn: theorem invariants under 100 adversarial shard/merge plans") {
    // capacity far below distinct count — decrement (add path) and
    // (k+1)-th-largest truncation (merge path) both fire constantly.
    // Counter values are order-dependent BY DESIGN; what must hold under
    // every plan: ≤ capacity counters, every true heavy hitter present,
    // undercount-only error ≤ N/(capacity+1).
    val capacity = 4
    val fn = new MisraGriesFn[Int](capacity)
    val rnd = new Random(20260814L)
    // skewed universe: item i drawn with weight ~ 1/(i+1)
    def draw(r: Random): Int = {
      val u = r.nextDouble()
      if (u < 0.35) 0 else if (u < 0.55) 1 else if (u < 0.68) 2
      else 3 + r.nextInt(17)
    }
    (1 to 100).foreach { i =>
      val xs = List.fill(200 + rnd.nextInt(200))(draw(rnd))
      val n = xs.size
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = n.toDouble / (capacity + 1)
      val shards = 1 + rnd.nextInt(8)
      val summary = run(fn, rnd.shuffle(xs), shards).toMap
      assert(summary.size <= capacity, s"case $i: ${summary.size} > capacity")
      exact.foreach { case (item, freq) =>
        if (freq > bound)
          assert(summary.contains(item),
            s"case $i: true heavy hitter $item (freq $freq > $bound) missing from $summary")
      }
      summary.foreach { case (item, est) =>
        val freq = exact.getOrElse(item, 0L)
        assert(est <= freq, s"case $i: overestimate $item: $est > $freq")
        assert(freq - est <= bound,
          s"case $i: undercount ${freq - est} > bound $bound for $item")
      }
    }
  }
}
