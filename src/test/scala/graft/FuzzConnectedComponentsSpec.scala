package graft

import org.apache.spark.sql.functions._

import graft.operators.{Create, Dedup}

/** Randomized differential for the distributed connected-components loop
  * (Dedup.nearDupClusters' alternating large-star/small-star rounds —
  * Kiveris et al., SoCC'14): DedupSimilaritySpec pins a chain, a clique
  * seed, and the throw contract on hand-picked graphs, but the star
  * alternation plus its fixpoint test (count equality + one set
  * difference, both frames distinct by construction) is exactly the kind
  * of logic a hand corpus under-covers — a wrong convergence test returns
  * MID-FLIGHT labels, the one failure mode a dedup pipeline can never
  * detect downstream.
  *
  * Each trial builds a random graph from adversarial ingredients (dense
  * near-cliques like the sf1 candidate graph, long chains that maximize
  * rounds, stars, random sparse edges, duplicate + swapped + self-loop
  * edges) and compares the distributed path (localThreshold = 0) against
  * an independent plain-Scala union-find — per-node labels must match
  * EXACTLY, cluster id = component minimum. One trial re-checks the
  * driver union-find fast path and the string-id distributed path against
  * the same reference.
  *
  * Sensitivity proven at bring-up by two ENGINE plants, each caught and
  * reverted: (1) convergence on count equality alone (except dropped) —
  * caught at trial 2, a round that rewires parents while holding edge
  * count constant returns mid-flight labels; (2) large-star's attachment
  * minimum computed over neighbors only (self dropped from the least) —
  * caught at trial 0, every node self-labels. Two further candidate
  * plants turned out NOT to be bugs and were discarded rather than
  * claimed: relaxing large-star's strict `dst > src` to `>=` and
  * re-parenting small-star onto the MAX smaller neighbor both still
  * converge to min-rooted stars (large-star alone drives the minimum,
  * and min-rooted star forests are the only stable fixpoints), which the
  * fuzzer correctly reports as equivalent.
  */
class FuzzConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private val Seed = sys.env.getOrElse("SPARK_GRAFT_FUZZ_SEED", "20260815").toLong
  private val N = sys.env.getOrElse("SPARK_GRAFT_CCFUZZ_N", "6").toInt

  /** Independent reference: plain union-find with union-by-min root. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
  }

  private def randomGraph(rnd: scala.util.Random): Seq[(Long, Long)] = {
    val edges = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var nextId = 0L
    def fresh(n: Int): Seq[Long] = { val ids = (nextId until nextId + n); nextId += n; ids }
    // 2-4 components of random shape; id ranges interleave via shuffling below
    (0 until 2 + rnd.nextInt(3)).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 => // dense near-clique (the sf1 candidate-graph shape)
          val ids = fresh(4 + rnd.nextInt(8))
          for (a <- ids; b <- ids if a < b && rnd.nextDouble() < 0.7) edges += ((a, b))
          // guarantee connectivity even if the 0.7 coin isolated a node
          ids.sliding(2).foreach { case Seq(a, b) => edges += ((a, b)); case _ => }
        case 1 => // chain — maximizes contraction rounds
          val ids = fresh(8 + rnd.nextInt(40))
          ids.sliding(2).foreach { case Seq(a, b) => edges += ((a, b)); case _ => }
        case 2 => // star hub (hot representative)
          val ids = fresh(5 + rnd.nextInt(15))
          ids.tail.foreach(x => edges += ((ids.head, x)))
        case _ => // sparse random connected blob
          val ids = fresh(6 + rnd.nextInt(12))
          ids.sliding(2).foreach { case Seq(a, b) => edges += ((a, b)); case _ => }
          (0 until ids.size).foreach { _ =>
            val a = ids(rnd.nextInt(ids.size)); val b = ids(rnd.nextInt(ids.size))
            if (a != b) edges += ((a, b))
          }
      }
    }
    // dirty the edge list: duplicates, swapped orientations, self-loops —
    // both on connected nodes AND on fresh ISOLATED nodes whose only pair
    // is the self-pair (they must still appear in the output, labeled by
    // themselves; r13's self-loop filter silently dropped them)
    val loners = fresh(1 + rnd.nextInt(3)).map(x => (x, x))
    val clean = edges.toSeq
    val dirty = clean ++
      rnd.shuffle(clean).take(clean.size / 4) ++
      rnd.shuffle(clean).take(clean.size / 4).map(_.swap) ++
      clean.take(3).map(e => (e._1, e._1)) ++
      loners
    // permute ids so component minima aren't clustered at low ranges
    val perm = rnd.shuffle((0L until nextId).toVector)
    rnd.shuffle(dirty.map { case (a, b) => (perm(a.toInt), perm(b.toInt)) })
  }

  test(s"$N random graphs: distributed star rounds == union-find labels (seed=$Seed)") {
    val rnd = new scala.util.Random(Seed)
    (0 until N).foreach { trial =>
      val edges = randomGraph(rnd)
      val expected = unionFind(edges)
      val pairs = Create.of(spark, edges).toDF("id_a", "id_b")
      val got = Dedup.nearDupClusters(pairs, col("id_a"), col("id_b"),
          maxIter = 20, localThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected,
        s"trial=$trial: distributed labels diverge from union-find " +
        s"(edges=${edges.size}, nodes=${expected.size}); " +
        s"diff=${(got.toSet diff expected.toSet).take(5)} / ${(expected.toSet diff got.toSet).take(5)}")
      // non-vacuity: real multi-node components exist
      assert(expected.values.toSet.size < expected.size)
    }
  }

  test(s"$N random graphs through a forced mid-loop cutover at random contraction points") {
    // The dense-graph test below pins the cutover's headline shape (one
    // round contracts under the threshold); this trial set re-runs the
    // same adversarial shapes — chains contract SLOWLY, so the cutover
    // fires after several rounds — with a threshold drawn uniformly from
    // [fixpoint edge count, initial distinct edge count), i.e. every
    // admissible cutover stage. Labels must match union-find exactly
    // regardless of which round hands off to the driver.
    val rnd = new scala.util.Random(Seed + 3)
    var exercised = 0
    (0 until N).foreach { trial =>
      val edges = randomGraph(rnd)
      val expected = unionFind(edges)
      // entry gate counts DIRECTED distinct non-self pairs; the star
      // fixpoint carries exactly (nodes - components) edges
      val initCount = edges.filter(e => e._1 != e._2).distinct.size
      val fixCount = expected.size - expected.values.toSet.size
      if (fixCount < initCount) {
        val threshold = (fixCount + rnd.nextInt(initCount - fixCount)).toLong
        val pairs = Create.of(spark, edges).toDF("id_a", "id_b")
        val got = Dedup.nearDupClusters(pairs, col("id_a"), col("id_b"),
            maxIter = 20, localThreshold = threshold)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected,
          s"trial=$trial threshold=$threshold (init=$initCount fix=$fixCount): " +
          s"cutover labels diverge from union-find; " +
          s"diff=${(got.toSet diff expected.toSet).take(5)} / ${(expected.toSet diff got.toSet).take(5)}")
        exercised += 1
      }
    }
    assert(exercised > 0, "no trial had room between fixpoint and initial edge counts")
  }

  test("mid-loop cutover: dense graph enters distributed, finishes on the driver, labels exact") {
    val rnd = new scala.util.Random(Seed + 2)
    // dense components: initial distinct edge count far exceeds the node
    // count, so one star round contracts below the threshold and the loop
    // hands the contracted graph to the driver union-find
    val edges = (0 until 3).flatMap { c =>
      val ids = (c * 40L until c * 40L + 30L)
      for (a <- ids; b <- ids if a < b && rnd.nextDouble() < 0.6) yield (a, b)
    }
    val expected = unionFind(edges)
    val threshold = edges.map(e => Set(e)).reduce(_ ++ _).size / 3 // < initial distinct edges, > ~90 contracted
    val pairs = Create.of(spark, edges).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(pairs, col("id_a"), col("id_b"),
        maxIter = 20, localThreshold = threshold.toLong)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("local fast path and string-id distributed path agree with union-find") {
    val rnd = new scala.util.Random(Seed + 1)
    val edges = randomGraph(rnd)
    val expected = unionFind(edges)
    val pairs = Create.of(spark, edges).toDF("id_a", "id_b")
    val local = Dedup.nearDupClusters(pairs, col("id_a"), col("id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expected)
    // string ids through all three paths — local entry gate (default
    // threshold), forced distributed (threshold 0), and a mid-loop cutover
    // (threshold between fixpoint and initial edge counts); labels must be
    // the component minimum under STRING ordering, which zero-padded
    // rendering makes agree with numeric ordering
    val sExpected = expected.map { case (k, v) => (f"d$k%06d", f"d$v%06d") }
    val spairs = Create.of(spark, edges.map { case (a, b) => (f"d$a%06d", f"d$b%06d") })
      .toDF("id_a", "id_b")
    def srun(threshold: Long) =
      Dedup.nearDupClusters(spairs, col("id_a"), col("id_b"),
          maxIter = 20, localThreshold = threshold)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(srun(1000000L) == sExpected, "string local entry gate")
    assert(srun(0L) == sExpected, "string distributed path")
    val initCount = edges.filter(e => e._1 != e._2).distinct.size
    val fixCount = expected.size - expected.values.toSet.size
    assert(fixCount < initCount, "trial graph leaves no cutover room")
    assert(srun(fixCount.toLong) == sExpected, "string mid-loop cutover")
  }

  test("a node whose ONLY candidate pair is a self-pair survives on every path") {
    // the r13 regression: filtering self-loops before deriving the node
    // set dropped doc 99 (self-pair only) from the output entirely
    val edges = Seq((1L, 2L), (2L, 3L), (99L, 99L), (1L, 1L))
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 99L -> 99L)
    val pairs = Create.of(spark, edges).toDF("id_a", "id_b")
    def run(threshold: Long) =
      Dedup.nearDupClusters(pairs, col("id_a"), col("id_b"),
          maxIter = 10, localThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1000000L) == expected, "driver union-find entry gate")
    assert(run(0L) == expected, "distributed star rounds")
    // string-id variant through the entry gate (separate collect path)
    val spairs = Create.of(spark, edges.map { case (a, b) => (s"d$a", s"d$b") })
      .toDF("id_a", "id_b")
    val sGot = Dedup.nearDupClusters(spairs, col("id_a"), col("id_b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sGot == expected.map { case (k, v) => (s"d$k", s"d$v") })
  }

  test("string ids with supplementary characters: driver order matches Spark's byte order") {
    // U+1F600 encodes as UTF-8 bytes F0 9F 98 80 — ABOVE "￿" (EF BF
    // BF) in the unsigned byte order Spark's least()/min() use, but BELOW
    // it as UTF-16 code units (D83D < FFFF), java.lang.String's natural
    // order. A driver union-find ranking by String order would elect the
    // emoji as this component's minimum; the distributed path elects
    // "￿". Both paths must agree — on the byte order.
    val emoji = "😀"
    val edges = Seq((emoji, "￿"), ("b", "a"))
    val pairs = Create.of(spark, edges).toDF("id_a", "id_b")
    def run(threshold: Long) =
      Dedup.nearDupClusters(pairs, col("id_a"), col("id_b"),
          maxIter = 10, localThreshold = threshold)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = Map(emoji -> "￿", "￿" -> "￿", "a" -> "a", "b" -> "a")
    assert(run(0L) == expected, "distributed path (ground truth: Spark byte order)")
    assert(run(1000000L) == expected, "driver union-find must match the byte order")
  }
}
