package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Mixing, Similarity}

/** Round-10 session-3 operators: mixture-targeted domain resampling,
  * deterministic hash splits, incremental MinHash-LSH, JL random
  * projection, and the centroid-distance outlier screen. */
class MixingSpec extends SparkSpec {

  import spark.implicits._

  // 3 domains with token masses 60 / 30 / 10 (6 docs of 10 tokens, etc.)
  private lazy val docs = {
    val rows = (0 until 6).map(i => (i.toLong, "a", 10L)) ++
      (6 until 9).map(i => (i.toLong, "b", 10L)) ++
      Seq((9L, "c", 10L))
    rows.toDF("doc_id", "domain", "tok")
  }

  test("epochPlan: exact targets, floors, and fractional parts") {
    // budget 100, weights a=50 b=30 c=20 → targets 50/30/20 over masses
    // 60/30/10 → rates 0.8333 / 1.0 / 2.0
    val plan = Mixing.epochPlan(docs, col("domain"), col("tok"),
      Map("a" -> 50.0, "b" -> 30.0, "c" -> 20.0), budgetTokens = 100L)
      .sortBy(_._1)
    assert(plan.map(p => (p._1, p._2, p._4)) ==
      Seq(("a", 0, 50L), ("b", 1, 30L), ("c", 2, 20L)))
    assert(math.abs(plan(0)._3 - 50.0 / 60.0) < 1e-12) // frac a
    assert(math.abs(plan(1)._3 - 0.0) < 1e-12)         // b exactly 1 epoch
    assert(math.abs(plan(2)._3 - 0.0) < 1e-12)         // c exactly 2 epochs
  }

  test("epochPlan: unlisted domains dropped; absurd upsampling fails loud") {
    val plan = Mixing.epochPlan(docs, col("domain"), col("tok"),
      Map("a" -> 1.0), budgetTokens = 30L)
    assert(plan.map(_._1) == Seq("a"))
    val e = intercept[IllegalArgumentException] {
      Mixing.epochPlan(docs, col("domain"), col("tok"),
        Map("c" -> 1.0), budgetTokens = 10000L) // rate 1000 on domain c
    }
    assert(e.getMessage.contains("maxEpochs"))
  }

  test("applyPlan: whole epochs are exact copies, epoch numbered 1..n") {
    // frac = 0 everywhere → deterministic copy counts regardless of seed
    val plan = Seq(("a", 2, 0.0, 120L), ("b", 1, 0.0, 30L)) // c absent → dropped
    val out = Mixing.applyPlan(docs, col("domain"), col("doc_id"), plan)
    val byDomain = out.groupBy(col("domain")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain == Map("a" -> 12L, "b" -> 3L))
    val epochs = out.filter(col("doc_id") === 0L).select(col("epoch"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(epochs == Seq(1, 2))
  }

  test("mixToWeights: deterministic across runs; achieved mass near target") {
    val weights = Map("a" -> 40.0, "b" -> 40.0, "c" -> 20.0)
    def run() = Mixing.mixToWeights(docs, col("domain"), col("doc_id"),
      col("tok"), weights, budgetTokens = 90L, seed = 3L)
      .select(col("doc_id"), col("domain"), col("epoch"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    assert(run() == run())
  }

  test("hashSplit: total, disjoint, deterministic, append-stable") {
    val many = (0L until 500L).map(i => Tuple1(i)).toDF("id")
    val s1 = Mixing.hashSplit(many, col("id"),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), seed = 5L)
    assert(s1.count() == 500L) // exactly one split per row (total)
    val m1 = s1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m1.size == 500)
    // append-stability: doubling the corpus never changes an old doc's split
    val bigger = (0L until 1000L).map(i => Tuple1(i)).toDF("id")
    val m2 = Mixing.hashSplit(bigger, col("id"),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), seed = 5L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L until 500L).forall(i => m1(i) == m2(i)))
    // rates in the right ballpark on 500 rows
    val counts = m1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 330 && counts("val") < 110 && counts("test") < 110)
    // fractions must sum to 1
    val e = intercept[IllegalArgumentException] {
      Mixing.hashSplit(many, col("id"), Seq(("a", 0.5), ("b", 0.4)))
    }
    assert(e.getMessage.contains("sum to 1"))
  }

  test("minHashIncremental: corpus dup, intra-batch dup, fresh + short docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different corpus content about spark engines here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // = corpus 1
      (11L, "brand new unseen web document with novel words entirely"),
      (12L, "brand new unseen web document with novel words entirely"), // = 11
      (13L, "too short") // < 3 words → no shingles → keep
    ).toDF("doc_id", "text")
    val store = Dedup.minHashStore(corpus, col("text"), col("doc_id"), 3, 4)
    val out = Dedup.minHashIncremental(batch, col("text"), col("doc_id"), store, 3, 4)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3))).sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, Some(1L), None, false),
      (11L, None, None, true),
      (12L, None, Some(11L), false),
      (13L, None, None, true)))
  }

  test("compactStore: the digest store stays O(live corpus) across increments " +
      "with retirements, and retired content is correctly forgotten") {
    // N-increment lifecycle probe (r11 verdict item 5): each round admits
    // a batch against the store, appends the keepers' digest rows, then
    // retires some docs and compacts. Invariants per round:
    //  1. store rows == live unique contents (O(live), not O(ever-seen))
    //  2. a new doc duplicating LIVE content is rejected
    //  3. a new doc duplicating RETIRED content is ADMITTED (forgotten)
    def digestsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), md5(col("text")).as("content_hash"))
    var live = (0 until 6).map(i => (i.toLong, s"seed document number $i unique content")).toMap
    var store = digestsOf(live.toSeq.toDF("doc_id", "text"))
      .select(col("content_hash"), col("doc_id").as("corpus_rep"))
    var retiredContent: Option[String] = None // one content retired LAST round
    for (round <- 1 to 4) {
      val base = round * 100L
      val someLiveText = live(live.keys.min)
      val batch = Seq(
        (base, s"fresh content of round $round entirely new"),
        (base + 1, someLiveText), // dup of LIVE content → reject
        (base + 2, s"fresh content of round $round entirely new") // intra-batch dup
      ) ++ retiredContent.map(t => (base + 3, t)).toSeq // retired last round → admit
      val verdicts = Dedup.exactIncremental(
        batch.toDF("doc_id", "text"), col("text"), col("doc_id"), store)
        .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      assert(!verdicts(base + 1), s"round $round: live-content dup must be rejected")
      assert(!verdicts(base + 2), s"round $round: intra-batch dup must be rejected")
      assert(verdicts(base), s"round $round: fresh content must be admitted")
      if (retiredContent.nonEmpty) assert(verdicts(base + 3),
        s"round $round: RETIRED content must be admitted again (forgetting works)")
      // append keepers, then retire: the previous round's fresh doc AND
      // one seed doc leave the corpus
      val kept = batch.filter { case (id, _) => verdicts(id) }
      live = live ++ kept.toMap
      store = store.unionByName(digestsOf(kept.toDF("doc_id", "text"))
        .select(col("content_hash"), col("doc_id").as("corpus_rep")))
      val retire: Set[Long] = Set(live.keys.min)
      retiredContent = Some(live(live.keys.min))
      live = live -- retire
      store = Dedup.compactStore(store, col("corpus_rep"),
        live.keys.toSeq.toDF("id"), col("id"))
      // invariant 1: O(live) — one row per live unique content
      val liveContents = live.values.toSet.size
      assert(store.count() == liveContents,
        s"round $round: store ${store.count()} rows vs $liveContents live contents")
    }
    // TTL variant: stamped rows at-or-after the cutoff survive, zero-shuffle
    val stamped = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("corpus_rep", "content_hash", "appended_at")
    val ttl = Dedup.compactStoreTtl(stamped, col("appended_at"), 20L)
    assert(ttl.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(!ttl.queryExecution.executedPlan.toString.contains("Exchange"),
      "TTL compaction must be a row-local filter (no shuffle)")
  }

  test("incremental exact dedup over ordered chunks converges to the batch exact() answer") {
    // equivalence property tying the incremental family to its batch
    // semantics: processing an id-ordered corpus chunk by chunk through
    // exactIncremental (appending each chunk's keepers to the store) must
    // keep exactly the docs batch exact() elects as representatives
    // (min-id per content — first arrival under id-ordered chunks)
    val rnd = new scala.util.Random(20260814L)
    val pool = (0 until 80).map(i => s"unique document body number $i with words")
    val corpus = (0 until 200).map(i => (i.toLong, pool(rnd.nextInt(pool.size))))
    val batchReps = graft.operators.Dedup.exact(
      corpus.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .select(col("rep_id")).collect().map(_.getLong(0)).toSet
    var store = Seq.empty[(String, Long)].toDF("content_hash", "corpus_rep")
    val incKept = scala.collection.mutable.Set.empty[Long]
    corpus.grouped(50).foreach { chunk =>
      val verdicts = graft.operators.Dedup.exactIncremental(
        chunk.toDF("doc_id", "text"), col("text"), col("doc_id"), store)
        .select(col("doc_id"), col("content_hash"), col("keep")).collect()
      val keepers = verdicts.filter(_.getBoolean(2))
      incKept ++= keepers.map(_.getLong(0))
      store = store.unionByName(keepers.map(r =>
        (r.getString(1), r.getLong(0))).toSeq.toDF("content_hash", "corpus_rep"))
    }
    assert(incKept.toSet == batchReps,
      s"incremental kept ${incKept.size} vs batch ${batchReps.size}; " +
        s"inc-only ${(incKept.toSet -- batchReps).take(5)}, " +
        s"batch-only ${(batchReps -- incKept).take(5)}")
  }

  test("compactStore on the LSH band store: retiring a doc frees its buckets") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different corpus content about spark engines here")
    ).toDF("doc_id", "text")
    val store = Dedup.minHashStore(corpus, col("text"), col("doc_id"), 3, 4)
    val batch = Seq((10L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    // against the full store: near-dup of doc 1 → rejected
    val before = Dedup.minHashIncremental(batch, col("text"), col("doc_id"), store, 3, 4)
      .collect().head
    assert(!before.getBoolean(3))
    // retire doc 1, compact on the owner id, re-probe: admitted
    val compacted = Dedup.compactStore(store, col("corpus_rep"),
      Seq(2L).toDF("id"), col("id"))
    val after = Dedup.minHashIncremental(batch, col("text"), col("doc_id"), compacted, 3, 4)
      .collect().head
    assert(after.getBoolean(3),
      "a near-dup of a RETIRED doc must be admitted after compaction")
  }

  test("randomProject: dims, seed determinism, exact 2x homogeneity, " +
       "different seed → different space, null element poisons the row") {
    val vs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(-1.0f, 0.5f, 0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val p1 = Similarity.randomProject(vs, col("vec_id"), col("embedding"), 8, 9L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1.values.forall(_.length == 8))
    val p1b = Similarity.randomProject(vs, col("vec_id"), col("embedding"), 8, 9L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 == p1b)
    val pOther = Similarity.randomProject(vs, col("vec_id"), col("embedding"), 8, 10L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 != pOther)
    // exact homogeneity: scaling input by 2 scales output by exactly 2
    val doubled = vs.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val p2 = Similarity.randomProject(doubled, col("vec_id"), col("embedding"), 8, 9L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p2(1L) == p1(1L).map(_ * 2.0))
    // null element → null projection (family convention)
    val withNull = Seq((3L, Seq[java.lang.Float](1.0f, null, 2.0f)))
      .toDF("vec_id", "embedding")
    val pn = Similarity.randomProject(withNull, col("vec_id"), col("embedding"), 4, 9L)
      .collect()
    assert(pn.length == 1 && pn(0).isNullAt(1))
  }

  test("randomProject: non-finite element fails loud") {
    val bad = Seq((1L, Seq(1.0f, Float.NaN))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.randomProject(bad, col("vec_id"), col("embedding"), 4, 1L).collect()
    }
    assert(e.getMessage != null)
  }

  test("keySkewProfile: exact counts, shares, entropy; top-N total order") {
    import graft.operators.Aggregates
    // 6×a, 3×b, 1×c → shares .6/.3/.1, entropy = -(.6 ln .6 + .3 ln .3 + .1 ln .1)
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .zipWithIndex.map(_.swap).toDF("i", "k")
    val rows = Aggregates.keySkewProfile(df, col("k"), topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    val expEntropy = BigDecimal(-(0.6 * math.log(0.6) + 0.3 * math.log(0.3)
      + 0.1 * math.log(0.1))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.toSeq == Seq(("a", 6L, 0.6, 3L, expEntropy),
      ("b", 3L, 0.3, 3L, expEntropy)))
  }

  test("snapshotDiff: all four verdicts from a keyed digest join") {
    import graft.operators.Dedup
    val oldSnap = Seq((1L, "same"), (2L, "old text"), (3L, "gone"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "new text"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(oldSnap, newSnap, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("kmvSketch/kmvJaccard: identical corpora → 1, disjoint → 0, bounded size") {
    import graft.operators.Dedup
    val a = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val b = Seq((10L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val c = Seq((20L, "totally different words with zero overlap here")).toDF("doc_id", "text")
    def sk(df: org.apache.spark.sql.DataFrame) =
      Dedup.kmvSketch(df, col("text"), col("doc_id"), 3, 16)
    assert(sk(a).count() <= 16)
    // b's shingles ⊂ a's: J(a,b) = |b|/|a| over shingle sets (4 of 9)
    val jab = Dedup.kmvJaccard(sk(a), sk(b), 16).collect().head
    assert(jab.getLong(1) <= 16)
    assert(math.abs(jab.getDouble(0) - 4.0 / 9.0) < 1e-6, // j_est is 6-dp rounded
      s"small sets fit in k → estimate is exact, got ${jab.getDouble(0)}")
    val jac = Dedup.kmvJaccard(sk(a), sk(c), 16).collect().head
    assert(jac.getDouble(0) == 0.0)
    val jaa = Dedup.kmvJaccard(sk(a), sk(a), 16).collect().head
    assert(jaa.getDouble(0) == 1.0)
  }

  test("cooccurrence: distinct-per-doc pairs, support threshold, stop-word cap") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "apple banana apple cherry"),  // distinct: apple banana cherry
      (2L, "apple banana"),
      (3L, "apple cherry the the the"),   // 'the' only here — still under cap
      (4L, "banana cherry")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrence(docs, col("text"), col("doc_id"),
        minSupport = 2L, maxWordFreq = 100L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // apple+banana in docs 1,2; apple+cherry in 1,3; banana+cherry in 1,4
    assert(got == Map(("apple", "banana") -> 2L, ("apple", "cherry") -> 2L,
      ("banana", "cherry") -> 2L), got.toString)
    // cap = 2: 'apple' (3 docs) and 'cherry' (3 docs) drop BEFORE pairing
    val capped = TextAnalysis.cooccurrence(docs, col("text"), col("doc_id"),
        minSupport = 1L, maxWordFreq = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped.forall { case (a, b) =>
      !Set(a, b).contains("apple") && !Set(a, b).contains("cherry") }, capped.toString)
  }

  test("centroidOutliers: planted far point flagged, separation invariant holds") {
    // one tight cluster + one far-off-axis point
    val rows = (0L until 40L).map { i =>
      val eps = 0.002f * (i % 7)
      (i, Seq(1.0f, eps, 0.0f))
    } :+ (99L, Seq(0.1f, 1.0f, 0.5f))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, col("vec_id"), col("embedding"),
      k = 1, iters = 1, flagFraction = 0.05)
    val rowsOut = out.collect().map(r =>
      (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(rowsOut.length == 41)
    val planted = rowsOut.find(_._1 == 99L).get
    assert(planted._3, s"planted outlier not flagged: $planted")
    // separation: every flagged dist > every kept dist within the one cell
    val (flagged, kept) = rowsOut.partition(_._3)
    assert(flagged.map(_._2).min > kept.map(_._2).max)
    // dist is a cosine distance
    assert(rowsOut.forall(r => r._2 >= -1e-9 && r._2 <= 2.0 + 1e-9))
  }
}
