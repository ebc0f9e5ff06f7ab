package graft

import org.apache.spark.sql.functions._
import graft.operators.{Create, Dedup, Similarity}

/** LLM-pipeline dedup + ANN operators on engineered fixtures. */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private def docs = Create.of(spark, Seq(
    (1L, base),
    (2L, base),                                   // exact dup of 1
    (3L, base + " tonight"),                      // near dup of 1
    (4L, "completely different text about spark catalyst optimization rules"),
    (5L, ""))).toDF("doc_id", "text")

  test("exact dedup groups identical content, min id as representative") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
    val dupGroup = out.filter(col("copies") === 2).collect()
    assert(dupGroup.length == 1 && dupGroup(0).getAs[Long]("rep_id") == 1L)
    assert(out.count() == 4) // 1&2 merged; 3, 4, "" distinct
  }

  test("exactIncremental: corpus dup, intra-batch dup, and fresh content verdicts") {
    val corpus = Create.of(spark, Seq((1L, "seen before"), (2L, "also seen")))
      .toDF("doc_id", "text")
    val store = Dedup.exact(corpus, col("text"), col("doc_id"))
      .select(col("content_hash"), col("rep_id").as("corpus_rep"))
    val batch = Create.of(spark, Seq(
      (10L, "seen before"),   // corpus dup → drop, corpus_rep = 1
      (11L, "brand new"),     // fresh + batch rep → keep
      (12L, "brand new"),     // intra-batch dup of 11 → drop
      (13L, "also new"))).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(batch, col("text"), col("doc_id"), store)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(10L) == ((Some(1L), 10L, false)), out(10L).toString)
    assert(out(11L) == ((None, 11L, true)))
    assert(out(12L) == ((None, 11L, false)), "intra-batch dup must not survive")
    assert(out(13L) == ((None, 13L, true)))
  }

  test("shingles: n-grams of normalized words, distinct, empty-safe") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(sh(1L).contains("the quick brown"))
    assert(sh(1L).size == 10) // 12 words -> 10 trigram windows, all distinct
    assert(sh(5L).isEmpty)
  }

  test("minHashCandidates buckets exact+near dups together") {
    val cands = Dedup.minHashCandidates(docs, col("text"), col("doc_id"),
      shingleN = 3, bands = 8).collect()
    assert(cands.nonEmpty)
    // every bucket holding doc 1 must also hold doc 2 (identical shingles)
    val with1 = cands.filter(_.getSeq[Long](2).contains(1L))
    assert(with1.nonEmpty && with1.forall(_.getSeq[Long](2).contains(2L)))
  }

  test("simHash: identical docs equal; near-dups within small Hamming distance") {
    val fp = Dedup.simHash(docs.filter(length(col("text")) > 0), col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(3L)) <= 16, s"near-dup hamming ${hamming(fp(1L), fp(3L))}")
    assert(hamming(fp(1L), fp(4L)) > hamming(fp(1L), fp(3L)))
  }

  test("ngramJaccardPairs finds engineered near-dups above threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("text"), col("doc_id"),
      shingleN = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L))) // identical: jaccard 1.0
    assert(keys.contains((1L, 3L)) && keys.contains((2L, 3L)))
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
    assert(pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 == 1.0)
  }

  test("nearDupClusters: transitive closure assigns min-id cluster labels (both paths)") {
    // chain 1-2-3-4 (diameter 3) + isolated pair (10, 11)
    val pairs = Create.of(spark, Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)
    val local = Dedup.nearDupClusters(pairs, col("id_a"), col("id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expected)
    // force the distributed large-star/small-star loop (the 100 TB path)
    val distributed = Dedup.nearDupClusters(pairs, col("id_a"), col("id_b"),
        localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == expected)
  }

  test("nearDupClusters: adversarial path graph with diameter >> maxIter converges") {
    // A 64-node chain (diameter 63): the old min-label propagation needed 63
    // rounds; alternating large-star/small-star closes it within the default
    // maxIter=10 because rounds contract the graph in O(log n).
    val chain = Create.of(spark, (0L until 63L).map(i => (i, i + 1)))
      .toDF("id_a", "id_b")
    val out = Dedup.nearDupClusters(chain, col("id_a"), col("id_b"),
        localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 64 && out.values.forall(_ == 0L))
  }

  test("nearDupClusters: throws loudly instead of returning mid-flight labels") {
    // maxIter=1 cannot reach the star fixpoint on a chain — the contract is
    // an actionable IllegalStateException, never silently-wrong cluster ids.
    val chain = Create.of(spark, (0L until 16L).map(i => (i, i + 1)))
      .toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.nearDupClusters(chain, col("id_a"), col("id_b"),
        maxIter = 1, localThreshold = 0L).collect()
    }
    assert(ex.getMessage.contains("maxIter") && ex.getMessage.contains("raise"))
  }

  test("vecDot: NULL on length mismatch or null element (lambda-equivalent)") {
    import graft.expressions.VectorExpressions.vecDot
    val df = Create.of(spark, Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (Seq(1.0f, 2.0f, 9.0f), Seq(3.0f, 4.0f)))).toDF("a", "b")
    val got = df.select(vecDot(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq == Seq(11.0, null))
  }

  test("cosineTopK: self-match scores 1.0 and ranks first") {
    val vecs = Create.of(spark, Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f)))).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(vecs, col("vec_id"), col("embedding"),
      vecs.filter(col("vec_id") === 0L), col("vec_id"), col("embedding"), k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(out.head == ((0L, 1.0)))
    assert(out(1)._1 == 1L)
  }

  test("planesFor: constant expected occupancy, clamped to [1, 62]") {
    import Similarity.planesFor
    assert(planesFor(0) == 1)
    assert(planesFor(64) == 1)            // n == target -> 2^1 buckets min
    assert(planesFor(128) == 1)           // log2(2) = 1
    assert(planesFor(129) == 2)
    assert(planesFor(64L << 20) == 20)    // 64M rows @ target 64 -> 2^20 buckets
    assert(planesFor(Long.MaxValue) == 57)
    assert(planesFor(1000, targetBucketSize = 1) == 10)
    intercept[IllegalArgumentException](planesFor(10, targetBucketSize = 0))
  }

  test("lshTopKAuto derives planes from the corpus count and matches explicit lshTopK") {
    val n = 64
    val vecs = Create.of(spark, (0 until n).map(i =>
      (i.toLong, Seq(math.cos(i * 0.1).toFloat, math.sin(i * 0.1).toFloat, 0.5f))))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0L)
    val auto = Similarity.lshTopKAuto(vecs, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = 3, targetBucketSize = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val explicit = Similarity.lshTopK(vecs, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = 3,
      planes = Similarity.planesFor(n, 8L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == explicit && auto.nonEmpty)
    // self-match survives any bucketing (identical vector, identical bucket)
    assert(auto.exists { case (qid, cid, s) => qid == 0L && cid == 0L && s == 1.0 })
  }

  test("lshTopK includes the self-match (same bucket by construction)") {
    val vecs = Create.of(spark,
      (0L to 20L).map(i => (i, Seq.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs, col("vec_id"), col("embedding"),
      vecs.filter(col("vec_id") === 5L), col("vec_id"), col("embedding"),
      k = 3, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists(r => r._2 == 5L && r._3 == 1.0))
  }

  test("ivfTopK: self-match always found (query's own cell is probed first)") {
    val vecs = Create.of(spark,
      (0L to 40L).map(i => (i, Seq.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)))
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(vecs, col("vec_id"), col("embedding"),
      vecs.filter(col("vec_id") === 5L), col("vec_id"), col("embedding"),
      k = 3, nlist = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists(r => r._2 == 5L && r._3 == 1.0), out.toSeq.toString)
    assert(out.length <= 3)
  }

  test("ivfTopK with nprobe = nlist equals brute-force top-k") {
    val vecs = Create.of(spark,
      (0L to 30L).map(i => (i, Seq.tabulate(6)(d => ((i * 17 + d * 5) % 11 - 5).toFloat)))
    ).toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 3L)
    val brute = Similarity.cosineTopK(vecs, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(vecs, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 4, nlist = 5, nprobe = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == brute, s"ivf=$ivf brute=$brute")
  }

  test("embeddingNearDup finds a planted duplicate pair") {
    val planted = Create.of(spark, Seq(
      (0L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.01f)),   // near-identical direction
      (2L, Seq(-4.0f, 3.0f, -2.0f, 1.0f)))).toDF("id", "vec")
    val out = Dedup.embeddingNearDup(planted, col("id"), col("vec"),
      planes = 4, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((0L, 1L)))
  }

  test("WordShingles native kernel is bit-identical to the lambda specification " +
      "on the real corpus and on edge cases") {
    import org.apache.spark.sql.functions._
    // edge cases: leading/trailing whitespace (empty tokens), repeats
    // (distinct first-occurrence order), fewer words than n, mixed case
    val edge = Seq(Some(" a b"), Some("a  B c a b"), Some("one"), Some(""),
      Some("X y X y X y"), Some("tab\there now"), None)
      .toDF("text")
    val docs = GraftSession.table(spark, "/root/testdata/sf0.01", "documents")
      .select(col("text")).union(edge)
    for (n <- Seq(2, 3)) {
      val diff = docs.select(
          graft.operators.Dedup.shingles(col("text"), n).as("native"),
          graft.operators.Dedup.shinglesLambda(col("text"), n).as("lambda"))
        .filter(not(col("native") <=> col("lambda")))
      assert(diff.isEmpty, s"n=$n first diff: ${diff.take(1).mkString}")
    }
  }

  test("IVF Lloyd refinement: spherical k-means rounds improve the quantization objective") {
    import org.apache.spark.sql.functions._
    val embs = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
    val vecs = embs.select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // mean best-centroid cosine: the spherical k-means objective
    def objective(cents: Array[Array[Double]]): Double =
      vecs.map(v => cents.map(c => cos(v, c)).max).sum / vecs.length
    val seeds = vecs.take(16)
    val r1 = Similarity.lloydRound(embs, col("embedding"), seeds)
    val r2 = Similarity.lloydRound(embs, col("embedding"), r1)
    assert(r1.zip(seeds).exists { case (a, b) => !a.sameElements(b) }, "centroids never moved")
    assert(objective(r1) >= objective(seeds) - 1e-9,
      s"round 1 worsened the objective: ${objective(seeds)} -> ${objective(r1)}")
    assert(objective(r2) >= objective(r1) - 1e-9,
      s"round 2 worsened the objective: ${objective(r1)} -> ${objective(r2)}")
    // the refined index still serves k results per query
    val out = Similarity.ivfTopK(embs, col("vec_id"), col("embedding"),
      embs.filter(col("vec_id") < 3), col("vec_id"), col("embedding"),
      k = 5, nlist = 16, nprobe = 4, lloydIters = 2)
    val perQuery = out.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.length == 3 && perQuery.forall(_ == 5L), perQuery.mkString(","))

    // mixed-norm corpus: the update averages UNIT vectors, so inflating a
    // subset's magnitude 1000x must not break monotone improvement (a
    // raw-vector sum would let the inflated rows steer every centroid)
    val mixed = embs.select(when(col("vec_id") % 7 === 0,
        transform(col("embedding").cast("array<double>"), x => x * 1000.0))
      .otherwise(col("embedding").cast("array<double>")).as("embedding"))
    val mvecs = mixed.collect().map(_.getSeq[Double](0).toArray)
    def mObjective(cents: Array[Array[Double]]): Double =
      mvecs.map(v => cents.map(c => cos(v, c)).max).sum / mvecs.length
    val mSeeds = mvecs.take(16)
    val m1 = Similarity.lloydRound(mixed, col("embedding"), mSeeds)
    val m2 = Similarity.lloydRound(mixed, col("embedding"), m1)
    assert(mObjective(m1) >= mObjective(mSeeds) - 1e-9,
      s"mixed-norm round 1 worsened: ${mObjective(mSeeds)} -> ${mObjective(m1)}")
    assert(mObjective(m2) >= mObjective(m1) - 1e-9,
      s"mixed-norm round 2 worsened: ${mObjective(m1)} -> ${mObjective(m2)}")
  }

  test("bm25TopK: rare terms outrank common, tf saturates, dl normalizes, ties break by id") {
    import graft.operators.Retrieval
    val docs = Seq(
      (1L, "rare common common"),        // one rare hit, short
      (2L, "rare common common common common common common common common"), // rare hit, long
      (3L, "common common"),             // common only
      (4L, "common common"),             // tie with 3
      (5L, "nothing here at all"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, col("text"), col("doc_id"),
      Seq("rare", "common"), k = 4).collect()
    val order = out.map(_.getLong(0)).toSeq
    // doc 1 and 2 both hit "rare" (idf >> "common"); doc 1 is shorter so
    // its dl-normalization boosts it above doc 2; docs 3/4 are identical
    // common-only docs — equal scores, id tiebreak
    assert(order == Seq(1L, 2L, 3L, 4L), order.mkString(","))
    val scores = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(3L) == scores(4L))
    assert(scores(1L) > scores(2L) && scores(2L) > scores(3L))
    // hand-check doc 3: tf(common)=2, dl=2, N=5, df(common)=4, avgdl=4.0
    // idf = ln(1 + (5-4+0.5)/(4+0.5)) = ln(1.3333...); score =
    // idf * 2*2.2 / (2 + 1.2*(0.25 + 0.75*2/4))
    val idf = math.rint(math.log(1.0 + 1.5 / 4.5) * 1e9) / 1e9
    val expected3 = math.rint(idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 2 / 4.0)) * 1e6) / 1e6
    assert(math.abs(scores(3L) - expected3) < 1e-9, s"${scores(3L)} vs $expected3")

    // the batch form agrees with the single-query form query-by-query
    val batch = graft.operators.Retrieval.bm25TopKBatch(docs, col("text"), col("doc_id"),
      Seq((7L, Seq("rare", "common")), (8L, Seq("nothing"))).toDF("query_id", "terms"),
      col("query_id"), col("terms"), k = 4).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(r => (r.getLong(1), r.getDouble(2))).sortBy(-_._2).toSeq }
    assert(batch(7L) == out.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    assert(batch(8L).map(_._1) == Seq(5L)) // only doc 5 contains "nothing"

    // a null element inside a terms array is dropped, not an NPE in the
    // vocab size check — and scores are unchanged vs the null-free query
    val withNull = graft.operators.Retrieval.bm25TopKBatch(docs, col("text"), col("doc_id"),
      Seq((7L, Seq("rare", null, "common"))).toDF("query_id", "terms"),
      col("query_id"), col("terms"), k = 4).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sortBy(-_._2).toSeq
    assert(withNull == batch(7L))
  }

  test("bm25 tokenizes the corpus exactly once (scoring reads the checkpoint)") {
    import graft.operators.Retrieval
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, col("text"), col("doc_id"), Seq("b", "d"), k = 2)
    // the stats/df passes already consumed the localCheckpoint; the final
    // plan must read the checkpointed per-doc reduction, not re-tokenize
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("split("), s"scoring plan re-tokenizes the corpus:\n$plan")
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      s"scoring plan does not read the checkpoint:\n$plan")
  }

  test("semDedup: identical vectors share a cell, min id kept, distinct directions survive") {
    // ids 1/2/3 are the same direction (1,0,...) at different magnitudes —
    // same cell, cosine 1.0 → only id 1 keeps; id 10 is orthogonal.
    val dim = 8
    def v(axis: Int, scale: Double) =
      (0 until dim).map(d => if (d == axis) scale else 0.0)
    val embs = Seq(
      (1L, v(0, 1.0)), (2L, v(0, 0.5)), (3L, v(0, 2.0)),
      (10L, v(1, 1.0)))
      .toDF("id", "vec")
    val out = Similarity.semDedup(embs, col("id"), col("vec"),
      nlist = 4, threshold = 0.95)
    val byId = out.collect().map(r =>
      r.getLong(0) -> ((if (r.isNullAt(2)) None else Some(r.getLong(2))), r.getBoolean(3))).toMap
    assert(byId(1L) == ((None, true)))
    assert(byId(2L) == ((Some(1L), false)))
    assert(byId(3L) == ((Some(1L), false)))
    assert(byId(10L) == ((None, true)))
    // cluster co-location of the duplicate direction
    val cells = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(1L) == cells(2L) && cells(2L) == cells(3L))
  }

  test("semDedup kernel assignment path (nlist > 64) finds every exact-duplicate pair") {
    // 65 orthogonal directions, two vectors each (ids 2k and 2k+1):
    // nlist = 70 forces the NearestCentroidVec kernel argmin (the >64 path;
    // the broadcast-join formulation it replaced OOM'd the r17 sf100
    // probe); identical vectors get identical rounded argmin, so every
    // pair co-locates and the larger id must point at the smaller.
    val dim = 65
    val embs = (0 until 65).flatMap { axis =>
      val v = (0 until dim).map(d => if (d == axis) 1.0 else 0.0)
      Seq((2L * axis, v), (2L * axis + 1, v))
    }.toDF("id", "vec")
    val out = Similarity.semDedup(embs, col("id"), col("vec"),
      nlist = 70, threshold = 0.95)
    assert(out.count() == 130)
    val dropped = out.filter(!col("keep"))
      .select(col("id"), col("dup_of")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dropped == (0 until 65).map(a => (2L * a + 1) -> 2L * a).toMap)
    // auto knob picks a >64 nlist here, exercising the same path
    assert(Similarity.nlistFor(130, targetClusterSize = 2) == 65)
  }

  test("semDedupRecluster: occupancy-right k, same vector set, planted dup still caught") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    // a store that has outgrown its clustering: 600 vectors in k=2 cells
    val rows = (0L until 600L).map(i =>
      (i, (0 until dim).map(_ => rnd.nextDouble() - 0.5)))
    val embs = rows.toDF("id", "vec")
    val cents2 = Similarity.kmeansCentroids(embs, col("id"), col("vec"), k = 2)
    val store2 = Similarity.semDedupStore(embs, col("id"), col("vec"), cents2)
    val (centsK, storeK) = Similarity.semDedupRecluster(store2, targetClusterSize = 50L)
    // k re-derived from the CURRENT store size, not the original corpus
    assert(centsK.length == Similarity.nlistFor(600L, 50L))
    // re-assignment only: the vector population is unchanged
    assert(storeK.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 600L))
    // within-cell occupancy — the per-increment cost driver — actually drops
    def maxCell(s: org.apache.spark.sql.DataFrame) =
      s.groupBy("cell").count().agg(max("count")).head.getLong(0)
    assert(maxCell(storeK) < maxCell(store2))
    // a batch duplicating a stored vector is still caught against the
    // re-clustered store: identical vectors co-locate under ANY k
    val probe = Seq((9999L, rows(123)._2)).toDF("id", "vec")
    val verd = Similarity.semDedupIncremental(probe, col("id"), col("vec"),
      centsK, storeK, threshold = 0.95).collect()
    assert(verd.length == 1 && !verd(0).getBoolean(3) && verd(0).getLong(2) == 123L)
  }

  test("quantizeInt8: full-range mapping, scale/2 reconstruction bound, constant vectors") {
    val vecs = Seq(
      (1L, Array(-2.0f, 0.0f, 1.0f, 3.5f)),
      (2L, Array(7.25f, 7.25f, 7.25f)), // constant → all-zero, scale 0
      (3L, Array(0.001f, -0.001f, 0.5f, -0.5f, 0.25f))).toDF("id", "v")
    val q = vecs.select(col("id"), col("v"),
      graft.operators.Similarity.quantizeInt8(col("v")).as("__q"))
    val rows = q.select(col("id"), col("__q.q"), col("__q.lo"), col("__q.scale"),
        graft.operators.Similarity.dequantizeInt8(col("__q")).as("d"), col("v"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // extremes map to -128 / 127; everything lands in int8
    val q1 = rows(1L).getSeq[Byte](1)
    assert(q1.min == -128 && q1.max == 127, q1.toString)
    // constant vector: all zeros, zero scale, exact reconstruction
    val r2 = rows(2L)
    assert(r2.getSeq[Byte](1).forall(_ == 0) && r2.getDouble(3) == 0.0)
    assert(r2.getSeq[Double](4).forall(_ == 7.25))
    // reconstruction error bounded by scale/2 everywhere
    rows.values.foreach { r =>
      val scale = r.getDouble(3)
      val err = r.getSeq[Double](4).zip(r.getSeq[Float](5).map(_.toDouble))
        .map { case (a, b) => math.abs(a - b) }.max
      assert(err <= scale / 2 + 1e-12, s"id=${r.getLong(0)} err=$err scale=$scale")
    }
  }

  test("quantizeInt8 edge contracts: empty array, null element, non-finite fail-loud") {
    import graft.operators.Similarity
    // empty array: total function — all-zero struct, not NULL
    val empty = Seq(Tuple1(Array.empty[Float])).toDF("v")
      .select(Similarity.quantizeInt8(col("v")).as("__q"))
      .select(col("__q.q"), col("__q.lo"), col("__q.scale"), col("__q.qsum")).collect()(0)
    assert(empty.getSeq[Byte](0).isEmpty && empty.getDouble(1) == 0.0 &&
      empty.getDouble(2) == 0.0 && empty.getLong(3) == 0L)
    // a null ELEMENT nulls the whole struct (VecDotProduct null-poisoning)
    val withNull = Seq(Tuple1(Array[java.lang.Float](1.0f, null, 3.0f))).toDF("v")
      .select(Similarity.quantizeInt8(col("v")).as("__q")).collect()(0)
    assert(withNull.isNullAt(0), "null element must null the struct")
    // non-finite elements fail loud instead of landing in the grid as 0
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity)) {
      val e = intercept[Exception] {
        Seq(Tuple1(Array(1.0f, bad))).toDF("v")
          .select(Similarity.quantizeInt8(col("v"))).collect()
      }
      def chain(t: Throwable): String =
        if (t == null) "" else t.toString + "\n" + chain(t.getCause)
      assert(chain(e).contains("non-finite"), chain(e).take(500))
    }
  }

  test("quantizedDot equals the dot of dequantized vectors; quantized top-k tracks float top-k") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(32)(rnd.nextFloat() * 4 - 2))).toDF("id", "v")
    val q2 = vecs.select(col("id"), col("v"), Similarity.quantizeInt8(col("v")).as("a"))
      .crossJoin(vecs.select(col("id").as("id2"),
        Similarity.quantizeInt8(col("v")).as("b"), col("v").as("v2")))
    // identity: the correction-term formula == plain dot of dequantized
    val diffs = q2.select(
        Similarity.quantizedDot(col("a"), col("b")).as("qd"),
        Similarity.dotProduct(Similarity.dequantizeInt8(col("a")),
          Similarity.dequantizeInt8(col("b"))).as("dd"))
      .collect().map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    assert(diffs.max < 1e-6, s"max |quantizedDot - dequantized dot| = ${diffs.max}")
    // ranking: quantized top-5 overlaps the float top-5 heavily (int8 on
    // 32 dims perturbs cosine by ~1e-2; fixture scores are well separated)
    val floatTop = Similarity.cosineTopK(vecs, col("id"), col("v"),
        vecs.filter(col("id") < 3), col("id"), col("v"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quantTop = Similarity.cosineTopKQuantized(vecs, col("id"), col("v"),
        vecs.filter(col("id") < 3), col("id"), col("v"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (floatTop intersect quantTop).size
    assert(overlap >= 12, s"quantized top-k diverged: only $overlap/15 shared pairs")
    // self-similarity must stay the top hit for every query
    assert((0L until 3L).forall(q => quantTop((q, q))), quantTop.toString)
  }

  test("pqEncode: m codes per row, in codeword range, identical vectors get identical codes") {
    val embs = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
    val cb = Similarity.pqCodebooks(embs, col("vec_id"), col("embedding"), m = 8, ksub = 16)
    assert(cb.length == 8 && cb.forall(_.length == 16) &&
      cb.forall(_.forall(_.length == 8)), "codebooks must be 8 x 16 x 8")
    val codes = Similarity.pqEncode(embs, col("vec_id"), col("embedding"), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // a codeword source vector must encode to itself in every subspace
    // (distance 0 is the unique rounded minimum unless another codeword ties,
    // in which case both slices are identical values anyway)
    val dup = embs.select(col("vec_id"), col("embedding"))
      .union(embs.filter(col("vec_id") === 7).select(lit(100000L), col("embedding")))
    val dupCodes = Similarity.pqEncode(dup, col("vec_id"), col("embedding"), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(dupCodes(100000L) == dupCodes(7L), "identical vectors must share codes")
  }

  test("pqTopK: corpus contained in the codewords reproduces brute-force exactly") {
    // every corpus vector is its own codeword (n <= ksub), so the
    // reconstruction is lossless and asymmetric PQ == exact cosine top-k,
    // scores included (both sides round at 6 dp over the same fp order)
    val embs = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
      .filter(col("vec_id") < 12)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val pq = Similarity.pqTopK(embs, col("vec_id"), col("embedding"),
        embs.filter(col("vec_id") < 3), col("vec_id"), col("embedding"),
        k = 4, m = 8, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.cosineTopK(embs, col("vec_id"), col("embedding"),
        embs.filter(col("vec_id") < 3), col("vec_id"), col("embedding"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pq == exact, s"lossless PQ must equal brute force:\npq=$pq\nexact=$exact")
  }

  test("PQ Lloyd refinement: per-subspace k-means rounds reduce quantization MSE") {
    val embs = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
    val vecs = embs.select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    // subspace MSE: mean over (row, subspace) of ||s - nearest codeword||^2
    def mse(cb: Array[Array[Array[Double]]]): Double = {
      val dsub = cb(0)(0).length
      vecs.map { v =>
        cb.zipWithIndex.map { case (codebook, j) =>
          val s = v.slice(j * dsub, (j + 1) * dsub)
          codebook.map(c => s.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum / (vecs.length * cb.length)
    }
    val seed = Similarity.pqCodebooks(embs, col("vec_id"), col("embedding"), 8, 16)
    val r1 = Similarity.pqLloydRound(embs, col("embedding"), seed)
    val r2 = Similarity.pqLloydRound(embs, col("embedding"), r1)
    assert(r1.zip(seed).exists { case (a, b) =>
      a.zip(b).exists { case (x, y) => !x.sameElements(y) } }, "codewords never moved")
    assert(mse(r1) <= mse(seed) + 1e-9, s"round 1 worsened MSE: ${mse(seed)} -> ${mse(r1)}")
    assert(mse(r2) <= mse(r1) + 1e-9, s"round 2 worsened MSE: ${mse(r1)} -> ${mse(r2)}")
    // the refined index still serves k results per query
    val out = Similarity.pqTopK(embs, col("vec_id"), col("embedding"),
      embs.filter(col("vec_id") < 3), col("vec_id"), col("embedding"),
      k = 5, m = 8, ksub = 16, lloydIters = 2)
    val perQuery = out.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.length == 3 && perQuery.forall(_ == 5L), perQuery.mkString(","))
  }

  test("rrfFuse: rank-only fusion, absent docs contribute nothing, doc_id tiebreak") {
    import graft.operators.Retrieval
    // list A ranks (1, 2, 3); list B ranks (2, 9) — scores on wildly
    // different scales, which RRF must ignore (ranks only)
    val a = Seq((0L, 1L, 900.0), (0L, 2L, 500.0), (0L, 3L, 100.0))
      .toDF("query_id", "doc_id", "score")
    val b = Seq((0L, 2L, 0.9), (0L, 9L, 0.1)).toDF("query_id", "doc_id", "score")
    val fused = Retrieval.rrfFuse(Seq(a, b), k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // doc 2: 1/62 + 1/61 (rank 2 in A, rank 1 in B) — the only doc in both
    // lists must win; others carry a single term
    assert(fused.map(_._1).toSeq == Seq(2L, 1L, 9L, 3L), fused.mkString(","))
    assert(math.abs(fused.head._2 - (1.0 / 62 + 1.0 / 61)) < 1e-9)
    // equal scores within a list: rank assigned by doc_id ASC, so fusion
    // is deterministic under ties too
    val tied = Seq((0L, 5L, 1.0), (0L, 4L, 1.0)).toDF("query_id", "doc_id", "score")
    val tf = Retrieval.rrfFuse(Seq(tied), k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(tf.map(_._1).toSeq == Seq(4L, 5L), tf.mkString(","))
  }

  test("spanDuplication: cross-doc spans counted, within-doc repeats don't, short docs zero") {
    // doc 1 and 2 share the 3-token run "x y z"; doc 3 repeats its own
    // span twice (distinct per doc → not a cross-doc dup); doc 4 is too
    // short for any 3-token span.
    val docs = Seq(
      (1L, "a b x y z c"),
      (2L, "q x y z r s"),
      (3L, "m n o m n o m n o"),
      (4L, "t u")).toDF("doc_id", "text")
    val out = Dedup.spanDuplication(docs, col("text"), col("doc_id"), n = 3)
    assertRows(out, Seq(
      Seq[Any](1L, 4L, 1L, 0.25),  // spans: "a b x","b x y","x y z","y z c"
      Seq[Any](2L, 4L, 1L, 0.25),
      Seq[Any](3L, 3L, 0L, 0.0),   // distinct spans: "m n o","n o m","o m n"
      Seq[Any](4L, 0L, 0L, 0.0)))
  }
}
