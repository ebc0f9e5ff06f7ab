package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Staged cost decomposition of q_semdedup_incr (dev tool, r17 verdict
  * item 2): the sf30 → sf100 step measured 6.0× wall for 3.33× data —
  * close to the N^1.5 design curve (6.1×), but the same-corpus gap vs
  * q_semdedup (417 vs 137 s at sf100) is 3× with near-identical total
  * assignment + pair work on paper, so the extra cost is unlocated.
  * Times each sub-plan in isolation (one JSON line each):
  *
  *  - scan:          embeddings count (parquet floor)
  *  - centroids:     md5Seeds collect — k×dim driver state
  *  - assign_corpus: store-side kernel assignment (|corpus| × k × dim)
  *  - assign_batch:  batch-side kernel assignment (|batch| × k × dim),
  *                   NO persist (isolates pure kernel throughput)
  *  - vs_corpus:     batch↔store within-cell join + cosine gate + min-agg
  *                   (recomputes both assignments — subtract the stages)
  *  - vs_batch:      batch self-join + cosine gate + min-agg (recomputes
  *                   assign_batch twice unless persisted; run both ways)
  *  - full:          qSemDedupIncr (persisted b, three consumers)
  *  - full_semdedup: qSemDedup on the same corpus — the sibling yardstick
  *
  * Run: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.SemIncrProbe"
  */
object SemIncrProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf30")
    val spark = GraftSession.getOrCreate()
    val embs = GraftSession.table(spark, dir, "embeddings")
    val n = embs.count()
    val k = Similarity.nlistBalancedFor(n, targetClusterSize = 256L)
    println(s"""{"semincr_probe":"params","n":$n,"k":$k}""")

    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"""{"semincr_probe":"$tag","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val corpus = embs.filter(pmod(col("vec_id"), lit(1000000000L)) < 400)
    val batch = embs.filter(pmod(col("vec_id"), lit(1000000000L)) >= 400)

    // warmup at the driver SF primes codegen for every stage shape
    noop(Queries.qSemDedupIncr(spark, "/root/testdata/sf0.001"))

    // SPARK_GRAFT_SEMINCR_RECLUSTER=1: only the drift-diagnosis stages —
    // batch cell-occupancy under corpus-derived vs population-derived
    // centroids, and the within-batch join under each. The r18 sf100
    // decomposition measured vs_batch at 11.7× its sf30 wall for 3.33×
    // data while full_semdedup (population seeds, MORE rows) stayed at
    // 145 s: the hypothesis is that corpus-slice seeds (bases 0..399
    // only) leave the batch's 1600 novel base directions without nearby
    // centroids, so each novel base's `copies` near-identical rows pile
    // into one cell and the pair term goes ∝ copies². A recluster
    // (population-derived seeds — the semDedupRecluster lifecycle)
    // should restore the N^1.5 curve.
    if (sys.env.get("SPARK_GRAFT_SEMINCR_RECLUSTER").contains("1")) {
      def occStats(tag: String, cents: Array[Array[Double]]): Unit = timed(tag) {
        val row = Similarity.cellOccupancy(batch, col("vec_id"),
          col("embedding"), cents).collect()(0)
        println(s"""{"semincr_probe":"$tag-stats","cells":${row.getLong(0)},""" +
          s""""max_occ":${row.getLong(1)},"avg_occ":${row.getDouble(2)},""" +
          s""""pair_proxy_sum_occ_sq":${row.getLong(3)}}""")
      }
      def vsBatch(tag: String, cents: Array[Array[Double]]): Unit = timed(tag) {
        val b = Similarity.assignToCentroids(batch, col("vec_id"),
          col("embedding"), cents, multiConsumer = true)
        noop(b.as("a").join(b.as("b2"),
            col("a.cell") === col("b2.cell") && col("b2.id") < col("a.id"))
          .filter(round(Similarity.cosineFromNorms(col("a.vec"), col("b2.vec"),
            col("a.nrm"), col("b2.nrm")), 6) >= 0.3)
          .groupBy(col("a.id")).agg(min(col("b2.id")).as("batch_dup")))
        b.unpersist()
      }
      val corpusCents = Similarity.kmeansCentroids(corpus, col("vec_id"),
        col("embedding"), k = k)
      val popCents = Similarity.kmeansCentroids(embs, col("vec_id"),
        col("embedding"), k = k)
      occStats("occ_corpus_seeds", corpusCents)
      occStats("occ_pop_seeds", popCents)
      vsBatch("vs_batch_corpus_seeds", corpusCents)
      vsBatch("vs_batch_pop_seeds", popCents)
      spark.stop(); return
    }

    timed("scan") { embs.count() }
    var cents: Array[Array[Double]] = null
    timed("centroids") {
      cents = Similarity.kmeansCentroids(corpus, col("vec_id"), col("embedding"), k = k)
    }
    timed("assign_corpus") {
      noop(Similarity.semDedupStore(corpus, col("vec_id"), col("embedding"), cents))
    }
    timed("assign_batch") {
      noop(Similarity.assignToCentroids(batch, col("vec_id"), col("embedding"), cents))
    }
    def assigned(df: org.apache.spark.sql.DataFrame) =
      Similarity.assignToCentroids(df, col("vec_id"), col("embedding"), cents)
    val thr = 0.3
    timed("vs_corpus") {
      val b = assigned(batch).as("a")
      val st = Similarity.semDedupStore(corpus, col("vec_id"), col("embedding"), cents).as("c")
      noop(b.join(st, col("a.cell") === col("c.cell"))
        .filter(round(Similarity.cosineFromNorms(col("a.vec"), col("c.vec"),
          col("a.nrm"), col("c.nrm")), 6) >= thr)
        .groupBy(col("a.id")).agg(min(col("c.id")).as("corpus_dup")))
    }
    timed("vs_batch_nopersist") {
      val b = assigned(batch)
      noop(b.as("a").join(b.as("b2"),
          col("a.cell") === col("b2.cell") && col("b2.id") < col("a.id"))
        .filter(round(Similarity.cosineFromNorms(col("a.vec"), col("b2.vec"),
          col("a.nrm"), col("b2.nrm")), 6) >= thr)
        .groupBy(col("a.id")).agg(min(col("b2.id")).as("batch_dup")))
    }
    timed("vs_batch_persisted") {
      val b = Similarity.assignToCentroids(batch, col("vec_id"), col("embedding"),
        cents, multiConsumer = true)
      noop(b.as("a").join(b.as("b2"),
          col("a.cell") === col("b2.cell") && col("b2.id") < col("a.id"))
        .filter(round(Similarity.cosineFromNorms(col("a.vec"), col("b2.vec"),
          col("a.nrm"), col("b2.nrm")), 6) >= thr)
        .groupBy(col("a.id")).agg(min(col("b2.id")).as("batch_dup")))
      b.unpersist()
    }
    timed("full") { noop(Queries.qSemDedupIncr(spark, dir)) }
    timed("full_semdedup") { noop(Queries.qSemDedup(spark, dir)) }
    println(s"""{"semincr_probe":"persisted_rdds_end","n":${spark.sparkContext.getPersistentRDDs.size}}""")
    spark.stop()
  }
}
