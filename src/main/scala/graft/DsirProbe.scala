package graft

import org.apache.spark.sql.functions._

/** Staged DSIR cost decomposition (dev tool, r16 verdict item 4): the
  * ad52a9e exchange-elimination removed hashedCounts' per-(doc,bucket)
  * re-aggregation but the sf10 wall did not move (118.9 → 118.6 s), so
  * the actual cost driver is unprofiled. Times each sub-plan of qDsir in
  * isolation (one JSON line each) so the dominant stage is measured, not
  * guessed:
  *
  *  - scan:        documents count (parquet scan floor)
  *  - extract:     WordNgramCounts explode → global sum(cnt) (kernel cost,
  *                 no md5, no join — partial agg collapses map-side)
  *  - extract_md5: extract + the md5 60-bit bucket hash (hash60 cost delta)
  *  - model:       the bucket model aggregate (one full extraction pass)
  *  - weights:     Dsir.importanceWeights (model pass + scoring pass — the
  *                 exploded frame is consumed twice by design: fit, score)
  *  - full:        qDsir (weights + round + Gumbel top-k)
  *
  * Run: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.DsirProbe"
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val spark = GraftSession.getOrCreate()
    val docs = GraftSession.table(spark, dir, "documents")
    val buckets = operators.Dsir.bucketsFor(docs.count())

    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"""{"dsir_probe":"$tag","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // one warmup of the full query primes codegen/JIT for every stage shape
    noop(Queries.qDsir(spark, dir))

    timed("scan") { docs.count() }
    val exploded = docs.select(col("doc_id"), (col("lang") === "en").as("is_target"),
      explode(graft.expressions.TextExpressions.wordNgramCounts(lower(col("text")))))
    timed("extract") { noop(exploded.agg(sum(col("value")))) }
    timed("extract_md5") {
      noop(exploded.select(
          pmod(conv(substring(md5(col("key")), 1, 15), 16, 10).cast("long"),
            lit(buckets.toLong)).as("bucket"), col("value"))
        .agg(sum(col("value")), sum(col("bucket"))))
    }
    val hashed = operators.Dsir.hashedCounts(docs, col("doc_id"), col("text"),
      col("lang") === "en", buckets)
    timed("model") {
      noop(hashed.groupBy(col("bucket")).agg(sum(col("cnt")).as("q_cnt"),
        sum(when(col("is_target"), col("cnt")).otherwise(0L)).as("t_cnt")))
    }
    timed("weights") {
      noop(operators.Dsir.importanceWeights(docs, col("doc_id"), col("text"),
        col("lang") === "en", buckets = buckets, alpha = 1.0))
    }
    timed("full") { noop(Queries.qDsir(spark, dir)) }
    spark.stop()
  }
}
