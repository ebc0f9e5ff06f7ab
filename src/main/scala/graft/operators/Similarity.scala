package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]). Not in the reference (Beam has no vector ops); designed
  * for the 100 TB training-data path:
  *
  *  - [[cosineTopK]] — exact brute force, the correctness baseline. Broadcast
  *    the query set (queries are small), one narrow pass over the corpus, a
  *    bounded top-k aggregate. No corpus shuffle at all.
  *  - [[hyperplaneBucket]] / [[lshTopK]] — random-hyperplane LSH: corpus and
  *    queries hash to sign-bit buckets; candidate generation is a bucket
  *    equi-join (shuffle of (bucket, id, vec-slice) only), then exact cosine
  *    re-rank inside buckets. This is the scale path: bucket count grows
  *    2^planes, so each bucket's pairwise work stays tiny.
  *
  * All arithmetic is done in double via zip_with/aggregate — codegen'd
  * Catalyst expressions, no UDF.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, accumulated in double,
    * left-to-right (deterministic). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. `queries` must be small (it is broadcast). Deterministic
    * ordering: (rounded score desc, corpus id asc). */
  def cosineTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                 queries: DataFrame, queryId: Column, queryVec: Column,
                 k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cvec"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("score", round(cosine(col("cvec"), col("qvec")), 6))
    Aggregates.topPerKey(scored, Seq(col("query_id")),
        Seq(col("score").desc, col("corpus_id").asc), k)
      .select(col("query_id"), col("corpus_id"), col("score"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a hash-derived value in [-1, 1). No RNG state → reproducible across
    * partitionings and engines. */
  private def planeComponent(plane: Column, dim: Column, seed: Long): Column =
    (pmod(xxhash64(concat_ws(":", lit(seed), plane, dim)), lit(2000001L)) - 1000000L) / 1000000.0

  /** Random-hyperplane sign-bit bucket id (planes ≤ 30). */
  def hyperplaneBucket(embs: DataFrame, id: Column, vec: Column,
                       planes: Int, seed: Long = 42L): DataFrame = {
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val dotp = aggregate(
        zip_with(col("vec"), sequence(lit(0), size(col("vec")) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i, seed)),
        lit(0.0), (acc, x) => acc + x)
      // p is a lambda-bound Column; the SQL shiftleft accepts Column shift
      // amounts (the Scala overload only takes Int).
      when(dotp >= 0, call_function("shiftleft", lit(1L), p)).otherwise(0L)
    })
    embs.select(id.as("id"), vec.as("vec"))
      .withColumn("bucket", aggregate(bits, lit(0L), (acc, x) => acc.bitwiseOR(x)))
  }

  /** LSH-bucketed ANN top-k: candidates share a bucket with the query; exact
    * cosine re-rank per query. Recall grows with fewer planes (bigger
    * buckets) or multiple tables (vary seed, union, re-rank). */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val c = hyperplaneBucket(corpus, corpusId, corpusVec, planes, seed)
      .withColumnRenamed("id", "corpus_id").withColumnRenamed("vec", "cvec")
    val q = hyperplaneBucket(queries, queryId, queryVec, planes, seed)
      .withColumnRenamed("id", "query_id").withColumnRenamed("vec", "qvec")
    val scored = c.join(q, "bucket")
      .withColumn("score", round(cosine(col("cvec"), col("qvec")), 6))
    Aggregates.topPerKey(scored, Seq(col("query_id")),
        Seq(col("score").desc, col("corpus_id").asc), k)
      .select(col("query_id"), col("corpus_id"), col("score"))
  }
}
