package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions
import graft.operators.Similarity

/** First-class verification of the NearestCentroidVec kernel
  * (expressions/VectorExpressions.scala) — the >64-centroid argmin path
  * that replaced the crossJoin(broadcast)+min-agg plan after the r17
  * sf100 probe, plus the scale-derivation helpers the r17 round added
  * without specs (Bpe.minFreqFor, Dedup.verifyPartitionsFor). */
class VectorKernelSpec extends SparkSpec {
  import spark.implicits._

  private def round9(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Independent brute-force of the documented contract: the cell
    * minimizing round(-dot/(|v||c|), 9), ties to the LOWER index;
    * zero-norm centroid never wins; all-zero vector -> cell 0. */
  private def bruteArgmin(v: Seq[Double], cents: Array[Array[Double]]): Int = {
    val vn = math.sqrt(v.map(x => x * x).sum)
    if (vn == 0.0) return 0
    val scored = cents.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val r = if (cn == 0.0) Double.PositiveInfinity
              else round9(-v.zip(c).map { case (a, b) => a * b }.sum / (vn * cn))
      (r, i)
    }
    scored.minBy(identity)._2
  }

  test("nearest_centroid agrees with a brute-force rounded argmin on random vectors") {
    val rnd = new scala.util.Random(42)
    val dim = 16
    val k = 80 // past the 64-literal cutoff in assignToCentroids
    val cents = Array.fill(k)(Array.fill(dim)(rnd.nextDouble() - 0.5))
    val rows = (0L until 200L).map(i => (i, Seq.fill(dim)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("id", "vec")
      .select(col("id"), VectorExpressions.nearestCentroid(col("vec"), cents).as("cell"))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) == bruteArgmin(v, cents), s"row $id")
    }
  }

  test("nearest_centroid matches the <=64 literal path cell-for-cell (incl. exact ties)") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    // 10 random centroids PLUS a scaled copy of centroid 2 (same direction,
    // different norm -> identical cosine against every vector -> exact tie;
    // both paths must resolve to the LOWER index 2, never 10)
    val base10 = Array.fill(10)(Array.fill(dim)(rnd.nextDouble() - 0.5))
    val cents = base10 :+ base10(2).map(_ * 3.0)
    val embs = (0L until 300L).map(i => (i, Seq.fill(dim)(rnd.nextDouble() - 0.5)))
      .toDF("id", "vec")
    val literal = Similarity.assignToCentroids(embs, col("id"), col("vec"), cents)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kernel = embs
      .select(col("id"), VectorExpressions.nearestCentroid(col("vec"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(literal == kernel)
    assert(!kernel.values.exists(_ == 10), "tie must resolve to the lower duplicate index")
  }

  test("nearest_centroid: zero-norm centroid never poisons the argmin (NaN guard)") {
    // centroids(0) zero-norm: raw would be -0/0 = NaN; unguarded, every
    // comparison is false and the kernel freezes at cell 0
    val cents = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq((1L, Seq(5.0, 0.1)), (2L, Seq(0.1, 5.0))).toDF("id", "vec")
      .select(col("id"), VectorExpressions.nearestCentroid(col("vec"), cents).as("cell"))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 2))
    // zero-norm centroid mid-array, real winner after it
    val cents2 = Array(Array(-1.0, 0.0), Array(0.0, 0.0), Array(1.0, 0.0))
    val got2 = Seq((1L, Seq(9.0, 0.0))).toDF("id", "vec")
      .select(VectorExpressions.nearestCentroid(col("vec"), cents2))
      .collect()(0).getInt(0)
    assert(got2 == 2)
  }

  test("nearest_centroid: all-zero vector resolves to cell 0 (NaN-everywhere tie)") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val got = Seq((1L, Seq(0.0, 0.0))).toDF("id", "vec")
      .select(VectorExpressions.nearestCentroid(col("vec"), cents))
      .collect()(0).getInt(0)
    assert(got == 0)
  }

  test("nearest_centroid: NULL input and NULL element -> NULL, on BOTH paths") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(1L).toDF("id")
      .select(
        VectorExpressions.nearestCentroid(
          lit(null).cast("array<double>"), cents).as("null_in"),
        VectorExpressions.nearestCentroid(
          array(lit(1.0), lit(null).cast("double")), cents).as("null_elem"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    // the <=64 literal path applies the same null-element contract
    val embs = Seq(1L).toDF("id")
      .select(col("id"), array(lit(1.0), lit(null).cast("double")).as("vec"))
    val lit64 = Similarity.assignToCentroids(embs, col("id"), col("vec"), cents)
      .select(col("cell")).collect()(0)
    assert(lit64.isNullAt(0), "literal path must null-poison a null-element vector")
  }

  test("nearest_centroid: dimension mismatch fails loud") {
    val cents = Array(Array(1.0, 0.0, 0.0))
    val ex = intercept[Exception] {
      Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
        .select(VectorExpressions.nearestCentroid(col("vec"), cents))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage).exists(_.contains("nearest_centroid"))))
  }

  test("nearest_centroid: float input widens like the double path") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val got = Seq((1L, Seq(0.1f, 5.0f))).toDF("id", "vec")
      .select(VectorExpressions.nearestCentroid(col("vec"), cents))
      .collect()(0).getInt(0)
    assert(got == 1)
  }

  test("cellOccupancy: counts, max, and sum-of-squares match a hand-built assignment") {
    // 2 orthogonal centroids; 3 vectors near axis 0, 1 near axis 1 —
    // occupancies (3, 1): cells=2, max=3, avg=2.0, sum_occ_sq=10
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val embs = Seq(
      (1L, Seq(0.9, 0.1)), (2L, Seq(0.8, 0.2)), (3L, Seq(0.99, 0.0)),
      (4L, Seq(0.1, 0.9))).toDF("id", "vec")
    val r = Similarity.cellOccupancy(embs, col("id"), col("vec"), cents).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12)
    assert(r.getLong(3) == 10L) // 9 + 1: the within-cell pair-work proxy
  }

  // --- r17 scale derivations (SCALING.md frozen-parameter rule) ---

  test("Bpe.minFreqFor: floor 1 below perDocs (gate SFs byte-identical), linear above") {
    import graft.operators.Bpe
    assert(Bpe.minFreqFor(0L) == 1L)
    assert(Bpe.minFreqFor(19999L) == 1L)   // below perDocs: exact
    assert(Bpe.minFreqFor(20000L) == 1L)   // boundary: 20000/20000 = 1
    assert(Bpe.minFreqFor(40000L) == 2L)
    assert(Bpe.minFreqFor(1200000L) == 60L) // sf30-scale corpus
    // oracle-derivation agreement: GREATEST(1, count(*) // perDocs)
    for (docs <- Seq(0L, 1L, 19999L, 20000L, 20001L, 999999L, 2000000L))
      assert(Bpe.minFreqFor(docs) == math.max(1L, docs / 20000L),
        s"derivation drift vs the DuckDB oracle at $docs docs")
  }

  test("Dedup.verifyPartitionsFor: 0 below the session width, linear growth, budget cap") {
    import graft.operators.Dedup
    assert(Dedup.verifyPartitionsFor(0L) == 0)
    assert(Dedup.verifyPartitionsFor(12500L * 32) == 0)      // == width: no repartition
    assert(Dedup.verifyPartitionsFor(12500L * 33) == 33)     // first step past width
    assert(Dedup.verifyPartitionsFor(12500L * 1000) == 1000) // linear
    assert(Dedup.verifyPartitionsFor(Long.MaxValue / 4) == (1 << 14)) // budget cap
    // session-width overload reads the LIVE shuffle width, not the 32 default
    val w = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(Dedup.verifyPartitionsFor(spark, 12500L * w) == 0)
    val past = 12500L * (w + 1)
    assert(Dedup.verifyPartitionsFor(spark, past) == w + 1)
  }
}
