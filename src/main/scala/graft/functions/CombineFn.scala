package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.reflect.ClassTag

/** The reference's universal aggregation contract,
  * `Combine.CombineFn<InputT, AccumT, OutputT>` (reference:
  * SDK/transforms/Combine.java:338 — createAccumulator/addInput/
  * mergeAccumulators/extractOutput), re-expressed as Spark's
  * `Aggregator[IN, BUF, OUT]`. This is the single most important mapping in
  * the port: a commutative/associative merge is exactly what Catalyst's
  * HashAggregateExec needs to run partial (map-side) + final aggregation —
  * the "combiner lifting" Beam runners implement by hand
  * (reference: DIRECT/MultiStepCombine.java) is free here.
  */
abstract class CombineFn[IN, ACC, OUT] extends Serializable {
  def createAccumulator(): ACC
  def addInput(acc: ACC, in: IN): ACC
  def mergeAccumulators(a: ACC, b: ACC): ACC
  def extractOutput(acc: ACC): OUT

  /** Lift to a Spark typed Aggregator (usable via ds.select(fn.toColumn),
    * KeyValueGroupedDataset.agg, or udaf() registration for SQL). */
  def asAggregator(implicit accEnc: Encoder[ACC], outEnc: Encoder[OUT]): Aggregator[IN, ACC, OUT] = {
    val self = this
    new Aggregator[IN, ACC, OUT] {
      override def zero: ACC = self.createAccumulator()
      override def reduce(b: ACC, a: IN): ACC = self.addInput(b, a)
      override def merge(b1: ACC, b2: ACC): ACC = self.mergeAccumulators(b1, b2)
      override def finish(r: ACC): OUT = self.extractOutput(r)
      override def bufferEncoder: Encoder[ACC] = accEnc
      override def outputEncoder: Encoder[OUT] = outEnc
    }
  }

  /** Adapt the input side (Beam: Combine.perKey over a projected value;
    * lets one CombineFn aggregate a field of a wider row type). */
  def contramap[IN2](f: IN2 => IN): CombineFn[IN2, ACC, OUT] = {
    val self = this
    new CombineFn[IN2, ACC, OUT] {
      override def createAccumulator(): ACC = self.createAccumulator()
      override def addInput(acc: ACC, in: IN2): ACC = self.addInput(acc, f(in))
      override def mergeAccumulators(a: ACC, b: ACC): ACC = self.mergeAccumulators(a, b)
      override def extractOutput(acc: ACC): OUT = self.extractOutput(acc)
    }
  }

  /** Adapt the output side. */
  def map[OUT2](f: OUT => OUT2): CombineFn[IN, ACC, OUT2] = {
    val self = this
    new CombineFn[IN, ACC, OUT2] {
      override def createAccumulator(): ACC = self.createAccumulator()
      override def addInput(acc: ACC, in: IN): ACC = self.addInput(acc, in)
      override def mergeAccumulators(a: ACC, b: ACC): ACC = self.mergeAccumulators(a, b)
      override def extractOutput(acc: ACC): OUT2 = f(self.extractOutput(acc))
    }
  }
}

/** Bounded-heap Top-K (reference: SDK/transforms/Top.java:392 TopCombineFn —
  * accumulator is a size-capped heap, so the shuffle carries at most K values
  * per key per partition: the same trick that makes Top scale in Beam makes
  * it a partial-agg-friendly Aggregator here).
  */
class TopKCombineFn[T: Ordering: ClassTag](k: Int)
    extends CombineFn[T, List[T], List[T]] {
  private val ord = implicitly[Ordering[T]]
  override def createAccumulator(): List[T] = Nil
  override def addInput(acc: List[T], in: T): List[T] =
    trim(in :: acc)
  override def mergeAccumulators(a: List[T], b: List[T]): List[T] = trim(a ++ b)
  override def extractOutput(acc: List[T]): List[T] = acc.sorted(ord.reverse)
  private def trim(xs: List[T]): List[T] =
    if (xs.sizeIs <= k) xs else xs.sorted(ord.reverse).take(k)
}

/** Exact-size uniform reservoir sample (reference: SDK/transforms/Sample.java:240
  * FixedSizedSampleFn). Spark's sample(fraction) is not fixed-size, so this
  * Aggregator is genuinely needed. Deterministic given `seed`: each element
  * draws its priority from a hash of (seed, element.hashCode), making the
  * result independent of partitioning/merge order — crucial because Spark's
  * merge order is nondeterministic.
  */
class ReservoirSampleFn[T: ClassTag](n: Int, seed: Long,
                                     stableKey: T => String = ReservoirSampleFn.defaultKey[T] _)
    extends CombineFn[T, List[(Long, T)], List[T]] {
  /** 64-bit FNV-1a over the element's stable byte form, then splitmix64:
    * well-mixed and independent of JVM hashCode (32-bit hashCode collides by
    * birthday bound at ~77k elements, and is identity-based for arrays —
    * either breaks merge-order determinism). Ties on the full 64-bit
    * priority are broken by the key's total order in [[trim]]. */
  private def priority(in: T): Long = {
    var h = 0xCBF29CE484222325L
    stableKey(in).getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      h ^= (b & 0xFFL); h *= 0x100000001B3L
    }
    var z = seed ^ h * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  override def createAccumulator(): List[(Long, T)] = Nil
  override def addInput(acc: List[(Long, T)], in: T): List[(Long, T)] =
    trim((priority(in), in) :: acc)
  override def mergeAccumulators(a: List[(Long, T)], b: List[(Long, T)]): List[(Long, T)] =
    trim(a ++ b)
  override def extractOutput(acc: List[(Long, T)]): List[T] =
    sorted(acc).map(_._2)
  private def sorted(xs: List[(Long, T)]): List[(Long, T)] =
    xs.sortBy { case (p, t) => (p, stableKey(t)) }
  private def trim(xs: List[(Long, T)]): List[(Long, T)] =
    if (xs.sizeIs <= n) xs else sorted(xs).take(n)
}

object ReservoirSampleFn {
  /** Content-based default key: toString for scalars, element-wise join for
    * arrays (whose toString is identity-based — the very nondeterminism the
    * stable key exists to avoid). Supply an explicit stableKey for nested
    * or custom types. */
  def defaultKey[T](t: T): String = t match {
    case a: Array[_] => a.mkString("[", ",", "]")
    case other       => String.valueOf(other)
  }
}

/** KMV (k-minimum-values) distinct-count estimator — the reference's OWN
  * ApproximateUnique algorithm (reference:
  * SDK/transforms/ApproximateUnique.java:61-66 LargestUnique — keep the
  * `sampleSize` smallest 64-bit hashes; if the sample is not full the
  * count is exact, else extrapolate from the sample's spread of the hash
  * space). Spark's approx_count_distinct (HLL++) satisfies the same
  * contract; this Aggregator exists for estimator-level parity and as a
  * pure CombineFn (shard/order-insensitive, laws-tested).
  *
  * Accumulator: sorted (ascending) array of the k smallest distinct
  * hashes. An array, not a List: the steady-state rejection test needs the
  * size and the kth-minimum, which an array yields in O(1) where every
  * List.sizeIs/.last pays an O(k) node traversal PER INPUT ROW — at k=128
  * over sf0.1's 600k rows that traversal dominated the whole aggregation.
  * Estimate: k * 2^64 / (maxOfSample − Long.MinValue) when full.
  */
class ApproximateUniqueFn[T](sampleSize: Int,
                             stableKey: T => String = (t: T) => ReservoirSampleFn.defaultKey(t))
    extends CombineFn[T, Array[Long], Long] {
  require(sampleSize > 0,
    s"ApproximateUniqueFn needs sampleSize > 0, got $sampleSize (the " +
      "reference requires ≥ 16, ApproximateUnique.java:311)")
  private def hash(in: T): Long = {
    var h = 0xCBF29CE484222325L
    stableKey(in).getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      h ^= (b & 0xFFL); h *= 0x100000001B3L
    }
    var z = h * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  override def createAccumulator(): Array[Long] = Array.emptyLongArray
  override def addInput(acc: Array[Long], in: T): Array[Long] = insert(acc, hash(in))
  override def mergeAccumulators(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)((acc, h) => insert(acc, h))
  override def extractOutput(acc: Array[Long]): Long =
    if (acc.length < sampleSize) acc.length.toLong
    else {
      // sample spans [Long.MinValue, max]; density k / span extrapolated
      // over the full 2^64 space (reference: LargestUnique mirror-image —
      // it keeps largest, we keep smallest; same estimate)
      val span = (BigDecimal(acc(acc.length - 1)) - BigDecimal(Long.MinValue)).max(1)
      (BigDecimal(sampleSize) * BigDecimal(2).pow(64) / span)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
  /** insert keeping the k smallest DISTINCT hashes, sorted ascending.
    * Steady-state fast path: once the sample saturates, almost every hash
    * is ≥ the current kth-minimum (`acc(n-1)`) and is rejected in true
    * O(1); membership is a binary search; only an actual accept (rare —
    * k/n of the stream) pays the O(k) copy. Pure: never mutates `acc`
    * (Spark may retain the buffer reference across rows). */
  private def insert(acc: Array[Long], h: Long): Array[Long] = {
    val n = acc.length
    if (n >= sampleSize && h >= acc(n - 1)) acc
    else {
      val idx = java.util.Arrays.binarySearch(acc, h)
      if (idx >= 0) acc // already present
      else {
        val ins = -idx - 1
        val outLen = math.min(n + 1, sampleSize)
        val out = new Array[Long](outLen)
        System.arraycopy(acc, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(acc, ins, out, ins + 1, outLen - ins - 1)
        out
      }
    }
  }
}

/** Bottom-k DISTINCT values — the KMV sketch accumulator as a first-class
  * CombineFn (same bottom-k construction as [[ApproximateUniqueFn]], here
  * keeping the VALUES, not just estimating a count; reference:
  * SDK/transforms/ApproximateUnique.java:61-66 LargestUnique keeps the
  * sample the same way). Exists so `Dedup.kmvSketch` never materializes a
  * corpus-wide distinct: `distinct().orderBy().limit(k)` shuffles every
  * distinct shingle hash of the corpus (billions of 32-char md5 strings at
  * sf100 — the q_corpus_jaccard heap OOM in the first full sf100 sweep),
  * while this accumulator holds ≤ k strings per task and merges in O(k),
  * so the corpus NEVER shuffles for the sketch side. Result is identical
  * to the distinct-sort-limit formulation (the k lexicographically
  * smallest distinct values), so the DuckDB oracle replay is unchanged.
  *
  * Accumulator: sorted ascending Array[String] capped at k — same
  * steady-state O(1) rejection argument as ApproximateUniqueFn (almost
  * every input is ≥ the kth-minimum once saturated). Pure: never mutates
  * `acc` in place. */
class BottomKDistinctFn(k: Int) extends CombineFn[String, Array[String], Seq[String]] {
  require(k >= 1, s"BottomKDistinctFn needs k >= 1, got $k")
  override def createAccumulator(): Array[String] = Array.empty[String]
  override def addInput(acc: Array[String], in: String): Array[String] = insert(acc, in)
  override def mergeAccumulators(a: Array[String], b: Array[String]): Array[String] =
    b.foldLeft(a)(insert)
  override def extractOutput(acc: Array[String]): Seq[String] = acc.toSeq
  private def insert(acc: Array[String], h: String): Array[String] = {
    val n = acc.length
    if (n >= k && h.compareTo(acc(n - 1)) >= 0) acc
    else {
      val idx = java.util.Arrays.binarySearch(
        acc.asInstanceOf[Array[AnyRef]], h.asInstanceOf[AnyRef])
      if (idx >= 0) acc // already present
      else {
        val ins = -idx - 1
        val outLen = math.min(n + 1, k)
        val out = new Array[String](outLen)
        System.arraycopy(acc, 0, out, 0, math.min(ins, outLen))
        if (ins < outLen) {
          out(ins) = h
          System.arraycopy(acc, ins, out, ins + 1, outLen - ins - 1)
        }
        out
      }
    }
  }
}

/** Munro–Paterson approximate quantiles — the reference's OWN algorithm
  * (reference: SDK/transforms/ApproximateQuantiles.java:215
  * ApproximateQuantilesCombineFn; buffer scheme :239-258): level-l buffers
  * of `bufferSize` sorted values, each value weighing 2^l; two same-level
  * buffers collapse into one at level l+1 by merging and keeping alternate
  * elements. Bounded memory (≤ maxBuffers live), mergeable, epsilon ≈
  * bufferSize⁻¹·log₂(n/bufferSize) accuracy. Spark's percentile_approx
  * (GK sketch) satisfies the same contract; this Aggregator exists for
  * estimator-level parity with the reference.
  *
  * Output: `numQuantiles` values from min to max (Beam's N-tiles shape,
  * ApproximateQuantiles.java:59).
  */
/** Misra–Gries heavy-hitters summary (Misra & Gries 1982), the mergeable
  * formulation of Agarwal et al. 2013 ("Mergeable Summaries", PODS) —
  * at most `capacity` counters; on overflow every counter decrements
  * (add path) or all counters shrink by the (capacity+1)-th largest
  * (merge path). Guarantees, under ANY processing/merge order (the only
  * properties a caller may rely on — counter values themselves are
  * order-dependent):
  *  - every item with true frequency > N/(capacity+1) is present;
  *  - each estimate is an UNDERCOUNT by at most N/(capacity+1).
  * Complements [[graft.operators.Aggregates.cmsFrequencies]] (CMS:
  * overestimates, fixed-size matrix, point queries) with the dual sketch
  * (undercounts, top-item enumeration). Beam ships CMS in
  * extensions/sketching; MG is the natural missing sibling.
  *
  * 100 TB story: accumulator ≤ `capacity` entries regardless of input
  * (map-side partial aggregation ships ≤ capacity counters per task) —
  * the same bounded-state discipline as TopKCombineFn.
  */
class MisraGriesFn[T](capacity: Int)(implicit ord: Ordering[T])
    extends CombineFn[T, Map[T, Long], Seq[(T, Long)]] {
  require(capacity >= 1, s"MisraGriesFn needs capacity >= 1, got $capacity")

  override def createAccumulator(): Map[T, Long] = Map.empty

  override def addInput(acc: Map[T, Long], in: T): Map[T, Long] =
    acc.get(in) match {
      case Some(c) => acc.updated(in, c + 1L)
      case None if acc.size < capacity => acc.updated(in, 1L)
      case None => // classic MG decrement-all step (drops zeroed counters)
        acc.iterator.map { case (k, c) => (k, c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  override def mergeAccumulators(a: Map[T, Long], b: Map[T, Long]): Map[T, Long] = {
    val combined = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // Agarwal et al. merge: subtract the (capacity+1)-th largest count
      // from every counter — keeps ≤ capacity entries, error stays
      // ≤ N_combined/(capacity+1)
      val d = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      combined.iterator.map { case (k, c) => (k, c - d) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** (item, estimate) sorted estimate-desc then item-asc; estimates are
    * order-dependent — downstream contracts should use only the theorem
    * guarantees above. */
  override def extractOutput(acc: Map[T, Long]): Seq[(T, Long)] =
    acc.toSeq.sortBy { case (k, c) => (-c, k) }
}

/** Munro–Paterson accumulator: a fixed-capacity level-0 staging array
  * (valid prefix = `n`, contents beyond it are garbage), leveled SORTED
  * buffers, and exact extremes. MUTABLE by design — Beam's CombineFn
  * contract explicitly allows addInput/merge to mutate and return the
  * accumulator (reference: SDK/transforms/Combine.java CombineFn.addInput
  * javadoc: "may modify it... for efficiency"), and Spark's
  * TypedImperativeAggregate keeps it as a live object per group, so the
  * hot path runs ZERO allocations per element (the previous immutable
  * tuple-of-Lists accumulator allocated a cons + Tuple5 + 3 boxes per row;
  * at 180M lineitem rows that allocation churn — not the sketch math — was
  * the whole cost: the r15 sf30 full-catalog sweep measured q_mp_quantiles
  * at 4.6× wall for 3× data with 3× run-to-run GC variance). Same
  * precedent as ApproximateUniqueFn's r9 array-accumulator rewrite. */
final case class MpAcc(var staging: Array[Double], var n: Int,
                       var buffers: List[(Int, Array[Double])],
                       var mn: Double, var mx: Double)

class ApproximateQuantilesFn(numQuantiles: Int, bufferSize: Int = 256, maxBuffers: Int = 32)
    extends CombineFn[Double, MpAcc, List[Double]] {

  override def createAccumulator(): MpAcc =
    MpAcc(new Array[Double](bufferSize), 0, Nil,
      Double.PositiveInfinity, Double.NegativeInfinity)

  override def addInput(acc: MpAcc, in: Double): MpAcc = {
    acc.staging(acc.n) = in
    acc.n += 1
    if (in < acc.mn) acc.mn = in
    if (in > acc.mx) acc.mx = in
    if (acc.n == bufferSize) {
      // full staging becomes a sorted level-0 buffer — same boundary and
      // same collapse semantics as the immutable formulation (the sort
      // erases staging order, so the multiset is all that matters)
      val full = acc.staging.clone()
      java.util.Arrays.sort(full)
      acc.buffers = collapseAll((0, full) :: acc.buffers)
      acc.n = 0
    }
    acc
  }

  override def mergeAccumulators(a: MpAcc, b: MpAcc): MpAcc = {
    // staging invariant: n <= bufferSize - 1 on both sides (addInput
    // collapses AT bufferSize), so the post-merge remainder
    // total - bufferSize <= bufferSize - 2 always fits a's staging array
    val total = a.n + b.n
    val buffers = collapseAll(a.buffers ++ b.buffers)
    if (b.mn < a.mn) a.mn = b.mn
    if (b.mx > a.mx) a.mx = b.mx
    if (total < bufferSize) {
      System.arraycopy(b.staging, 0, a.staging, a.n, b.n)
      a.n = total
      a.buffers = buffers
    } else {
      // deterministic re-staging regardless of merge order: sort the
      // combined staging, first bufferSize become a level-0 buffer, the
      // remainder re-stages (identical to the previous splitAt semantics)
      val all = new Array[Double](total)
      System.arraycopy(a.staging, 0, all, 0, a.n)
      System.arraycopy(b.staging, 0, all, a.n, b.n)
      java.util.Arrays.sort(all)
      val full = java.util.Arrays.copyOfRange(all, 0, bufferSize)
      System.arraycopy(all, bufferSize, a.staging, 0, total - bufferSize)
      a.n = total - bufferSize
      a.buffers = collapseAll((0, full) :: buffers)
    }
    a
  }

  override def extractOutput(acc: MpAcc): List[Double] = {
    val weighted = (acc.staging.take(acc.n).toList.map(v => (v, 1L)) ++
      acc.buffers.flatMap { case (l, buf) => buf.map(v => (v, 1L << l)) }).sortBy(_._1)
    if (weighted.isEmpty) return Nil
    val total = weighted.map(_._2).sum
    (0 until numQuantiles).toList.map { i =>
      if (i == 0) acc.mn                       // exact min
      else if (i == numQuantiles - 1) acc.mx   // exact max
      else {
        val target = total.toDouble * i / (numQuantiles - 1)
        var cum = 0L
        var ans = weighted.last._1
        val it = weighted.iterator
        var done = false
        while (it.hasNext && !done) {
          val (v, w) = it.next()
          cum += w
          if (cum >= target) { ans = v; done = true }
        }
        ans
      }
    }
  }

  /** Collapse same-level buffer pairs until every level has at most one
    * buffer. Alternation offset derives from the level so the collapse is
    * deterministic under any merge order (Beam alternates too). Inputs are
    * sorted arrays; concat + sort gives the same merged order the List
    * formulation produced. */
  private def collapseAll(buffers: List[(Int, Array[Double])]): List[(Int, Array[Double])] = {
    var bufs = buffers
    var continue = true
    while (continue) {
      bufs.groupBy(_._1).toSeq.sortBy(_._1).find(_._2.sizeIs >= 2) match {
        case Some((level, same)) =>
          val l0 = same(0)._2; val l1 = same(1)._2
          val merged = new Array[Double](l0.length + l1.length)
          System.arraycopy(l0, 0, merged, 0, l0.length)
          System.arraycopy(l1, 0, merged, l0.length, l1.length)
          java.util.Arrays.sort(merged)
          val offset = level % 2 // deterministic alternation
          val kept = new Array[Double]((merged.length + 1 - offset) / 2)
          var i = offset; var j = 0
          while (i < merged.length) { kept(j) = merged(i); j += 1; i += 2 }
          bufs = (level + 1, kept) :: same.drop(2) ++ bufs.filterNot(_._1 == level)
        case None => continue = false
      }
    }
    bufs
  }
}

/** Latest-by-event-time (reference: SDK/transforms/Latest.java — value with
  * max timestamp). Equivalent to max_by(value, ts); provided as a CombineFn
  * for the typed façade and for streaming state use. Ties break toward the
  * larger value to stay deterministic under merge reordering.
  */
class LatestFn[T](implicit ord: Ordering[T])
    extends CombineFn[(Long, T), Option[(Long, T)], Option[T]] {
  override def createAccumulator(): Option[(Long, T)] = None
  override def addInput(acc: Option[(Long, T)], in: (Long, T)): Option[(Long, T)] =
    mergeAccumulators(acc, Some(in))
  override def mergeAccumulators(a: Option[(Long, T)], b: Option[(Long, T)]): Option[(Long, T)] =
    (a, b) match {
      case (Some(x), Some(y)) =>
        if (x._1 > y._1 || (x._1 == y._1 && ord.gteq(x._2, y._2))) a else b
      case (x, None) => x
      case (None, y) => y
    }
  override def extractOutput(acc: Option[(Long, T)]): Option[T] = acc.map(_._2)
}

/** Mean with (count, sum) accumulator (reference: SDK/transforms/Mean.java:66
  * — accumulator is CountSum). */
class MeanFn extends CombineFn[Double, (Long, Double), Double] {
  override def createAccumulator(): (Long, Double) = (0L, 0.0)
  override def addInput(acc: (Long, Double), in: Double): (Long, Double) =
    (acc._1 + 1, acc._2 + in)
  override def mergeAccumulators(a: (Long, Double), b: (Long, Double)): (Long, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def extractOutput(acc: (Long, Double)): Double =
    if (acc._1 == 0) 0.0 else acc._2 / acc._1
}

object CombineFns {
  /** TimestampCombiner support (reference:
    * windowing/TimestampCombiner.java — END_OF_WINDOW default per
    * WindowingStrategy.java:103, EARLIEST, LATEST): wraps a CombineFn over
    * (eventTimeMs, value) pairs so every pane also carries the
    * earliest/latest element time; the caller picks the pane's output
    * timestamp (end-of-window needs nothing — the pane already has the
    * window end). */
  def withTimestamps[V, ACC, OUT](fn: CombineFn[V, ACC, OUT])
      : CombineFn[(Long, V), (Long, Long, ACC), (Long, Long, OUT)] =
    new CombineFn[(Long, V), (Long, Long, ACC), (Long, Long, OUT)] {
      override def createAccumulator(): (Long, Long, ACC) =
        (Long.MaxValue, Long.MinValue, fn.createAccumulator())
      override def addInput(acc: (Long, Long, ACC), in: (Long, V)): (Long, Long, ACC) =
        (math.min(acc._1, in._1), math.max(acc._2, in._1), fn.addInput(acc._3, in._2))
      override def mergeAccumulators(a: (Long, Long, ACC), b: (Long, Long, ACC)): (Long, Long, ACC) =
        (math.min(a._1, b._1), math.max(a._2, b._2), fn.mergeAccumulators(a._3, b._3))
      override def extractOutput(acc: (Long, Long, ACC)): (Long, Long, OUT) =
        (acc._1, acc._2, fn.extractOutput(acc._3))
    }

  /** TimestampCombiner modes (reference: windowing/TimestampCombiner.java —
    * END_OF_WINDOW, EARLIEST, LATEST, plus the transformed variant the Python
    * SDK exposes as OUTPUT_AT_EARLIEST_TRANSFORMED and the Java SDK reaches
    * via WindowFn#getOutputTime). Only EarliestTransformed may consult the
    * window fn's output-time transform — the custom-timestamping rows of
    * trigger_transcripts.yaml pin that EOW/EARLIEST never invoke it. */
  sealed trait TimestampCombiner
  object TimestampCombiner {
    case object EndOfWindow extends TimestampCombiner
    case object Earliest extends TimestampCombiner
    case object Latest extends TimestampCombiner
    case object EarliestTransformed extends TimestampCombiner
  }

  /** Wraps a CombineFn over (eventTimeMs, value) pairs so each pane carries
    * its resolved output timestamp. `outputTimeFn` models
    * WindowFn#getOutputTime(elementTs, window) (reference: WindowFn.java:130;
    * Python window.py get_transformed_output_time): it is applied per element
    * ONLY under EarliestTransformed. The output timestamp is None for
    * EndOfWindow — the pane already has the window end, and no per-element
    * work (including the transform) is performed. */
  def withTimestampCombiner[V, ACC, OUT](
      fn: CombineFn[V, ACC, OUT], combiner: TimestampCombiner,
      outputTimeFn: Long => Long = identity)
      : CombineFn[(Long, V), (Long, ACC), (Option[Long], OUT)] =
    new CombineFn[(Long, V), (Long, ACC), (Option[Long], OUT)] {
      private val sentinel = combiner match {
        case TimestampCombiner.Latest => Long.MinValue
        case _                        => Long.MaxValue
      }
      override def createAccumulator(): (Long, ACC) = (sentinel, fn.createAccumulator())
      override def addInput(acc: (Long, ACC), in: (Long, V)): (Long, ACC) = {
        val ts = combiner match {
          case TimestampCombiner.EndOfWindow          => sentinel
          case TimestampCombiner.Earliest             => math.min(acc._1, in._1)
          case TimestampCombiner.Latest               => math.max(acc._1, in._1)
          case TimestampCombiner.EarliestTransformed  => math.min(acc._1, outputTimeFn(in._1))
        }
        (ts, fn.addInput(acc._2, in._2))
      }
      override def mergeAccumulators(a: (Long, ACC), b: (Long, ACC)): (Long, ACC) = {
        val ts = combiner match {
          case TimestampCombiner.Latest => math.max(a._1, b._1)
          case _                        => math.min(a._1, b._1)
        }
        (ts, fn.mergeAccumulators(a._2, b._2))
      }
      override def extractOutput(acc: (Long, ACC)): (Option[Long], OUT) = {
        val ts = if (combiner == TimestampCombiner.EndOfWindow || acc._1 == sentinel) None
                 else Some(acc._1)
        (ts, fn.extractOutput(acc._2))
      }
    }

  /** CombineFns.compose (reference: SDK/transforms/CombineFns.java): several
    * CombineFns in one pass = several aggregate Columns in one .agg() — in
    * Spark this is native; helpers kept for the typed façade. */
  def compose2[IN, A1, O1, A2, O2](f1: CombineFn[IN, A1, O1], f2: CombineFn[IN, A2, O2])
      : CombineFn[IN, (A1, A2), (O1, O2)] =
    new CombineFn[IN, (A1, A2), (O1, O2)] {
      override def createAccumulator(): (A1, A2) = (f1.createAccumulator(), f2.createAccumulator())
      override def addInput(acc: (A1, A2), in: IN): (A1, A2) =
        (f1.addInput(acc._1, in), f2.addInput(acc._2, in))
      override def mergeAccumulators(a: (A1, A2), b: (A1, A2)): (A1, A2) =
        (f1.mergeAccumulators(a._1, b._1), f2.mergeAccumulators(a._2, b._2))
      override def extractOutput(acc: (A1, A2)): (O1, O2) =
        (f1.extractOutput(acc._1), f2.extractOutput(acc._2))
    }

  def compose3[IN, A1, O1, A2, O2, A3, O3](
      f1: CombineFn[IN, A1, O1], f2: CombineFn[IN, A2, O2], f3: CombineFn[IN, A3, O3])
      : CombineFn[IN, ((A1, A2), A3), ((O1, O2), O3)] =
    compose2(compose2(f1, f2), f3)

  /** N-ary homogeneous compose (reference: CombineFns.ComposedCombineFn —
    * arbitrary arity; the heterogeneous typed case is compose2/compose3). */
  def composeAll[IN, A, O](fns: Seq[CombineFn[IN, A, O]]): CombineFn[IN, List[A], List[O]] =
    new CombineFn[IN, List[A], List[O]] {
      override def createAccumulator(): List[A] = fns.map(_.createAccumulator()).toList
      override def addInput(acc: List[A], in: IN): List[A] =
        acc.lazyZip(fns).map((a, f) => f.addInput(a, in))
      override def mergeAccumulators(a: List[A], b: List[A]): List[A] =
        a.lazyZip(b).lazyZip(fns).map((x, y, f) => f.mergeAccumulators(x, y))
      override def extractOutput(acc: List[A]): List[O] =
        acc.lazyZip(fns).map((a, f) => f.extractOutput(a))
    }
}
