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
class ReservoirSampleFn[T: ClassTag](n: Int, seed: Long)
    extends CombineFn[T, List[(Long, T)], List[T]] {
  private def priority(in: T): Long = {
    // splitmix64 of (seed ^ element hash): stable, well-mixed priority
    var z = seed ^ in.hashCode().toLong * 0x9E3779B97F4A7C15L
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
    acc.sortBy(_._1).map(_._2)
  private def trim(xs: List[(Long, T)]): List[(Long, T)] =
    if (xs.sizeIs <= n) xs else xs.sortBy(_._1).take(n)
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
  /** CombineFns.compose (reference: SDK/transforms/CombineFns.java): several
    * CombineFns in one pass = several aggregate Columns in one .agg() — in
    * Spark this is native; helper kept for the typed façade. */
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
}
