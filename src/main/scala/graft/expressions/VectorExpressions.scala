package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding dot product: the one scalar
  * kernel hot enough to justify `doGenCode` (SURVEY §4.2 preference order —
  * native Expression > higher-order lambda > UDF). The
  * `aggregate(zip_with(...))` formulation it replaces is a Catalyst
  * higher-order function chain: interpreted evaluation, two intermediate
  * arrays allocated per row-pair. This compiles to a tight primitive loop
  * inside WholeStageCodegen — no allocation, no virtual calls.
  *
  * Semantics match the lambda version exactly: elements promoted to double,
  * products accumulated left-to-right (bit-identical sums, which the DuckDB
  * oracle comparisons rely on), and NULL on length mismatch or any null
  * element — the same null-poisoning aggregate(zip_with(...)) produced, so
  * malformed vector pairs stay excluded by downstream threshold filters
  * instead of scoring a fabricated prefix sum.
  */
case class VecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch / null element
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType | ShortType | ByteType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def get(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case other       => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    if (x.numElements() != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += get(x, i, lt) * get(y, i, rt)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def accessor(dt: DataType, arr: String, i: String): String = dt match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case ShortType   => s"(double) $arr.getShort($i)"
      case ByteType    => s"(double) $arr.getByte($i)"
      case other       => throw new IllegalStateException(s"unsupported element type $other")
    }
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($l.numElements() != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $l.numElements(); $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${accessor(lt, l, i)} * ${accessor(rt, r, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over integral arrays (byte/short/int), accumulated
  * in LONG — the int8-quantized scoring kernel. Unlike [[VecDotProduct]]
  * it never converts elements to double: products stay in int arithmetic
  * (max |product| = 2^14 for int8), the accumulator in long (exact for any
  * realistic dims), one conversion at the very end by the caller. Same
  * null contract as VecDotProduct: NULL on length mismatch or null
  * element. */
case class VecDotProductInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_int"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(ByteType | ShortType | IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires byte/short/int array inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def get(arr: ArrayData, i: Int, dt: DataType): Long = dt match {
    case ByteType    => arr.getByte(i).toLong
    case ShortType   => arr.getShort(i).toLong
    case IntegerType => arr.getInt(i).toLong
    case other       => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    if (x.numElements() != y.numElements()) return null
    var sum = 0L
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += get(x, i, lt) * get(y, i, rt)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def accessor(dt: DataType, arr: String, i: String): String = dt match {
      case ByteType    => s"(long) $arr.getByte($i)"
      case ShortType   => s"(long) $arr.getShort($i)"
      case IntegerType => s"(long) $arr.getInt($i)"
      case other       => throw new IllegalStateException(s"unsupported element type $other")
    }
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($l.numElements() != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $l.numElements(); $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${accessor(lt, l, i)} * ${accessor(rt, r, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass int8 scalar quantization of a float/double array:
  * struct(q: array<tinyint>, lo, scale, qsum). A single O(d) traversal
  * computes min/max, a second emits the byte grid and Σq. Replaces the
  * transform/aggregate HOF formulation, whose interpreted lambdas
  * re-evaluated the lambda-invariant array_min/array_max subtrees PER
  * ELEMENT (O(d²) per row — measured as the dominant cost of the
  * quantization queries). Interpreted eval (CodegenFallback) is one
  * virtual call per ROW around tight loops — the per-element HOF overhead
  * is what mattered. NULL input or any NULL element → NULL (the
  * VecDotProduct null-poisoning convention). */
case class QuantizeInt8Vec(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = QuantizeInt8Vec.outType
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a float/double array input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      xs(i) = elemType match {
        case FloatType  => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case other      => throw new IllegalStateException(s"unsupported element type $other")
      }
      i += 1
    }
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    i = 0
    while (i < n) {
      // NaN compares false against everything: it would silently skip the
      // min/max scan and then land in the grid as byte 0 — corrupting
      // scores downstream with no signal. Infinities make the scale
      // degenerate. Fail loud instead (the ANSI-cast behavior of the HOF
      // formulation this kernel replaced).
      if (xs(i).isNaN || xs(i).isInfinite)
        throw new IllegalArgumentException(
          s"quantize_int8: non-finite element ${xs(i)} at index $i")
      if (xs(i) < lo) lo = xs(i); if (xs(i) > hi) hi = xs(i); i += 1
    }
    if (n == 0) { lo = 0.0; hi = 0.0 }
    val scale = (hi - lo) / 255.0
    val q = new Array[Byte](n)
    var qsum = 0L
    i = 0
    while (i < n) {
      val b = if (hi == lo) 0.toByte
        else (math.floor((xs(i) - lo) * 255.0 / (hi - lo) + 0.5) - 128).toByte
      q(i) = b
      qsum += b
      i += 1
    }
    InternalRow(new GenericArrayData(q.map(b => b: Any)), lo, scale, qsum)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8Vec {
  val outType: StructType = StructType(Seq(
    StructField("q", ArrayType(ByteType, containsNull = false)),
    StructField("lo", DoubleType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("qsum", LongType, nullable = false)))
}

/** One-pass product-quantization encode: the m per-subspace argmin codes of
  * a vector against constant codebooks. Replaces an m×ksub literal-dot
  * expression tree whose per-subspace `array_sort`-of-structs ran
  * interpreted (CodegenFallback) and re-entered expression evaluation
  * 128 times per row — measured ~0.5 ms/row; this kernel is one virtual
  * call per row around primitive loops (the [[QuantizeInt8Vec]] precedent).
  *
  * Argmin contract (identical to the `round(‖c‖²/2 − s·c, 9)` +
  * code-ascending formulation the DuckDB oracle replays): raw doubles
  * decide when the gap exceeds 1e-8 — a margin 10× the worst rounding
  * displacement, so the rounded comparison provably agrees — and only
  * near-ties pay the exact Spark-`round` (BigDecimal HALF_UP at 9 dp)
  * resolution, with the lower code index winning exact ties. NULL input or
  * NULL element → NULL; a length not equal to the codebook's m·d/m is a
  * loud error (corrupt vector, not a rankable row). */
case class PqEncodeVec(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private lazy val m = codebooks.length
  private lazy val dsub = codebooks(0)(0).length
  private lazy val halfC2: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x * x).sum / 2.0))

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a float/double array input, got $other")
    }

  private def round9(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector length $n != m*dsub = ${m * dsub}")
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      xs(i) = elemType match {
        case FloatType  => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case other      => throw new IllegalStateException(s"unsupported element type $other")
      }
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j); val h = halfC2(j); val off = j * dsub
      var bestC = 0
      var bestD = { // d_0
        var s = 0.0; var p = 0
        while (p < dsub) { s += xs(off + p) * cb(0)(p); p += 1 }
        h(0) - s
      }
      var c = 1
      while (c < cb.length) {
        var s = 0.0; var p = 0
        while (p < dsub) { s += xs(off + p) * cb(c)(p); p += 1 }
        val d = h(c) - s
        if (d < bestD - 1e-8) { bestD = d; bestC = c }
        else if (d < bestD + 1e-8 && round9(d) < round9(bestD)) { bestD = d; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes.map(x => x: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid argmin against a constant centroid matrix — the
  * >64-centroid assignment kernel for the IVF/SemDeDup family
  * ([[graft.operators.Similarity.assignToCentroids]]). Replaces a
  * crossJoin(broadcast(centroids)) + per-(row,centroid) struct + min-by-id
  * aggregate: at 2M rows × 2048 centroids (the r17 sf100 decade probe)
  * that plan materialized 4.1B short-lived struct rows through an
  * aggregate and exhausted the default 8g harness heap on allocation
  * pressure alone. This kernel is one virtual call per row around
  * primitive loops ([[PqEncodeVec]] precedent) — no join, no shuffle, no
  * per-candidate allocation.
  *
  * Argmin contract, identical to the replaced plan and to the DuckDB
  * replay: the cell minimizing round(-dot/(‖v‖·‖c‖), 9), ties to the
  * LOWER cell index. Raw doubles decide when the gap exceeds 1e-8 (10×
  * the worst 9-dp rounding displacement, so the rounded comparison
  * provably agrees); only near-ties pay the exact Spark-round (BigDecimal
  * HALF_UP at 9 dp). The dot products and the row norm accumulate
  * left-to-right with float→double widening — bit-identical to
  * [[VecDotProduct]] / sqrt(vecDot(v,v)). NULL input or NULL element →
  * NULL; a dimension mismatch is a loud error (corrupt vector, not a
  * rankable row); an all-zero vector (cosine undefined against every
  * centroid — the old plan's NaN-everywhere tie) resolves to cell 0, the
  * same tie-to-lowest outcome. A zero-norm CENTROID ranks +Inf (never
  * wins over a real centroid) — the literal path's NaN negcos sorts last
  * in the struct array_sort, and raw NaN here would instead poison every
  * comparison and freeze the argmin at cell 0. */
case class NearestCentroidVec(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "nearest_centroid needs at least one centroid")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private lazy val dim = centroids(0).length
  private lazy val cnorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a float/double array input, got $other")
    }

  private def round9(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector length $n != centroid dim $dim")
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      xs(i) = elemType match {
        case FloatType  => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case other      => throw new IllegalStateException(s"unsupported element type $other")
      }
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < n) { ss += xs(i) * xs(i); i += 1 }
    val vnorm = math.sqrt(ss)
    if (vnorm == 0.0) return 0
    // a zero-norm centroid's cosine is undefined (-0/0 = NaN); NaN would
    // poison the argmin (every comparison false), so it ranks as +Inf —
    // never beats a real centroid, matching the <=64 literal path where
    // the NaN negcos sorts LAST in the struct array_sort. +Inf never
    // reaches round9 (the near-tie window around +-Inf is empty).
    var bestCell = 0
    var bestRaw = if (cnorms(0) == 0.0) Double.PositiveInfinity else {
      var s = 0.0; var p = 0
      while (p < dim) { s += xs(p) * centroids(0)(p); p += 1 }
      -s / (vnorm * cnorms(0))
    }
    var c = 1
    while (c < centroids.length) {
      val raw = if (cnorms(c) == 0.0) Double.PositiveInfinity else {
        var s = 0.0; var p = 0
        while (p < dim) { s += xs(p) * centroids(c)(p); p += 1 }
        -s / (vnorm * cnorms(c))
      }
      if (raw < bestRaw - 1e-8) { bestRaw = raw; bestCell = c }
      else if (raw < bestRaw + 1e-8 && round9(raw) < round9(bestRaw)) {
        bestRaw = raw; bestCell = c
      }
      c += 1
    }
    bestCell
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass Johnson–Lindenstrauss random projection: y_j = (1/√k) ·
  * Σ_i sign(h(seed, j, i)) · x_i — a Rademacher (±1) projection matrix
  * materialized NOWHERE: each sign is recomputed from a splitmix64 mix of
  * (seed, j, i), so the "matrix" ships as 12 bytes of parameters to every
  * executor instead of a d×k broadcast, and any two calls with the same
  * seed project into the SAME space (the property that makes projected
  * corpora comparable across runs and increments). Achlioptas 2003 shows
  * ±1 entries satisfy the JL lemma with the same distortion bounds as
  * Gaussians.
  *
  * Why a native expression: the HOF formulation (transform over a
  * k-sequence of aggregates over d) is interpreted and allocates per
  * element — O(k·d) lambda dispatches per row. This is one virtual call
  * around two primitive loops ([[PqEncodeVec]] precedent). NULL input or
  * NULL element → NULL (the family's null-poisoning convention);
  * non-finite elements fail loud like [[QuantizeInt8Vec]]. */
case class RandomProjectVec(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  require(outDim > 0, s"random_project: outDim must be > 0, got $outDim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "random_project"

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a float/double array input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      xs(i) = elemType match {
        case FloatType  => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case other      => throw new IllegalStateException(s"unsupported element type $other")
      }
      if (xs(i).isNaN || xs(i).isInfinite)
        throw new IllegalArgumentException(
          s"random_project: non-finite element ${xs(i)} at index $i")
      i += 1
    }
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      i = 0
      while (i < n) {
        if ((RandomProjectVec.mix(seed, j, i) & 1L) == 0L) acc += xs(i)
        else acc -= xs(i)
        i += 1
      }
      out(j) = acc * inv
      j += 1
    }
    new GenericArrayData(out.map(d => d: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandomProjectVec {
  /** splitmix64 finalizer over a combined (seed, j, i) key — full 64-bit
    * avalanche so adjacent (j, i) cells decorrelate. */
  def mix(seed: Long, j: Int, i: Int): Long = {
    var z = seed ^ (j.toLong * 0x9E3779B97F4A7C15L) ^ (i.toLong * 0xBF58476D1CE4E5B9L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

object VectorExpressions {
  /** Dot product of two numeric array columns (codegen'd). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** PQ codes of a vector column against constant codebooks (native, one
    * pass per row). */
  def pqEncodeVec(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeVec(ColumnBridge.expression(v), codebooks))

  /** Nearest-centroid cell index of a vector column against a constant
    * centroid matrix (native, one pass per row). */
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidVec(ColumnBridge.expression(v), centroids))

  /** One-pass int8 quantization (native expression, O(d) per row). */
  def quantizeInt8Vec(v: Column): Column =
    ColumnBridge.column(QuantizeInt8Vec(ColumnBridge.expression(v)))

  /** Integer dot product of two integral array columns (codegen'd, long). */
  def vecDotInt(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotProductInt(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** JL random projection to `outDim` dims (native, seeded Rademacher). */
  def randomProjectVec(v: Column, outDim: Int, seed: Long): Column =
    ColumnBridge.column(RandomProjectVec(ColumnBridge.expression(v), outDim, seed))
}
