package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

object VectorExpressions {
  /** Dot product of two numeric array columns (codegen'd). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Integer dot product of two integral array columns (codegen'd, long). */
  def vecDotInt(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotProductInt(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
