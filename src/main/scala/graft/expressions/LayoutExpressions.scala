package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 2-D Morton (Z-order) code — the interleaved-bit sort key behind
  * Z-order data layout: rows close in BOTH dimensions land close in the
  * 1-D sort order, so range-partitioned, sorted parquet files get TIGHT
  * per-file min/max stats on both columns at once and a conjunctive range
  * predicate prunes most row groups (classic multi-dimensional clustering;
  * see sources/Layout.zorderWrite).
  *
  * Inputs are non-negative longs (normalize first: ranks, epoch offsets,
  * truncated hashes); only the low `bits` of each input participate
  * (values are masked), output bit 2i is left's bit i, 2i+1 right's bit i
  * — 2·bits ≤ 62 keeps the code positive. Null in ⇒ null out.
  */
case class MortonCode(left: Expression, right: Expression, bits: Int = 31)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_code"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType && bits >= 1 && bits <= 31)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT inputs and 1 <= bits <= 31 " +
        s"(got ${left.dataType}, ${right.dataType}, bits=$bits)")

  private val mask: Long = (1L << bits) - 1

  /** Reference implementation (also invoked from generated code). */
  def interleave(a: Long, b: Long): Long = {
    val x = a & mask; val y = b & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("morton", this, classOf[MortonCode].getName)
    defineCodeGen(ctx, ev, (l, r) => s"$ref.interleave($l, $r)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutExpressions {
  /** Morton/Z-order code of two non-negative long columns (codegen'd). */
  def mortonCode(a: Column, b: Column, bits: Int = 31): Column =
    ColumnBridge.column(MortonCode(
      ColumnBridge.expression(a), ColumnBridge.expression(b), bits))
}
