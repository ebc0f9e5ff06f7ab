package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle extractor — the hot kernel of every shingle-based
  * dedup operator (MinHash, SimHash, n-gram Jaccard, near-dup clustering).
  *
  * Replaces the Catalyst higher-order chain
  * `array_distinct(filter(transform(sequence(...), i => concat_ws(" ",
  * slice(split(lower(text), "\\s+"), i+1, n)))))` (Dedup.shingles), whose
  * lambdas evaluate INTERPRETED — per-shingle closure dispatch and
  * intermediate array allocations outside whole-stage codegen. This
  * expression runs one imperative pass per document inside codegen.
  *
  * Semantics are BIT-IDENTICAL to the lambda form (DedupSimilaritySpec
  * pins the equivalence on the real corpus): UTF8String.toLowerCase (the
  * same kernel `lower()` uses), Java `\s+` regex split with limit -1 (the
  * same kernel `split()` uses — leading empty token preserved), shingles
  * of exactly `n` consecutive words joined by single spaces, fewer than
  * `n` words → empty array, duplicates dropped keeping FIRST occurrence
  * (array_distinct order).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // NULL text yields an EMPTY shingle set, exactly like the lambda
  // specification (size(null) = -1 short-circuits it to []), so the
  // expression itself never returns null
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and n >= 1 (got ${child.dataType}, n=$n)")

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  /** One pass: lowercase, split, slide an n-window, dedup first-occurrence.
    * Public so generated code can invoke it via a reference object. */
  def computeShingles(text: UTF8String): ArrayData = {
    val words = ws.split(text.toLowerCase.toString, -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(16, words.length - n + 1))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Shared empty result (GenericArrayData is immutable). Public for the
    * generated code path. */
  val emptyShingles: ArrayData = new GenericArrayData(Array.empty[Any])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyShingles else computeShingles(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one call into the compiled pass — keeps the operator inside
    // WholeStageCodegen (no interpreted lambda tree per element); null
    // input short-circuits to the shared empty array
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    val childGen = child.genCode(ctx)
    val arrayCls = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        |${childGen.code}
        |$arrayCls ${ev.value} = ${childGen.isNull}
        |  ? $ref.emptyShingles() : $ref.computeShingles(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Distinct word n-gram shingles of a string column (codegen'd). */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
