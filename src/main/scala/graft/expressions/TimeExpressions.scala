package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Epoch microseconds from either timestamp flavor, fail-loud on anything
  * else at ANALYSIS time.
  *
  * Both TIMESTAMP (LTZ) and TIMESTAMP_NTZ store microseconds-since-epoch as
  * a primitive long internally — NTZ encodes the wall clock as-if-UTC, which
  * under the enforced UTC session timezone IS the instant DuckDB's
  * `epoch_us` reads for a naive timestamp[us]. So value extraction is the
  * identity on the internal long (zero-cost inside WholeStageCodegen) and
  * all the safety lives in `checkInputDataTypes`:
  *
  *  - a non-timestamp input (e.g. a LongType epoch-micros column such as the
  *    lo/hi bounds range-join code passes around) is rejected outright — the
  *    previous cast-based formulation would have silently read it as SECONDS
  *    since epoch, a 10^6 error;
  *  - an NTZ input under a non-UTC session is rejected (same contract as
  *    calendar windows): the value here would still be the UTC
  *    interpretation, but every OTHER NTZ→LTZ cast in the query would shift
  *    by the session offset, producing inconsistent timelines.
  *
  * Replaces the reference's Instant/epoch-millis plumbing
  * (sdks/java/core/.../transforms/windowing/BoundedWindow.java:46 —
  * TIMESTAMP_MIN/MAX as epoch millis) with analysis-checked µs extraction.
  */
case class EpochMicrosExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "epoch_micros"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType => TypeCheckResult.TypeCheckSuccess
    case TimestampNTZType =>
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .map(_.conf.get("spark.sql.session.timeZone")) match {
        case Some(z) if graft.GraftSession.isUtcZone(z) =>
          TypeCheckResult.TypeCheckSuccess
        case Some(z) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName on a TIMESTAMP_NTZ column requires " +
            s"spark.sql.session.timeZone=UTC, got '$z' (an NTZ wall clock " +
            "cast under any other zone would silently shift epoch micros)")
        case None => TypeCheckResult.TypeCheckFailure(
          s"$prettyName on a TIMESTAMP_NTZ column: no active or default " +
            "SparkSession to verify session.timeZone=UTC against — refusing " +
            "rather than skipping the fail-loud check")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects TIMESTAMP or TIMESTAMP_NTZ, got " +
        s"${other.catalogString}. An integer epoch column must not be " +
        "passed here: a cast from LongType to timestamp reads the value as " +
        "SECONDS since epoch — a 10^6 error for a micros column")
  }

  override protected def nullSafeEval(t: Any): Any = t.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): EpochMicrosExpr =
    copy(child = newChild)
}
