package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, TimestampNTZType}

/** Native Catalyst expression: the epoch micros of a TIMESTAMP_NTZ wall
  * clock read AS UTC, independent of the session timezone.
  *
  * A TIMESTAMP_NTZ value IS physically the microseconds since
  * 1970-01-01T00:00 of its wall clock (Catalyst's LocalDateTime
  * representation), which is exactly "the wall clock interpreted as UTC"
  * — so the conversion is a zero-cost long reinterpretation, not field
  * arithmetic. The alternative `cast("timestamp")` would interpret the
  * wall clock in the SESSION zone, shifting every value for a non-UTC
  * embedder; `to_utc_timestamp` implicitly casts NTZ through the session
  * zone first, same defect. Used by the NTZ ingestion normalization
  * ([[graft.Tables]]) and the dq_freshness audit; session-independence
  * is spec-asserted under an Asia/Tokyo session.
  */
case class NtzMicros(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(TimestampNTZType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ntz_micros"

  // the internal value already IS the answer
  protected override def nullSafeEval(a: Any): Any = a

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): NtzMicros =
    copy(child = newChild)
}
