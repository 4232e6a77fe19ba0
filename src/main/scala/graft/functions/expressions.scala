package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native text normalizer (Unicode NFC + lowercase + `\w+` re-join).
  *
  * This replaces the reference's per-row Python closure
  * (`/root/reference/vspace/utils/text.py:5-17`, applied at
  * `/root/reference/vspace/pipelines/base.py:181`) with a codegen'd
  * expression: the call stays inside WholeStageCodegen, no Python worker
  * pipe, no UDF serialization — the structural perf win of the rebuild.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    TextKernels.normalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.normalizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Codegen'd 64-bit polynomial rolling hash of a string (2^64 ring).
  * Building block for document fingerprinting (winnowing) and SimHash.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    TextKernels.rollingHash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.rollingHash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
