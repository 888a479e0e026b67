package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenization. The column-expression formulation
  * (`filter(split(text, "\\s+"), _ =!= "")`) is an interpreted higher-order
  * ArrayFilter over a regex split — CodegenFallback, and it allocates the
  * un-filtered split array per row. Round-2 profiling showed the SimHash
  * near-dup pipeline re-running it three times over the corpus (minTokens
  * filter, signature votes, term vectors) as the single largest bench cost.
  * These run one fused byte scan per row (same byte-level tokenizer as
  * [[ShingleOps]] — delimiters are ASCII and UTF-8 is self-synchronizing,
  * so the scan is multi-byte safe) and stay inside whole-stage codegen.
  */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens expects string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.wsTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ShingleOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ops.wsTokens($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_count(text)` → int: whitespace-token count without materializing
  * the token array — `size(filter(split(text, "\\s+"), _ =!= ""))`.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_count expects string, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ShingleOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ops.tokenCount($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
