package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder2(x, y)` → bigint: the Morton (Z-order) interleave of the low 31
  * bits of two non-negative keys — bit i of x lands at output bit 2i, bit i
  * of y at 2i+1.
  *
  * Rows sorted by the z-value cluster BOTH dimensions at once, so a
  * range-partitioned, z-sorted table layout gives parquet min/max pruning
  * on either column — the standard multi-dimension layout trick (Delta's
  * OPTIMIZE ZORDER, Iceberg's sort orders) expressed as a plain codegen'd
  * expression. Inputs are masked to 31 bits; callers bucket/normalize
  * wider domains first (bit-equality with the SQL-expressible reference
  * formulation is fuzz-pinned).
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects two bigint keys, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ZOrder2.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $helper.interleave($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  def interleave(x: Long, y: Long): Long = {
    var out = 0L
    var i = 0
    val xm = x & 0x7fffffffL
    val ym = y & 0x7fffffffL
    while (i < 31) {
      out |= ((xm >>> i) & 1L) << (2 * i)
      out |= ((ym >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }
}
