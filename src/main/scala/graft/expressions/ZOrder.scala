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

/** `zorder(x1, …, xn)` → bigint: the n-column Morton interleave — bit i of
  * column j lands at output bit n·i + j, each column masked to
  * ⌊63/n⌋ bits. 100 TB tables cluster on 3-4 columns, not 2: the uniform
  * bit budget keeps every column's resolution equal so range filters on
  * ANY of the n columns prune z-sorted files/row groups (a column with
  * more bits than the others would dominate the order and starve the
  * rest — Delta's OPTIMIZE ZORDER makes the same equal-budget choice).
  * n = 2 with this bit budget is NOT [[ZOrder2]] (31 bits/column);
  * `zorder2` remains the two-column form with maximal resolution.
  *
  * Inputs are masked to the budget; callers bucket/normalize wider
  * domains first. The mapping is a pure bit shuffle, monotone in each
  * column when the others are fixed, and SQL-expressible — the q127
  * oracle replays it as list arithmetic in DuckDB.
  */
case class ZOrderN(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 8)
      TypeCheckResult.TypeCheckFailure(
        s"zorder expects 2 to 8 bigint keys, got ${children.size}")
    else if (children.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"zorder expects bigint keys, got ${children.map(_.dataType.sql).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var j = 0
    while (j < children.size) {
      val v = children(j).eval(input)
      if (v == null) return null
      vals(j) = v.asInstanceOf[Long]
      j += 1
    }
    ZOrderN.interleave(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ZOrderN.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val evs = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val anyNull = evs.map(e => e.isNull.toString).mkString(" || ")
    val fills = evs.zipWithIndex.map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    val src =
      s"""
         |${evs.map(_.code.toString).mkString("\n")}
         |boolean ${ev.isNull} = $anyNull;
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  long[] $arr = new long[${children.size}];
         |  $fills
         |  ${ev.value} = $helper.interleave($arr);
         |}
         |""".stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.CodeBlock(
      Seq(src), Seq.empty))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderN {
  def interleave(xs: Array[Long]): Long = {
    val n = xs.length
    val width = 63 / n
    val mask = (1L << width) - 1
    var out = 0L
    var j = 0
    while (j < n) {
      val v = xs(j) & mask
      var i = 0
      while (i < width) {
        out |= ((v >>> i) & 1L) << (n * i + j)
        i += 1
      }
      j += 1
    }
    out
  }
}
