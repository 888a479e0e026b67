package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane LSH signature: all `bits` sign bits of
  * vec·plane_i packed into one Long, computed in a single fused codegen loop.
  *
  * The higher-order-function formulation (`bits` separate
  * `aggregate(zip_with(...))` dot products OR'd together) is CodegenFallback
  * and re-reads the vector `bits` times per row — measured as the dominant
  * cost of LSH ANN and embedding near-dup (round-1 bench: q42 21.5 s at
  * sf0.1, almost entirely interpreted-HOF signature evaluation). This
  * expression reads the vector once per plane inside generated Java,
  * bit-identically to the HOF version: the dot product accumulates
  * left-to-right in double, and bit i is set iff dot >= 0.
  *
  * Hyperplanes are seeded-deterministic Gaussians (`scala.util.Random(seed)
  * .nextGaussian`, row-major plane-by-plane), regenerated lazily on each
  * executor — tiny model state (bits × dim doubles), never shipped per row.
  *
  * Registered as `hyperplane_sig(vec, dim, bits, seed)` by
  * [[graft.extensions.GraftExtensions]]; dim/bits/seed must be foldable
  * literals (they parameterize plane generation, not per-row data).
  */
case class HyperplaneSignature(child: Expression, dim: Int, bits: Int, seed: Long)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<double>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  /** Same generation order as the reference HOF implementation
    * (Seq.fill(bits)(Seq.fill(dim)(nextGaussian))) — signatures must be
    * bit-identical across both paths.
    */
  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneSignature.signature(input.asInstanceOf[ArrayData], planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val helper = HyperplaneSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $helper.signature($v, $planesRef, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** Shared by interpreted eval and generated code. Matches the HOF
    * reference formulation exactly, including its degenerate cases: a
    * wrong-length vector or any null element nulls every `zip_with`
    * `aggregate` dot there, clearing every bit — so here too those rows get
    * signature 0 rather than a silently-truncated partial dot.
    */
  def signature(vec: ArrayData, planes: Array[Array[Double]], dim: Int): Long = {
    val n = vec.numElements()
    if (n != dim) return 0L
    var j = 0
    while (j < n) { if (vec.isNullAt(j)) return 0L; j += 1 }
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var d = 0.0
      j = 0
      while (j < n) { d += vec.getDouble(j) * p(j); j += 1 }
      if (d >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
