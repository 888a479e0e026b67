package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}

/** `simhash64(vec)`: the 64-bit SimHash signature of a sparse
  * `array<struct<term string, count bigint>>` term vector — bit b is set
  * iff the count-weighted ±1 vote over the terms' xxhash64 bit b is
  * positive. Identical values to the relational formulation (explode
  * tokens, 64 `sum(when(bit, c).otherwise(-c))` columns, pack sign bits) —
  * which is kept as the fuzz-spec reference — but one fused pass per row.
  *
  * Why native: the 64-sum-column aggregate generates a huge janino source
  * whose compile time exceeded its runtime at sf0.1, and it forces a second
  * per-doc aggregation; deriving the signature from the term vector the
  * near-dup verifier already builds makes the signature a free map stage.
  * Hash = Spark's own XXH64 with the xxhash64 default seed (42), so the
  * signature is bit-identical to `xxhash64(tok)`-based votes.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  private def termType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(s: StructType, _)
        if s.fields.length == 2 && s.fields(1).dataType == LongType &&
          (s.fields(0).dataType == StringType || s.fields(0).dataType == LongType) =>
      Some(s.fields(0).dataType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (termType(child.dataType).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<struct<string|bigint,bigint>>, got ${child.dataType.sql}")

  /** String terms are xxhash64'd internally; bigint terms are taken as the
    * term hash directly (same value as `xxhash64(term)` — the keying used
    * by the hashed term vectors the dedup pipeline builds).
    */
  private lazy val hashedKeys: Boolean = termType(child.dataType).contains(LongType)

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    if (hashedKeys) SimHash64.sigHashed(input.asInstanceOf[ArrayData])
    else SimHash64.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val fn = if (hashedKeys) "sigHashed" else "sig"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $helper.$fn($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val Seed = 42L // Spark's xxhash64 default seed

  private def vote(votes: Array[Long], h: Long, c: Long): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) votes(b) += c else votes(b) -= c
      b += 1
    }
  }

  private def pack(votes: Array[Long]): Long = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def sig(vec: ArrayData): Long = {
    val n = vec.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < n) {
      val s = vec.getStruct(i, 2)
      val t = s.getUTF8String(0)
      vote(votes, XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed), s.getLong(1))
      i += 1
    }
    pack(votes)
  }

  def sigHashed(vec: ArrayData): Long = {
    val n = vec.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < n) {
      val s = vec.getStruct(i, 2)
      vote(votes, s.getLong(0), s.getLong(1))
      i += 1
    }
    pack(votes)
  }
}
