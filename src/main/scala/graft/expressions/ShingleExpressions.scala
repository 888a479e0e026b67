package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native k-token shingling. The column-expression formulation
  * (`transform(sequence(...), i => concat_ws(" ", slice(tokens, i+1, k)))`
  * plus `array_distinct(transform(_, xxhash64))`) is a chain of interpreted
  * higher-order functions that allocates every shingle string per row —
  * round-1 profiling showed it as ~80% of MinHash near-dup cost (shingling
  * 10k docs: ~9 s of q40's 10.4 s at sf0.1). These expressions produce
  * byte-identical results in one fused pass per row:
  *
  * - tokens = maximal runs of non-ASCII-whitespace bytes of the lowercased
  *   text (exactly `filter(split(lower(text), "\\s+"), _ =!= "")`);
  * - shingle i = tokens(i..i+k-1) joined with a single space;
  * - [[ShingleHashes]] hashes each shingle's UTF-8 bytes with Spark's own
  *   XXH64 (seed 42 — the `xxhash64` default) and keeps first-occurrence
  *   distinct values, exactly `array_distinct(transform(_, xxhash64))`.
  *
  * Byte-level scanning is safe: the delimiters are ASCII and UTF-8 is
  * self-synchronizing, so multi-byte characters can never straddle a token
  * boundary.
  */
object ShingleOps {

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d) // java regex \s = [ \t\n\x0B\f\r]

  /** (starts, ends) byte offsets of tokens in `bytes`. */
  private def tokenSpans(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val n = bytes.length
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var count = 0
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        val s = i
        while (i < n && !isSpace(bytes(i))) i += 1
        if (count == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(count) = s; ends(count) = i; count += 1
      }
    }
    (starts, ends, count)
  }

  /** Copy tokens w..w+k-1 joined by ' ' into a scratch buffer; returns len. */
  private def joinInto(
      bytes: Array[Byte], starts: Array[Int], ends: Array[Int],
      w: Int, k: Int, buf: Array[Byte]): Int = {
    var len = 0
    var t = w
    while (t < w + k) {
      if (t > w) { buf(len) = 0x20; len += 1 }
      val tl = ends(t) - starts(t)
      System.arraycopy(bytes, starts(t), buf, len, tl)
      len += tl
      t += 1
    }
    len
  }

  def shingleStrings(lowered: UTF8String, k: Int): ArrayData = {
    val bytes = lowered.getBytes
    val (starts, ends, nTok) = tokenSpans(bytes)
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - k + 1)
    var w = 0
    while (w <= nTok - k) {
      val len = ends(w + k - 1) - starts(w)
      // token spans within a shingle are contiguous in the source except for
      // whitespace runs between them — rebuild with single spaces
      val buf = new Array[Byte](len)
      val m = joinInto(bytes, starts, ends, w, k, buf)
      out(w) = UTF8String.fromBytes(buf, 0, m)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Tokens as an array — exactly `filter(split(text, "\\s+"), _ =!= "")`
    * (no case folding; callers lower() first when they need it).
    */
  def wsTokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val (starts, ends, n) = tokenSpans(bytes)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Token count without materializing the array — `size(tokens(text))`. */
  def tokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var count = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        count += 1
        while (i < n && !isSpace(bytes(i))) i += 1
      }
    }
    count
  }

  def shingleHashes(lowered: UTF8String, k: Int, seed: Long): ArrayData = {
    val bytes = lowered.getBytes
    val (starts, ends, nTok) = tokenSpans(bytes)
    if (nTok < k) return new GenericArrayData(Array.empty[Long])
    var maxLen = 0
    var w = 0
    while (w <= nTok - k) {
      val l = ends(w + k - 1) - starts(w)
      if (l > maxLen) maxLen = l
      w += 1
    }
    val buf = new Array[Byte](maxLen)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    w = 0
    while (w <= nTok - k) {
      val m = joinInto(bytes, starts, ends, w, k, buf)
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, m, seed)
      seen.add(h)
      w += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** `shingle_strings(text, k)` → array<string>: the k-token shingles of the
  * lowercased text in order (possibly with duplicates — mirrors the HOF
  * formulation; Jaccard callers wrap in array_distinct).
  */
case class ShingleStrings(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_strings expects string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.shingleStrings(input.asInstanceOf[UTF8String].toLowerCase, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ShingleOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ops.shingleStrings($v.toLowerCase(), $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `shingle_hashes(text, k)` → array<bigint>: first-occurrence-distinct
  * xxhash64 (seed 42) of each k-token shingle of the lowercased text.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  private val Seed = 42L // Spark's xxhash64 default seed

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.shingleHashes(input.asInstanceOf[UTF8String].toLowerCase, k, Seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ShingleOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ops.shingleHashes($v.toLowerCase(), $k, ${Seed}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
