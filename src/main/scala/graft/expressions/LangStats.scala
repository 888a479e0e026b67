package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics for the quality/language signals.
  *
  * The column-expression formulations (`size(filter(tokens, _.isin(...)))`
  * per language, `aggregate(tokens, 0, _ + length(_))` for mean token
  * length) are interpreted higher-order functions — CodegenFallback — and
  * each re-walks the token array; the quality gate needs FIVE of them per
  * row. [[LangStatsOps.langStats]] computes everything those formulations
  * derive in ONE byte scan of the text, inside whole-stage codegen:
  *
  * - `n_tokens`  — whitespace-token count (== `token_count(text)`);
  * - `tok_chars` — total token length in characters (mean token length =
  *   tok_chars / n_tokens), measured on the ORIGINAL tokens like the HOF
  *   `aggregate(tokens(text), ...)`;
  * - one hit count per language — tokens whose lowercase form is in that
  *   language's stopword list (== `size(filter(tokens(lower(text)),
  *   isin(list)))`; per-token lowercasing is equivalent because lowercasing
  *   never creates or removes whitespace).
  *
  * The stopword lists are engine model state (fixed tiny per-language
  * lists), baked into the expression as a token → language-bitmask map, so
  * a token shared by several lists (`de`, `la`, `que`, ...) costs one probe.
  */
object LangStatsOps {

  /** token → bitmask of languages whose stopword list contains it (bit i =
    * langs(i)); built once per expression instance and shared by codegen.
    */
  def buildMasks(langs: Seq[(String, Seq[String])]): java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    langs.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d) // java regex \s

  def langStats(
      s: UTF8String,
      masks: java.util.HashMap[UTF8String, Integer],
      nLangs: Int): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    val counts = new Array[Int](nLangs)
    var nTok = 0
    var tokChars = 0L
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSpace(bytes(i))) i += 1
        nTok += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        tokChars += tok.numChars()
        val mask = masks.get(tok.toLowerCase)
        if (mask != null) {
          val mv = mask.intValue()
          var b = 0
          while (b < nLangs) {
            if (((mv >> b) & 1) == 1) counts(b) += 1
            b += 1
          }
        }
      }
    }
    val out = new Array[Any](2 + nLangs)
    out(0) = nTok
    out(1) = tokChars
    var b = 0
    while (b < nLangs) { out(2 + b) = counts(b); b += 1 }
    new GenericInternalRow(out)
  }
}

/** `lang_stats(text)` → struct<n_tokens:int, tok_chars:bigint, <lang>:int...>
  * — see [[LangStatsOps]]. `langs` is the fixed (language, stopwords) model
  * in tie-break order.
  */
case class LangStats(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression {
  require(langs.nonEmpty && langs.size <= 32, s"1..32 languages required, got ${langs.size}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_stats expects string, got ${other.sql}")
  }

  override def dataType: DataType = StructType(
    StructField("n_tokens", IntegerType, nullable = false) +:
      StructField("tok_chars", LongType, nullable = false) +:
      langs.map { case (l, _) => StructField(l, IntegerType, nullable = false) })

  override def prettyName: String = "lang_stats"

  @transient private lazy val masks = LangStatsOps.buildMasks(langs)

  override def nullSafeEval(input: Any): Any =
    LangStatsOps.langStats(input.asInstanceOf[UTF8String], masks, langs.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = LangStatsOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val masksRef = ctx.addReferenceObj("stopMasks", masks,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, Integer>")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ops.langStats($v, $masksRef, ${langs.size});")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
