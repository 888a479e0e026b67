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
    * langs(i)). INTERNED per language spec: predicate pushdown inlines a
    * projected lang_stats alias into many expression instances, and the
    * per-row memo below distinguishes models by reference — equal specs must
    * share ONE map or every cross-instance call misses.
    */
  private val masksCache = new java.util.concurrent.ConcurrentHashMap[
    Seq[(String, Seq[String])], java.util.HashMap[UTF8String, Integer]]()

  def buildMasks(langs: Seq[(String, Seq[String])]): java.util.HashMap[UTF8String, Integer] =
    masksCache.computeIfAbsent(langs, { spec =>
      val m = new java.util.HashMap[UTF8String, Integer]()
      spec.zipWithIndex.foreach { case ((_, words), i) =>
        words.foreach { w =>
          val k = UTF8String.fromString(w)
          val prev = m.get(k)
          m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
        }
      }
      m
    })

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d) // java regex \s

  /** One-entry per-thread memo keyed by INPUT REFERENCE. Predicate pushdown
    * inlines a projected lang_stats alias into every conjunct of a filter
    * below the projection (~19 copies for the quality gate), and FilterExec
    * does no cross-predicate subexpression elimination — so without this,
    * the gate re-scans each row's text once per conjunct. Within one row all
    * inlined calls receive the IDENTICAL UTF8String object (codegen binds
    * the column value to one local), so reference equality is exact: a new
    * row allocates a new wrapper and can only MISS (the strong ref keeps the
    * cached key alive, so a stale address can never alias). Turns N
    * evaluations per row into one scan + N−1 pointer compares.
    */
  private val lastEval =
    new ThreadLocal[(UTF8String, java.util.HashMap[UTF8String, Integer], InternalRow)]

  def langStats(
      s: UTF8String,
      masks: java.util.HashMap[UTF8String, Integer],
      nLangs: Int): InternalRow = {
    val cached = lastEval.get()
    if (cached != null && (cached._1 eq s) && (cached._2 eq masks)) return cached._3
    val row = computeLangStats(s, masks, nLangs)
    lastEval.set((s, masks, row))
    row
  }

  private def computeLangStats(
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
