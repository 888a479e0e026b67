package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram language ID: one lowercase pass + `indexOf`-based
  * non-overlapping occurrence counts for every profile n-gram, argmax with
  * first-language tie-break, `und` when all scores are zero.
  *
  * Count semantics are exactly those of the column-expression formulation
  * `(length(t) - length(regexp_replace(t, quote(g), ''))) / g.length`
  * (non-overlapping, left-to-right) — but computed with plain
  * `String.indexOf` scans instead of ~37 full-string regex rewrites per row
  * (round-1 bench: q53 15.1 s at sf0.1, second-slowest query, almost all
  * regex allocation). The DuckDB oracle keeps the regex formulation; both
  * sides count identically.
  *
  * `profiles` is tiny fixed model state (langs × ~10 short grams) baked into
  * the expression; languages are tried in argmax order, so profile order IS
  * the tie-break order.
  */
case class LangIdNgram(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  require(profiles.nonEmpty, "lang_id_ngram needs at least one language profile")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id_ngram expects string, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id_ngram"

  @transient private lazy val grams: Array[Array[String]] =
    profiles.map(_._2.toArray).toArray
  @transient private lazy val langs: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    LangIdNgram.pick(s, grams, langs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gramsRef = ctx.addReferenceObj("grams", grams, "java.lang.String[][]")
    val langsRef = ctx.addReferenceObj("langs", langs, "org.apache.spark.unsafe.types.UTF8String[]")
    val helper = LangIdNgram.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $helper.pick($v.toLowerCase().toString(), $gramsRef, $langsRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdNgram {
  /** Shared by interpreted eval and generated code: per-language
    * non-overlapping gram counts, first-max argmax, "und" on all-zero.
    */
  def pick(s: String, grams: Array[Array[String]], langs: Array[UTF8String]): UTF8String = {
    val n = grams.length
    val scores = new Array[Long](n)
    var l = 0
    while (l < n) {
      val gs = grams(l)
      var c = 0L
      var gi = 0
      while (gi < gs.length) {
        val g = gs(gi)
        var from = 0
        var idx = s.indexOf(g, from)
        while (idx >= 0) { c += 1; from = idx + g.length; idx = s.indexOf(g, from) }
        gi += 1
      }
      scores(l) = c
      l += 1
    }
    var best = 0L
    l = 0
    while (l < n) { if (scores(l) > best) best = scores(l); l += 1 }
    if (best == 0L) UTF8String.fromString("und")
    else {
      var w = 0
      while (scores(w) != best) w += 1
      langs(w)
    }
  }
}
