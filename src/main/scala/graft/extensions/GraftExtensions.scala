package graft.extensions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.expressions.CosineSimilarity

/** Session wiring for the engine's native expressions.
  *
  * Two ways in:
  * - config: `spark.sql.extensions=graft.extensions.GraftExtensions`
  *   (injected at session build, survives `spark.sql(...)` everywhere)
  * - runtime: `GraftExtensions.register(spark)` on an existing session.
  *
  * After either, `cosine_sim(a, b)` resolves in SQL text and via
  * [[GraftExtensions.cosine_sim]] in the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
  }
}

object GraftExtensions {

  /** Arity-checked builder shared by BOTH registration paths (extension
    * injection and runtime register) — `cosine_sim(a)` must die with a clear
    * require message, not an IndexOutOfBoundsException.
    */
  private val cosineSimBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "cosine_sim expects exactly 2 array arguments")
    CosineSimilarity(asDoubleArray(exprs.head), asDoubleArray(exprs(1)))
  }

  private[extensions] val cosineSimDescriptor =
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      cosineSimBuilder)

  /** Unconditional cast to array<double> — children may be unresolved when
    * the builder runs (so no dataType inspection here); a same-type Cast is
    * removed by the optimizer's SimplifyCasts.
    */
  private def asDoubleArray(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  /** Idempotent runtime registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineSimBuilder, "built-in")
    ()
  }

  /** DataFrame-API handle (requires `register(spark)` on the session first —
    * resolution goes through the function registry).
    */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
