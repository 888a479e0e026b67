package graft

import org.apache.spark.sql.functions._
import graft.extensions.GraftExtensions
import graft.similarity.Similarity

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine_sim matches the HOF implementation bit-for-bit on fixtures") {
    GraftExtensions.register(spark)
    val e = Tables.embeddings(spark, sfDir).limit(100)
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .filter(col("ia") < col("ib")).limit(500)
    val diff = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("hof"),
      GraftExtensions.cosine_sim(col("a"), col("b")).as("native"))
      .filter(col("hof") =!= col("native"))
    assert(diff.count() == 0)
  }

  test("cosine_sim resolves in SQL text after registration; zero-norm yields 0") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same,
        |       cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS ortho,
        |       cosine_sim(array(0.0D, 0.0D), array(1.0D, 0.0D)) AS zero,
        |       cosine_sim(array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)), array(1.0D, 0.0D)) AS mixed
        |""".stripMargin).as[(Double, Double, Double, Double)].head()
    assert(r._1 == 1.0 && r._2 == 0.0 && r._3 == 0.0)
    assert(math.abs(r._4 - math.sqrt(2) / 2) < 1e-12)
  }

  test("cosine_sim with wrong arity fails with a clear error on the register() path") {
    GraftExtensions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0D))").collect()
    }
    assert(err.getMessage.contains("2 array arguments"), err.getMessage)
  }

  test("native hyperplane_sig matches the HOF signature bit-for-bit on fixtures") {
    GraftExtensions.register(spark)
    val e = Tables.embeddings(spark, sfDir).limit(200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val diff = e.select(
      Similarity.hofHyperplaneSignature(col("v"), 64, 16, 42L).as("hof"),
      GraftExtensions.hyperplane_sig(col("v"), lit(64), lit(16), lit(42L)).as("native"))
      .filter(col("hof") =!= col("native"))
    assert(diff.count() == 0)
  }

  test("hyperplane_sig resolves in SQL text; bad arity and non-literal args fail clearly") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT hyperplane_sig(array(1.0D, 0.0D, 0.0D, 0.0D), 4, 8, 42) AS s")
      .as[Long].head()
    assert(r >= 0L && r < 256L)
    val err = intercept[Exception] {
      spark.sql("SELECT hyperplane_sig(array(1.0D))").collect()
    }
    assert(err.getMessage.contains("(vec, dim, bits, seed)"), err.getMessage)
  }

  test("hyperplane_sig stays inside whole-stage codegen") {
    GraftExtensions.register(spark)
    val e = Tables.embeddings(spark, sfDir).limit(10)
    val df = e.select(GraftExtensions.hyperplane_sig(
      col("embedding"), lit(64), lit(16), lit(42L)).as("s"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
  }

  test("native lang_id_ngram matches the regex formulation on every fixture document") {
    GraftExtensions.register(spark)
    val d = Tables.documents(spark, sfDir)
    val diff = d.select(
      graft.functions.TextFunctions.langIdNgramRegex(col("text")).as("rx"),
      GraftExtensions.lang_id_ngram(col("text")).as("native"))
      .filter(col("rx") =!= col("native"))
    assert(diff.count() == 0)
  }

  test("lang_id_ngram resolves in SQL, handles null/empty, stays in codegen") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT lang_id_ngram('the weather and the end') AS en, " +
        "lang_id_ngram('') AS und, lang_id_ngram(CAST(NULL AS STRING)) AS nul")
      .collect().head
    assert(r.getString(0) == "en" && r.getString(1) == "und" && r.isNullAt(2))
    val df = Tables.documents(spark, sfDir).limit(10)
      .select(GraftExtensions.lang_id_ngram(col("text")).as("l"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
  }

  test("native shingle_strings/shingle_hashes match the HOF chain on every fixture document") {
    GraftExtensions.register(spark)
    import graft.functions.TextFunctions
    val d = Tables.documents(spark, sfDir)
      // exercise whitespace-run and short-doc edges on top of the fixtures
      .select(col("text")).union(Seq("", "a", "a  b\t c\nd", " x y z ").toDF("text"))
    val diff = d.select(
      TextFunctions.shinglesHof(col("text"), 3).as("hof_s"),
      GraftExtensions.shingle_strings(col("text"), lit(3)).as("nat_s"),
      TextFunctions.shingleHashesHof(col("text"), 3).as("hof_h"),
      GraftExtensions.shingle_hashes(col("text"), lit(3)).as("nat_h"))
      .filter(col("hof_s") =!= col("nat_s") || col("hof_h") =!= col("nat_h"))
    assert(diff.count() == 0)
  }

  test("sparse_dot equals the relational explode-join dot product on fixture docs") {
    GraftExtensions.register(spark)
    import graft.functions.TextFunctions
    val d = Tables.documents(spark, sfDir).limit(60)
    val tf = d.select(col("doc_id").as("id"), explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("c"))
    val joinDots = tf.select(col("tok"), col("id").as("id_a"), col("c").as("ca"))
      .join(tf.select(col("tok"), col("id").as("id_b"), col("c").as("cb")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(sum(col("ca") * col("cb")).as("dot_join"))
    val vecs = tf.groupBy("id")
      .agg(sort_array(collect_list(struct(col("tok"), col("c")))).as("vec"))
    val diff = joinDots
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb")), "id_b")
      .filter(GraftExtensions.sparse_dot(col("va"), col("vb")) =!= col("dot_join"))
    assert(diff.count() == 0)
    // disjoint vectors dot to zero
    val z = spark.sql(
      """SELECT sparse_dot(array(struct('a', 2L), struct('b', 3L)),
        |                  array(struct('c', 4L))) AS z""".stripMargin)
      .collect().head.getLong(0)
    assert(z == 0L)
  }

  test("cosine_sim stays inside whole-stage codegen (no CodegenFallback in plan)") {
    GraftExtensions.register(spark)
    val e = Tables.embeddings(spark, sfDir).limit(10)
    val df = e.select(GraftExtensions.cosine_sim(col("embedding"), col("embedding")).as("s"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
  }

  test("ws_tokens/token_count/simhash64 resolve in SQL and stay inside whole-stage codegen") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT ws_tokens('  a  b\tc ') AS t, token_count('  a  b\tc ') AS n,
        |       simhash64(array(struct('a', 2L), struct('b', 1L))) AS s""".stripMargin).collect().head
    assert(r.getSeq[String](0) == Seq("a", "b", "c") && r.getInt(1) == 3)
    val docs = Tables.documents(spark, sfDir).limit(10)
    val df = docs.select(
      GraftExtensions.ws_tokens(col("text")).as("t"),
      GraftExtensions.token_count(col("text")).as("n"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
  }

  test("lang_stats resolves in SQL; quality-gate plan has ZERO CodegenFallback expressions") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT lang_stats('  the la   und zz ') AS st").collect().head.getStruct(0)
    assert(r.getInt(0) == 4, s"n_tokens: $r")            // the, la, und, zz
    assert(r.getLong(1) == 3 + 2 + 3 + 2, s"tok_chars: $r")
    assert(r.getInt(2) == 1 && r.getInt(3) == 1 &&        // en: the; de: und
      r.getInt(4) == 1 && r.getInt(5) == 1, s"hits: $r")  // es: la; fr: la
    // the whole gate must be codegen'd end to end — not merely "some
    // WholeStageCodegen exists" but NO expression in the plan that would
    // evaluate interpreted (the round-1 50× lesson was interpreted lambdas
    // hiding inside otherwise-native map stages)
    val gate = graft.text.TextPipelines.qualityGate(Tables.documents(spark, sfDir))
    val fallbacks = gate.queryExecution.executedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case f: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback => f
      })
    }.flatten
    assert(fallbacks.isEmpty,
      s"interpreted expressions in quality-gate plan: ${fallbacks.map(_.getClass.getSimpleName).distinct}")
  }
}
