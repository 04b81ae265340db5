package graft

import graft.types.{Model, VectorizeJob}
import org.scalatest.funsuite.AnyFunSuite

/** The `vectorize_embed` SQL rewrite — Catalyst analogue of the
  * reference's proxy (proxy/src/embeddings.rs:66-182): the expression
  * must be folded to a literal vector on the driver (one provider
  * call per query), and SQL using it must agree with the Scala API.
  */
class VectorizeEmbedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def engineWithJob(): VectorizeEngine = {
    val engine = new VectorizeEngine(spark, TestSpark.tempDir("graft_ve_"),
      embeddingProviderOverride = Some(new providers.DeterministicHashProvider(64)))
    engine.registerSource("ve_content", Fixtures.contentTable(spark))
    engine.createJob(VectorizeJob("ve_job", "ve_content", Seq("content"), "id",
      Some("updated_at"), Model.parseUnsafe("deterministic/hash-64")))
    engine.enableSqlFunctions()
    engine
  }

  test("SQL with vectorize_embed matches the Scala search API") {
    val engine = engineWithJob()
    engine.projectView("ve_job").createOrReplaceTempView("ve_view")
    val viaSql = spark.sql(
      """SELECT id, content,
        |  cosine_similarity(embeddings, vectorize_embed('food', 've_job')) AS cos
        |FROM ve_view ORDER BY cos DESC, id ASC LIMIT 1""".stripMargin).collect()
    assert(viaSql.head.getAs[String]("content") == "pizza")
    val viaApi = engine.search("ve_job", "food", limit = 1).collect()
    assert(viaApi.head.getAs[String]("content") == "pizza")
    assert(math.abs(viaSql.head.getAs[Double]("cos") -
      viaApi.head.getAs[Double]("similarity_score")) < 1e-12)
  }

  test("the expression is folded to a literal before execution") {
    val engine = engineWithJob()
    engine.projectView("ve_job").createOrReplaceTempView("ve_view")
    val df = spark.sql(
      "SELECT cosine_similarity(embeddings, vectorize_embed('pizza', 've_job')) FROM ve_view")
    // the output alias still prints "vectorize_embed(...)" — what must
    // be gone is the expression NODE itself (replaced by a literal)
    val remaining = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect { case e: graft.plans.VectorizeEmbed => e })
    }.flatten
    assert(remaining.isEmpty,
      s"vectorize_embed must be constant-folded, found: $remaining")
    assert(df.queryExecution.optimizedPlan.toString.contains("0.1"),
      "folded literal vector must appear in the plan")
    // CountingProvider proof: one provider call per QUERY, not per row
    CountingProvider.embedded.set(0)
    val e2 = new VectorizeEngine(spark, TestSpark.tempDir("graft_ve2_"),
      embeddingProviderOverride = Some(new CountingProvider(64)))
    e2.registerSource("ve_content", Fixtures.contentTable(spark))
    e2.createJob(VectorizeJob("ve_job2", "ve_content", Seq("content"), "id",
      Some("updated_at"), Model.parseUnsafe("deterministic/hash-64")))
    e2.enableSqlFunctions()
    e2.projectView("ve_job2").createOrReplaceTempView("ve_view2")
    val base = CountingProvider.embedded.get()
    spark.sql(
      "SELECT cosine_similarity(embeddings, vectorize_embed('astronauts', 've_job2')) FROM ve_view2")
      .collect()
    assert(CountingProvider.embedded.get() == base + 1,
      "vectorize_embed must cost exactly one driver-side provider call")
  }

  test("vectorize_encode scalar: job name or raw model, driver-folded") {
    val engine = engineWithJob()
    // job-name form resolves the job's model+provider (engine.encode)
    val viaSql = spark.sql(
      "SELECT vectorize_encode('pizza', 've_job') AS v").collect()
      .head.getSeq[Float](0)
    assert(viaSql == engine.encode("ve_job", "pizza").toSeq)
    // raw-model form with the reference's default when omitted
    // (extension/src/api.rs:169-177)
    val dflt = spark.sql("SELECT vectorize_encode('pizza') AS v").collect()
      .head.getSeq[Float](0)
    assert(dflt ==
      engine.encode("sentence-transformers/all-MiniLM-L6-v2", "pizza").toSeq)
    // folded: no placeholder node survives optimization
    val df = spark.sql("SELECT vectorize_encode('pizza', 've_job') AS v")
    val remaining = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect { case e: graft.plans.VectorizeEncode => e })
    }.flatten
    assert(remaining.isEmpty)
  }

  test("vectorize_generate scalar: one driver-side chat completion") {
    val engine = engineWithJob()
    val viaSql = spark.sql(
      "SELECT vectorize_generate('what is a pencil?') AS r").collect()
      .head.getString(0)
    assert(viaSql == engine.generate("what is a pencil?"))
    assert(viaSql.nonEmpty)
    // explicit model arg reaches the provider (deterministic response
    // embeds the model tag)
    val tagged = spark.sql(
      "SELECT vectorize_generate('what is a pencil?', 'openai/gpt-4o-mini') AS r")
      .collect().head.getString(0)
    assert(tagged == viaSql)
  }

  test("non-literal arguments are rejected like the proxy") {
    val engine = engineWithJob()
    engine.projectView("ve_job").createOrReplaceTempView("ve_view")
    val err = intercept[Exception] {
      spark.sql(
        "SELECT vectorize_embed(content, 've_job') FROM ve_view").collect()
    }
    assert(err.getMessage.contains("literal") || err.getMessage.contains("foldable") ||
      err.getMessage.contains("Unevaluable") || err.getMessage.contains("vectorize_embed"))
  }
}
