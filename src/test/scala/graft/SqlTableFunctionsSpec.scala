package graft

import graft.types._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine's API surface callable from pure SQL — the reference's
  * `SELECT * FROM vectorize.search(...)` UX (extension/src/api.rs:
  * 116-157) flattened to `vectorize_*` table functions. Each SQL call
  * must return exactly the Scala API's rows (same plan underneath).
  */
class SqlTableFunctionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // eager: registration must happen before any test's spark.sql call
  private val engine: VectorizeEngine = {
    val e = new VectorizeEngine(spark, TestSpark.tempDir("graft_tvf_"),
      embeddingProviderOverride = Some(new providers.DeterministicHashProvider(64)))
    e.registerSource("my_products", Fixtures.myProducts(spark))
    e.createJob(VectorizeJob(
      jobName = "products", srcTable = "my_products",
      srcColumns = Seq("product_name", "description"),
      primaryKey = "product_id", updateTimeCol = Some("updated_at"),
      model = Model.parseUnsafe("deterministic/hash-64")))
    // single-content-column chat job for the rag_prompt surface — on
    // the SAME engine: the last enableSqlFunctions() call owns the SQL
    // names, so a second engine would silently steal them mid-suite
    e.registerSource("content", Fixtures.contentTable(spark))
    e.createJob(VectorizeJob(
      jobName = "chatty", srcTable = "content", srcColumns = Seq("content"),
      primaryKey = "id", updateTimeCol = Some("updated_at"),
      model = Model.parseUnsafe("deterministic/hash-64")))
    e.enableSqlFunctions()
    e
  }

  test("vectorize_search from SQL matches the Scala API") {
    val sql = spark.sql(
      "SELECT product_id, product_name FROM vectorize_search('products', 'camping backpack', 3)")
      .collect().map(r => (r.get(0), r.getString(1))).toSeq
    val api = engine.search("products", "camping backpack", limit = 3)
      .select(col("product_id"), col("product_name"))
      .collect().map(r => (r.get(0), r.getString(1))).toSeq
    assert(sql == api)
    assert(sql.map(_._2).contains("Backpack"))
  }

  test("vectorize_search: where_sql and typed filter args match the Scala API") {
    // argument 4 = raw where_sql (reference api.rs:116-134); trailing
    // args = P4 'col=op.value' typed filters via the same parser as
    // the HTTP surface
    val whereSql = spark.sql(
      "SELECT product_id FROM vectorize_search('products', 'camping backpack', 5, 'product_id < 10')")
      .collect().map(_.get(0).toString.toLong).toSeq
    val whereApi = engine.search("products", "camping backpack", limit = 5,
        whereSql = Some("product_id < 10"))
      .select(col("product_id")).collect().map(_.get(0).toString.toLong).toSeq
    assert(whereSql == whereApi && whereSql.nonEmpty && whereSql.forall(_ < 10))
    val filtSql = spark.sql(
      "SELECT product_id, product_name FROM vectorize_search('products', 'bag', 5, '', 'product_name=eq.Backpack')")
      .collect().map(_.getString(1)).toSeq
    val filtApi = engine.search("products", "bag", limit = 5,
        filters = Map("product_name" -> FilterValue.parse("eq.Backpack")
          .fold(e => throw new IllegalArgumentException(e), identity)))
      .select(col("product_name")).collect().map(_.getString(0)).toSeq
    assert(filtSql == filtApi && filtSql == Seq("Backpack"))
  }

  test("malformed typed-filter argument fails loudly, not silently unfiltered") {
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM vectorize_search('products', 'bag', 5, '', 'no_equals_sign')")
        .collect()
    }
    assert(e.getMessage.contains("column=op.value"),
      s"bad filter must name the expected form, got: ${e.getMessage}")
  }

  test("vectorize_hybrid_search accepts where_sql and trailing typed filters") {
    val rows = spark.sql(
      "SELECT product_name FROM vectorize_hybrid_search('products', 'pencil', 10, '', 'product_name=eq.Pencil')")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("Pencil"))
    val whereRows = spark.sql(
      "SELECT product_name FROM vectorize_hybrid_search('products', 'pencil', 10, \"product_name = 'Pencil'\")")
      .collect().map(_.getString(0)).toSeq
    assert(whereRows == Seq("Pencil"))
    val api = engine.hybridSearch("products", "pencil", limit = 10,
        whereSql = Some("product_name = 'Pencil'"))
      .select(col("product_name")).collect().map(_.getString(0)).toSeq
    assert(whereRows == api)
  }

  test("vectorize_hybrid_search from SQL: README ranking + default limit") {
    val top = spark.sql(
      "SELECT * FROM vectorize_hybrid_search('products', 'camping backpack', 1)").collect()
    assert(top.length == 1)
    assert(top.head.getAs[String]("product_name") == "Backpack")
    assert(top.head.getAs[Double]("rrf_score") > 0.0)
    // omitted limit falls back to the reference default (10)
    assert(spark.sql(
      "SELECT * FROM vectorize_hybrid_search('products', 'pencil')").count() == 10)
  }

  test("vectorize_search_json returns one jsonb-style row per hit") {
    val rows = spark.sql(
      "SELECT * FROM vectorize_search_json('products', 'pencil', 2)").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.schema.fieldNames.toSeq == Seq("results")))
    assert(rows.exists(_.getString(0).contains("\"product_name\":\"Pencil\"")))
  }

  test("json forms: return_columns controls the json payload") {
    // SELECT prunes a row TVF for free, but not inside a json payload
    // — the reference's return_columns matters exactly here
    val rows = spark.sql(
      "SELECT * FROM vectorize_search_json('products', 'pencil', 2, '', 'product_id,product_name')")
      .collect().map(_.getString(0))
    assert(rows.length == 2)
    assert(rows.forall(r =>
      r.contains("\"product_id\"") && r.contains("\"product_name\"") &&
        !r.contains("\"description\"")),
      s"payload must carry only the requested columns (+scores): ${rows.head}")
    val hyb = spark.sql(
      "SELECT * FROM vectorize_hybrid_search_json('products', 'pencil', 2, '', 'product_name')")
      .collect().map(_.getString(0))
    assert(hyb.forall(r =>
      r.contains("\"product_name\"") && !r.contains("\"description\"")))
  }

  test("vectorize_table exposes the project view") {
    val n = spark.sql("SELECT * FROM vectorize_table('products')").count()
    assert(n == engine.projectView("products").count() && n > 0)
  }

  test("vectorize_rag_prompt renders the trimmed prompt pair") {
    val r = spark.sql(
      "SELECT * FROM vectorize_rag_prompt('chatty', 'what is a pencil for?', 2)").collect()
    assert(r.length == 1)
    assert(r.head.schema.fieldNames.toSeq == Seq("sys_prompt", "user_prompt"))
    assert(r.head.getString(1).contains("what is a pencil for?"))
  }

  test("vectorize_rag runs the full retrieve→render→chat chain from SQL") {
    val sql = spark.sql(
      "SELECT * FROM vectorize_rag('chatty', 'what is a pencil for?')").collect()
    assert(sql.length == 1)
    assert(sql.head.schema.fieldNames.toSeq == Seq("query", "chat_response"))
    // deterministic chat provider → SQL surface ≡ Scala API, byte for byte
    val api = engine.rag("chatty", "what is a pencil for?").collect()
    assert(sql.head.getString(0) == api.head.getString(0))
    assert(sql.head.getString(1) == api.head.getString(1))
    assert(sql.head.getString(1).nonEmpty)
    // optional args thread through (chat_model, task, num_context)
    val narrow = spark.sql(
      """SELECT chat_response FROM
        |vectorize_rag('chatty', 'what is a pencil for?', 'openai/gpt-4o-mini',
        |  'question_answer', 1)""".stripMargin).collect()
    val narrowApi = engine.rag("chatty", "what is a pencil for?",
      numContext = 1).collect()
    assert(narrow.head.getString(0) == narrowApi.head.getString(1))
  }

  test("SQL composes over the table function (WHERE + ORDER BY on top)") {
    val got = spark.sql(
      """SELECT product_name FROM vectorize_search('products', 'writing utensil', 10)
        |WHERE product_category = 'stationery' ORDER BY product_name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got.nonEmpty && got == got.sorted)
  }

  test("non-literal argument fails loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM vectorize_search(rand()::string, 'x', 1)").collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage != null)
  }
}
