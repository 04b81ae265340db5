package graft

import graft.api.{HttpApi, MiniJson}
import org.scalatest.funsuite.AnyFunSuite

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP facade parity with the reference's actix routes
  * (server/src/routes/{table,search,health}.rs): create job over
  * HTTP, hybrid search with filters via GET params and POST body,
  * delete, 404s, and the health trio.
  */
class HttpApiSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def http(method: String, url: String, body: Option[String] = None)
      : (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val os = conn.getOutputStream
      try os.write(b.getBytes(UTF_8)) finally os.close()
    }
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = if (stream == null) "" else
      try new String(stream.readAllBytes(), UTF_8) finally stream.close()
    conn.disconnect()
    (code, text)
  }

  private def withApi(test: (String, VectorizeEngine) => Unit): Unit = {
    val engine = new VectorizeEngine(spark, TestSpark.tempDir("graft_http_"),
      embeddingProviderOverride = Some(new providers.DeterministicHashProvider(64)))
    engine.registerSource("my_products", Fixtures.myProducts(spark))
    val api = new HttpApi(engine, port = 0)
    api.start()
    try test(s"http://127.0.0.1:${api.boundPort}", engine)
    finally api.stop()
  }

  test("POST /table creates a job; GET /search runs hybrid search; DELETE removes") {
    withApi { (base, engine) =>
      val (code, body) = http("POST", s"$base/api/v1/table", Some(
        """{"job_name":"http_products","src_table":"my_products",
          |"src_columns":["product_name","description"],
          |"primary_key":"product_id","update_time_col":"updated_at",
          |"model":"deterministic/hash-64"}""".stripMargin))
      assert(code == 200, s"create failed: $body")
      // name-derived UUID, stable across calls
      val id = MiniJson.parse(body).toOption.get.asObj.get("id").asString.get
      assert(id == java.util.UUID.nameUUIDFromBytes(
        "http_products".getBytes(UTF_8)).toString)
      assert(engine.listJobs.exists(_.jobName == "http_products"))

      val (sc, sBody) = http("GET",
        s"$base/api/v1/search?job_name=http_products&query=camping+backpack&limit=3")
      assert(sc == 200, s"search failed: $sBody")
      val rows = MiniJson.parse(sBody).toOption.get.asArr.get
      assert(rows.nonEmpty && rows.size <= 3)
      // rows are to_jsonb-style objects carrying source columns + score
      val first = rows.head.asObj.get
      assert(first.contains("product_id") && first.contains("rrf_score"))

      val (dc, dBody) = http("DELETE", s"$base/api/v1/table/http_products")
      assert(dc == 200 && dBody.contains("Successfully deleted job 'http_products'"))
      assert(!engine.listJobs.exists(_.jobName == "http_products"))
      assert(http("DELETE", s"$base/api/v1/table/http_products")._1 == 404)
    }
  }

  test("POST /search with JSON body + filters; GET filter params; errors") {
    withApi { (base, engine) =>
      http("POST", s"$base/api/v1/table", Some(
        """{"job_name":"http_f","src_table":"my_products",
          |"src_columns":["description"],"primary_key":"product_id",
          |"model":"deterministic/hash-64"}""".stripMargin))
      // POST body form with a filters object ("op.value" values)
      val (pc, pBody) = http("POST", s"$base/api/v1/search", Some(
        """{"job_name":"http_f","query":"camping backpack","limit":5,
          |"filters":{"product_id":"lt.10"}}""".stripMargin))
      assert(pc == 200, s"POST search failed: $pBody")
      val rows = MiniJson.parse(pBody).toOption.get.asArr.get
      assert(rows.nonEmpty)
      assert(rows.forall(_.asObj.get("product_id").asDouble.get < 10))
      // GET flattens unknown params into the same filters
      val (gc, gBody) = http("GET",
        s"$base/api/v1/search?job_name=http_f&query=camping+backpack&product_id=lt.10")
      assert(gc == 200)
      assert(MiniJson.parse(gBody).toOption.get.asArr.get
        .forall(_.asObj.get("product_id").asDouble.get < 10))
      // unknown job → 404; bad filter → 400; missing fields → 400
      assert(http("GET", s"$base/api/v1/search?job_name=nope&query=x")._1 == 404)
      assert(http("GET",
        s"$base/api/v1/search?job_name=http_f&query=x&product_id=zz.1")._1 == 400)
      assert(http("POST", s"$base/api/v1/search", Some("""{"query":"x"}"""))._1 == 400)
      assert(http("POST", s"$base/api/v1/table", Some("not json"))._1 == 400)
    }
  }

  test("health endpoints mirror the reference trio") {
    withApi { (base, _) =>
      val (lc, lBody) = http("GET", s"$base/health/live")
      assert(lc == 200 && lBody.contains("\"alive\""))
      val (hc, hBody) = http("GET", s"$base/health")
      assert(hc == 200 && hBody.contains("\"healthy\""))
      val (rc, rBody) = http("GET", s"$base/health/ready")
      assert(rc == 200 && rBody.contains("\"ready\""))
    }
  }

  test("MiniJson round-trips escapes, nesting, numbers, and rejects garbage") {
    import MiniJson._
    val v = parse("""{"a":[1,-2.5,1e3],"b":{"c":"x\n\"yA"},"t":true,"n":null}""")
      .toOption.get.asObj.get
    assert(v("a").asArr.get.flatMap(_.asDouble) == Seq(1.0, -2.5, 1000.0))
    assert(v("b").asObj.get("c").asString.contains("x\n\"yA"))
    assert(v("t") == JBool(true) && v("n") == JNull)
    assert(parse("""{"a":}""").isLeft)
    assert(parse("""[1,2""").isLeft)
    assert(parse("""{"a":1} extra""").isLeft)
    assert(parse("").isLeft)
    // adversarial inputs return Left, never throw: bad \u escape and
    // pathological nesting (StackOverflowError is fatal — it would
    // escape the HTTP error handler and hang the exchange)
    assert(parse("{\"a\":\"\\uZZZZ\"}").isLeft)
    assert(parse("[" * 10000 + "]" * 10000).isLeft)
    assert(parse("[" * 10000).isLeft)
  }

  test("route edges: prefix typos 404, bad src_columns 400, restart refused") {
    withApi { (base, _) =>
      // JDK HttpServer matches by prefix; non-exact paths must 404
      assert(http("GET", s"$base/api/v1/searchfoo?job_name=x&query=y")._1 == 404)
      assert(http("DELETE", s"$base/api/v1/table/a/b")._1 == 404)
      // non-string src_columns entries are a 400, not silently dropped
      val (cc, cBody) = http("POST", s"$base/api/v1/table", Some(
        """{"job_name":"bad","src_table":"my_products",
          |"src_columns":["product_name",123],"primary_key":"product_id",
          |"model":"deterministic/hash-64"}""".stripMargin))
      assert(cc == 400 && cBody.contains("array of strings"))
    }
    // stop() then start() is an explicit error (JDK server can't restart)
    val engine = new VectorizeEngine(spark, TestSpark.tempDir("graft_http2_"),
      embeddingProviderOverride = Some(new providers.DeterministicHashProvider(64)))
    val oneShot = new HttpApi(engine, port = 0)
    oneShot.start(); oneShot.stop()
    intercept[IllegalStateException](oneShot.start())
  }
}
