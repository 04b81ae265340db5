package graft

import graft.functions.{GraftFunctions, TextAnalyzer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataFrame-level FTS pipeline tests (F2-F5 over Spark columns) —
  * the stemmed to_tsvector/tsquery/rank path that has no SQL oracle
  * (Porter stemming is not DuckDB-expressible). Complements the
  * pure-Scala analyzer tests in TextSpec.
  */
class AnalyzerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("tsvector UDF matches driver-side analyzer exactly") {
    val texts = Seq(
      (1L, "Merging tables while streams are joining"),
      (2L, "The quick brown foxes jumped!"),
      (3L, ""))
    val got = docs(texts)
      .select(col("doc_id"), GraftFunctions.toTsvector(col("text")).as("lex"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == TextAnalyzer.lexemes(t).toList, s"doc $id")
    }
  }

  test("morphological variants match through stemming (merge/merging/merges)") {
    val df = docs(Seq(
      (1L, "merging the incremental tables"),
      (2L, "a merge of incremental tables"),
      (3L, "tables remain unchanged")))
      .withColumn("lex", GraftFunctions.toTsvector(col("text")))
    val q = lit(TextAnalyzer.queryLexemes("merges").toArray)
    val hits = df.filter(GraftFunctions.tsMatches(col("lex"), q))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L), "both 'merging' and 'merge' must match query 'merges'")
  }

  test("OR semantics: any one query term suffices (plainto_tsquery rewrite)") {
    val df = docs(Seq((1L, "spark shuffles data"), (2L, "ducks swim quietly")))
      .withColumn("lex", GraftFunctions.toTsvector(col("text")))
    val q = lit(TextAnalyzer.queryLexemes("shuffle nonexistentzzz").toArray)
    val hits = df.filter(GraftFunctions.tsMatches(col("lex"), q))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L))
  }

  test("ftsLeg degrades legacy rows (null counts) to count-1 instead of dropping them") {
    import spark.implicits._
    val tokens = Seq(
      ("a", Seq("merg", "stream"), Some(Seq(3, 2))), // exact: 0.1*(3+2)
      ("b", Seq("merg", "stream"), None)             // legacy: 0.1*(1+1)
    ).toDF("pkey", "search_tokens", "search_token_counts")
    val got = graft.operators.Search.ftsLeg(tokens, "merging streams", 10)
      .collect().map(r => r.getAs[String]("pkey") -> r.getAs[Int]("fts_rank")).toMap
    assert(got == Map("a" -> 1, "b" -> 2),
      "legacy row must still rank (count-1 fallback), below the counted row")
  }

  test("rank ordering: more query-term coverage ranks higher") {
    val df = docs(Seq(
      (1L, "merge join stream merge join stream"), // all 3 terms, high tf
      (2L, "merge something else entirely here"),  // 1 term
      (3L, "stream processing with joins")))       // 2 terms
      .withColumn("lex", GraftFunctions.toTsvector(col("text")))
    val q = lit(TextAnalyzer.queryLexemes("merge join stream").toArray)
    val ranked = df.withColumn("r", GraftFunctions.tsRank(col("lex"), q))
      .orderBy(col("r").desc).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ranked.head == 1L)
    assert(ranked.last == 2L)
  }

  test("chunkText: bounded sizes, full coverage, explode-ready") {
    val long = (1 to 60).map(i => s"sentence number $i ends here.").mkString(" ")
    val chunks = GraftFunctions.chunkTextScala(long, 80)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 80))
    // no content lost: concatenation contains every sentence marker
    val joined = chunks.mkString(" ")
    (1 to 60).foreach(i => assert(joined.contains(s"number $i")))
    // UDF agrees with the Scala function
    val viaUdf = docs(Seq((1L, long)))
      .select(GraftFunctions.chunkText(col("text"), lit(80))).head().getSeq[String](0)
    assert(viaUdf.toList == chunks.toList)
  }
}
