package graft

import graft.operators.Ccnet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CCNet-style bigram-LM perplexity (Ccnet.perplexity): pair
  * construction semantics and the direction of the score — target-like
  * text must score LOWER perplexity than out-of-domain text. The
  * exact arithmetic is DuckDB-oracled (ccnet_ppl_buckets).
  */
class CcnetSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => filter(split(lower(coalesce(c, lit(""))), "[^a-z0-9]+"), x => x =!= "")

  test("tokenPairs: consecutive occurrences, not distinct; short docs excluded") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "solo")).toDF("doc_id", "text")
    val got = Ccnet.tokenPairs(df, "doc_id", "text", tok)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("prev"), r.getAs[String]("cur")))
    assert(got.toSeq.sorted == Seq((1L, "a", "b"), (1L, "a", "b"), (1L, "b", "a")),
      s"expected both (a,b) occurrences and no rows for the 1-token doc: ${got.toSeq}")
  }

  test("target-like text scores lower perplexity than out-of-domain text") {
    import spark.implicits._
    val target = (0 until 6).map(i =>
      (100L + i, "the query engine shuffles partitions and merges sorted runs"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the query engine shuffles partitions and merges sorted runs nightly"),
      (2L, "marmalade sunrise bicycles quarrel with jubilant accordion thunderstorms"))
      .toDF("doc_id", "text")
    val ppl = Ccnet.perplexity(raw, target, "doc_id", "text", tok)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("ppl")).toMap
    assert(ppl(1L) < ppl(2L),
      s"in-domain doc must score lower perplexity: $ppl")
    assert(ppl(1L) > 1.0 && ppl(2L).isFinite,
      s"perplexities must be finite and > 1: $ppl")
  }
}
