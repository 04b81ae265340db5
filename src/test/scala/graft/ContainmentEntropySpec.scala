package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Pins for containment pairs (Dedup.containmentPairs — the
  * small-doc-inside-big detector symmetric Jaccard misses) and the
  * token Shannon entropy signal (Queries.textTokenEntropy).
  */
class ContainmentEntropySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("containment flags a subset pair whose Jaccard is below threshold") {
    import spark.implicits._
    val small = "alpha beta gamma delta"
    val big = small + " " + (1 to 40).map(i => s"filler$i").mkString(" ")
    val docs = Seq(1L -> small, 2L -> big, 3L -> "unrelated stuff entirely here")
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 2, threshold = 0.9, maxDf = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0)),
      "the subset pair must surface at containment 1.0")
    val jac = Dedup.rareGramJaccardPairs(docs, "doc_id", "text",
        n = 2, threshold = 0.5, maxDf = 20).count()
    assert(jac == 0, "the same pair must be invisible to Jaccard at 0.5")
  }

  test("token entropy: uniform, constant, and mixed distributions") {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_entropy_")
    Seq(1L -> "a a a a", 2L -> "a b c d", 3L -> "a a b")
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_token_entropy")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Double]("entropy") == 0.0, "constant doc has zero entropy")
    assert(got(1L).getAs[Double]("norm_entropy") == 0.0)
    assert(got(2L).getAs[Double]("entropy") == 1.3863, "uniform doc: ln(4)")
    assert(got(2L).getAs[Double]("norm_entropy") == 1.0, "uniform = max entropy")
    assert(got(3L).getAs[Double]("entropy") == 0.6365)
    assert(got(3L).getAs[Long]("n_tokens") == 3)
    assert(got(3L).getAs[Long]("n_distinct") == 2)
  }

  test("token-less docs drop from the entropy output") {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_entropy2_")
    Seq(1L -> "some text", 2L -> "", 3L -> "  ,,  ")
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val ids = SparkEntry.queries("text_token_entropy")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L))
  }
}
