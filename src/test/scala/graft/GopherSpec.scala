package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Gopher rule battery (Queries.textGopherRules) over handcrafted
  * docs — the synthetic corpus has no bullets/ellipses/symbols, so
  * the signal arithmetic is pinned here while the DuckDB oracle pins
  * Spark↔SQL parity on the real corpus.
  */
class GopherSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)]): Map[Long, Row] = {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_gopher_")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("text_gopher_rules")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("word count, mean length, and the composed keep gate") {
    val keepable = "the be " + Seq.fill(50)("word").mkString(" ")
    val short = "just five little words here"
    val got = run(Seq(1L -> keepable, 2L -> short))
    assert(got(1L).getAs[Int]("n_words") == 52)
    // (3 + 2 + 50*4) / 52
    assert(got(1L).getAs[Double]("mean_word_len") == 3.9423)
    assert(got(1L).getAs[Int]("n_stop") == 2)
    assert(got(1L).getAs[Int]("keep") == 1)
    assert(got(2L).getAs[Int]("n_words") == 5)
    assert(got(2L).getAs[Int]("keep") == 0, "below the 50-word floor")
  }

  test("bullet and ellipsis line fractions") {
    val bullets = "- item one\n- item two\nplain line"
    val dots = "first line...\nsecond line"
    val got = run(Seq(1L -> bullets, 2L -> dots))
    assert(got(1L).getAs[Double]("bullet_frac") == 0.6667)
    assert(got(2L).getAs[Double]("ellipsis_frac") == 0.5)
  }

  test("symbol ratio counts # and non-overlapping ellipses") {
    val got = run(Seq(1L -> "alpha # beta ... gamma"))
    // 5 whitespace words, one '#', one '...'
    assert(got(1L).getAs[Int]("n_words") == 5)
    assert(got(1L).getAs[Double]("symbol_ratio") == 0.4)
  }

  test("alphabetic-word fraction ignores number-only words") {
    val got = run(Seq(1L -> "abc 123 x9 456"))
    assert(got(1L).getAs[Double]("alpha_frac") == 0.5)
  }

  test("stopword containment is distinct-counted via the shared tokenizer") {
    val got = run(Seq(1L -> "the the the be to of and that have with extra"))
    assert(got(1L).getAs[Int]("n_stop") == 8)
  }

  test("blocklist filter counts DISTINCT hits and drops any match") {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_blocklist_")
    Seq(1L -> "slow slow slow words here", // repeated term counts once
        2L -> "slow error mixed", // two distinct hits
        3L -> "perfectly clean document",
        4L -> "SLOW uppercase folds") // tokenizer lowercases
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_blocklist")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_blocked"), r.getAs[Int]("keep"))).toMap
    assert(got(1L) == ((1, 0)))
    assert(got(2L) == ((2, 0)))
    assert(got(3L) == ((0, 1)))
    assert(got(4L) == ((1, 0)))
  }
}
