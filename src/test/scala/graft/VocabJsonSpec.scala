package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Handcrafted pins for the vocabulary df-idf table
  * (Queries.vocabTopTerms) and the JSON props extraction
  * (Queries.rJsonProps) — tf/df arithmetic, idf smoothing, tie order,
  * null/malformed JSON drops. The DuckDB oracles pin Spark↔SQL parity
  * on the real corpus; these pin the semantics on inputs the corpus
  * doesn't exercise.
  */
class VocabJsonSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def runVocab(docs: Seq[(Long, String)]): Seq[Row] = {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_vocab_")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("vocab_top_terms")(spark, dir).collect().toSeq
  }

  test("tf sums occurrences, df counts documents once each") {
    val rows = runVocab(Seq(
      1L -> "apple apple banana",
      2L -> "apple cherry",
      3L -> "banana"))
    val byTerm = rows.map(r => r.getAs[String]("term") -> r).toMap
    assert(byTerm("apple").getAs[Long]("tf") == 3)
    assert(byTerm("apple").getAs[Long]("df") == 2)
    assert(byTerm("banana").getAs[Long]("tf") == 2)
    assert(byTerm("banana").getAs[Long]("df") == 2)
    assert(byTerm("cherry").getAs[Long]("df") == 1)
  }

  test("idf is the smoothed ln((N+1)/(df+1)) + 1") {
    val rows = runVocab(Seq(1L -> "a b", 2L -> "a", 3L -> "a"))
    val byTerm = rows.map(r => r.getAs[String]("term") -> r).toMap
    // a: df=3, N=3 -> ln(4/4)+1 = 1
    assert(byTerm("a").getAs[Double]("idf") == 1.0)
    // b: df=1 -> ln(4/2)+1
    assert(byTerm("b").getAs[Double]("idf") ==
      BigDecimal(math.log(2.0) + 1.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rows come back ordered by tf desc with term as tiebreak") {
    val rows = runVocab(Seq(1L -> "z z q q m"))
    assert(rows.map(_.getAs[String]("term")) == Seq("q", "z", "m"))
  }

  private def runJson(rows: Seq[(Long, String, Double, String)]): Map[String, Row] = {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_json_")
    rows.toDF("event_id", "event_type", "value", "props").write
      .mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("r_json_props")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
  }

  test("json props parse, threshold filter, and exact-integer avg") {
    val got = runJson(Seq(
      (1L, "click", 1.5, """{"k": 60}"""),
      (2L, "click", 2.5, """{"k": 90}"""),
      (3L, "click", 9.0, """{"k": 10}"""), // below threshold
      (4L, "view", 1.0, """{"k": 50}""")))
    assert(got("click").getAs[Long]("n") == 2)
    assert(got("click").getAs[Long]("total_k") == 150)
    assert(got("click").getAs[Double]("avg_k") == 75.0)
    assert(got("click").getAs[Double]("total_value") == 4.0)
    assert(got("view").getAs[Long]("n") == 1, "k >= 50 is inclusive")
  }

  test("malformed and null props drop instead of throwing") {
    val got = runJson(Seq(
      (1L, "click", 1.0, """{"k": 70}"""),
      (2L, "click", 2.0, "not json"),
      (3L, "click", 3.0, null),
      (4L, "click", 4.0, """{"other": 1}""")))
    assert(got("click").getAs[Long]("n") == 1)
    assert(got("click").getAs[Long]("total_k") == 70)
  }
}
