package graft

import graft.operators.QualityFilter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GPT-3-style learned quality filter (QualityFilter): the classifier
  * must separate target-like from out-of-domain text, the relational
  * scorer must agree with the model's own probabilities, and the
  * Pareto keep rule must be deterministic with exact thresholds. The
  * coefficient arithmetic is DuckDB-oracled (quality_classifier /
  * quality_filter_pareto) via dump-and-replay.
  */
class QualityFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("classifier separates target-like from out-of-domain docs") {
    import spark.implicits._
    val target = (0 until 8).map(i =>
      (100L + i, "the spark engine shuffles partitioned data across executor nodes efficiently"))
      .toDF("doc_id", "text")
    val negatives = (0 until 8).map(i =>
      (200L + i, "crumbly shortbread biscuits pair wonderfully with elderflower cordial afternoons"))
      .toDF("doc_id", "text")
    val model = QualityFilter.train(negatives, target, "doc_id", "text")
    val probe = Seq(
      (1L, "spark engine shuffles partitioned data across executor nodes daily"),
      (2L, "shortbread biscuits pair wonderfully with elderflower cordial today"))
      .toDF("doc_id", "text")
    val got = QualityFilter.score(probe, model, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("qscore")).toMap
    assert(got(1L) > 0.5 && got(2L) < 0.5,
      s"target-like must score above 0.5, out-of-domain below: $got")
  }

  test("pareto keep rule: exact thresholds, deterministic, score-monotone") {
    import spark.implicits._
    def thresh(id: Long): Double = {
      val u = ((id % 100003L) * 2654435761L % 10000L + 0.5) / 10000.0
      1.0 - (math.pow(1.0 - u, -1.0 / 9.0) - 1.0)
    }
    val rows = (1L to 200L).map(i => (i, (i % 101L).toDouble / 100.0))
    val scored = rows.toDF("doc_id", "qscore")
    val kept = QualityFilter.paretoKeep(scored, "doc_id", "qscore")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val want = rows.filter { case (id, s) => s > thresh(id) }.map(_._1).toSet
    assert(kept == want, s"keep set must match the closed form; " +
      s"extra=${kept.diff(want)} missing=${want.diff(kept)}")
    assert(kept.nonEmpty && kept.size < rows.size,
      s"fixture must exercise both outcomes, kept ${kept.size}/${rows.size}")
    // monotone: boosting every score can only grow the keep set
    val boosted = QualityFilter.paretoKeep(
        scored.withColumn("qscore", least(lit(1.0), col("qscore") + 0.2)),
        "doc_id", "qscore")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.subsetOf(boosted), "higher scores must never lose a kept doc")
  }
}
