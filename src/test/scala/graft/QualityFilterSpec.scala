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

  test("QualityCal.withPercentile: range lookup, edge policy, null-safe lang") {
    import spark.implicits._
    import graft.operators.QualityCal
    // snapshot corpus: en cells {0.2(×1), 0.5(×2), 0.8(×1)} → pct
    // 0.25/0.75/1.0; de cells {0.4, 0.6} → 0.5/1.0; one NULL-lang cell
    val scored = Seq(
      (Some("en"), 0.2), (Some("en"), 0.5), (Some("en"), 0.5),
      (Some("en"), 0.8), (Some("de"), 0.4), (Some("de"), 0.6),
      (None: Option[String], 0.3))
      .toDF("lang", "quality")
    val cdf = QualityCal.cdfOf(scored)
    val rows = Seq(
      (1L, Some("en"), 0.5),   // exact cell → its own cume_dist 0.75
      (2L, Some("en"), 0.65),  // between cells → lower cell's 0.75
      (3L, Some("en"), 0.1),   // below every en cell → 0.0
      (4L, Some("de"), 0.6),   // exact top cell → 1.0
      (5L, Some("fr"), 0.9),   // language absent from snapshot → NULL
      (6L, None: Option[String], 0.3)) // NULL lang matches its group → 1.0
      .toDF("doc_id", "lang", "q")
    val got = QualityCal.withPercentile(rows, cdf, "lang", col("q"))
      .select("doc_id", "pct").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      1L -> Some(0.75), 2L -> Some(0.75), 3L -> Some(0.0),
      4L -> Some(1.0), 5L -> None, 6L -> Some(1.0)), s"got $got")
    // schema contract: original columns intact, pct appended
    val out = QualityCal.withPercentile(rows, cdf, "lang", col("q"))
    assert(out.columns.toSeq == Seq("doc_id", "lang", "q", "pct"))
    // every probe row survives (left join), even the abstained one
    assert(out.count() == 6)
  }

  test("QualityCal store: provenance guards and the refresh crash window") {
    import spark.implicits._
    import graft.operators.QualityCal
    val docs = Seq((1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "a short one")).toDF("doc_id", "lang", "text")
    val store = new graft.sources.ParquetStore(
      spark, TestSpark.tempDir("graft_qcal_store_"))
    // a missing table fails with a build hint
    val e0 = intercept[IllegalArgumentException] {
      QualityCal.requireCdf(store, "cdf", "t")
    }
    assert(e0.getMessage.contains("does not exist"), e0.getMessage)
    QualityCal.buildPercentileStore(store, "cdf", docs, "lang", "text",
      snapshot = "v1")
    // a healthy snapshot clears, pinned or unpinned
    QualityCal.requireCdf(store, "cdf", "t")
    QualityCal.requireCdf(store, "cdf", "t", expectSnapshot = Some("v1"))
    // REFRESH CRASH WINDOW (data-then-meta write order): v2's data
    // committed, its _META never written — the sidecar still says v1.
    // A pipeline pinned to v2 must fail LOUDLY (this is the window the
    // write order exists for: meta-first would serve v1 data under the
    // v2 label, silently stale)
    store.overwrite("cdf", store.read("cdf"))
    val e1 = intercept[IllegalArgumentException] {
      QualityCal.requireCdf(store, "cdf", "t", expectSnapshot = Some("v2"))
    }
    assert(e1.getMessage.contains("stale"), e1.getMessage)
    // ...and re-running the interrupted refresh repairs both halves
    QualityCal.buildPercentileStore(store, "cdf", docs, "lang", "text",
      snapshot = "v2")
    QualityCal.requireCdf(store, "cdf", "t", expectSnapshot = Some("v2"))
    // a table with data but NO scorer record (unknown provenance) is
    // rejected even unpinned
    store.overwrite("raw", store.read("cdf"))
    val e2 = intercept[IllegalStateException] {
      QualityCal.requireCdf(store, "raw", "t")
    }
    assert(e2.getMessage.contains("scorer version"), e2.getMessage)
    // a recorded scorer-version mismatch is rejected (percentiles from
    // different scorers are not comparable)
    store.putMeta("raw", Map("quality.cdf.fn" -> "qualityScore-v0",
      "quality.cdf.snapshot" -> "v1"))
    val e3 = intercept[IllegalArgumentException] {
      QualityCal.requireCdf(store, "raw", "t")
    }
    assert(e3.getMessage.contains("not comparable"), e3.getMessage)
  }
}
