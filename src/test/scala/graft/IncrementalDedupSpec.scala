package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Pins for incremental snapshot-delta dedup
  * (Dedup.incrementalExact / the dedup_incremental entry): the
  * cross-snapshot drop, within-batch keep-first, normalization
  * equivalence, and parity with the bloom-free formulation (the bloom
  * only prunes — on any input the answer must equal the plain
  * anti-join's).
  */
class IncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("batch rows already in the corpus drop; fresh rows survive") {
    val existing = df(Seq(1L -> "alpha beta", 2L -> "gamma"))
    val batch = df(Seq(10L -> "alpha beta", 11L -> "delta"))
    val kept = Dedup.incrementalExact(existing, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L))
  }

  test("within-batch duplicates keep the smallest id only") {
    val existing = df(Seq.empty)
    val batch = df(Seq(12L -> "same text", 10L -> "same text", 11L -> "other"))
    val kept = Dedup.incrementalExact(existing, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 11L))
  }

  test("normalization matches exactCanonical: case and whitespace fold") {
    val existing = df(Seq(1L -> "Alpha   Beta"))
    val batch = df(Seq(10L -> "  alpha beta ", 11L -> "alphabeta"))
    val kept = Dedup.incrementalExact(existing, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L), "folded form collides, concatenated form doesn't")
  }

  test("bloom-pruned answer equals the plain anti-join on a mixed corpus") {
    val existing = df((0L until 60L).map(i => i -> s"doc number ${i % 40}"))
    val batch = df((100L until 160L).map(i => i -> s"doc number ${i % 50}"))
    val got = Dedup.incrementalExact(existing, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    // naive reference: keep-first in batch, minus existing's hash set
    val norm = (s: String) => s.trim.toLowerCase.replaceAll("\\s+", " ")
    val existingSet = (0L until 60L).map(i => norm(s"doc number ${i % 40}")).toSet
    val firstInBatch = (100L until 160L).map(i => i -> norm(s"doc number ${i % 50}"))
      .groupBy(_._2).map { case (_, g) => g.minBy(_._1) }
    val expected = firstInBatch.collect {
      case (id, h) if !existingSet.contains(h) => id
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < 60, "the fixture must actually dedup")
  }

  test("nearDup: batch rows near-duplicating the corpus drop, fresh survive") {
    // 24-token docs differing in ONE token: shingle Jaccard ~0.76 —
    // over the 0.5 default but not exact-equal, and high enough that
    // the seeded 16-band signature collides (banding is recall-
    // probabilistic; the fixture is deterministic under the fixed seed)
    val a = "the quick brown fox jumps over the lazy dog near the river " +
      "while birds sing old songs above tall green trees every single morning"
    val aNear = "the quick brown fox jumps over the lazy cat near the river " +
      "while birds sing old songs above tall green trees every single morning"
    val fresh = "completely different content with no overlap whatsoever at all ok"
    val existing = df(Seq(1L -> a))
    val batch = df(Seq(10L -> aNear, 11L -> fresh))
    val kept = Dedup.incrementalNearDup(existing, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L))
  }

  test("nearDup: within-batch pair drops the larger id only") {
    val b1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    val existing = df(Seq.empty)
    val batch = df(Seq(20L -> b1, 21L -> b2))
    val kept = Dedup.incrementalNearDup(existing, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(20L))
  }

  test("nearDup: below-threshold band collisions are verified away") {
    // share a 3-token prefix (possible band collision via low-Jaccard
    // shingle overlap) but diverge after: Jaccard far below 0.5
    val existing = df(Seq(1L -> "one two three apple pear plum cherry grape melon fig date kiwi"))
    val batch = df(Seq(10L -> "one two three brick stone slate marble granite chalk sand clay mud"))
    val kept = Dedup.incrementalNearDup(existing, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L), "shared prefix alone must not drop the row")
  }

  test("drift report: zero KL on identical distributions, positive on drift") {
    import spark.implicits._
    def run(corpus: String, batch: String): Seq[org.apache.spark.sql.Row] = {
      val dir = TestSpark.tempDir("graft_drift_")
      Seq(1L -> corpus, 250L -> batch).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.queries("drift_report")(spark, dir).collect().toSeq
    }
    val same = run("alpha beta gamma alpha", "alpha beta gamma alpha")
    assert(same.size == 256, "every bucket row must emit, zero-count included")
    assert(same.map(_.getAs[Double]("kl_contrib")).sum == 0.0,
      "identical distributions have zero KL")
    assert(same.forall(r => !r.getAs[Double]("kl_contrib").toString.startsWith("-0.0")),
      "no -0.0 may survive the fold")
    val drifted = run("alpha alpha alpha alpha", "omega omega omega omega")
    assert(drifted.map(_.getAs[Double]("kl_contrib")).sum > 0.01,
      "disjoint vocabularies must show positive KL")
  }

  test("the query entry splits at doc_id 250 and returns kept new docs") {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_incdedup_")
    Seq(1L -> "seen before", 249L -> "corpus only",
        250L -> "seen before", 251L -> "brand new", 252L -> "brand new")
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val kept = SparkEntry.queries("dedup_incremental")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(251L), "250 collides with corpus, 252 loses keep-first")
  }
}
