package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Handcrafted pins for kNN label propagation
  * (Queries.knnLabelProp) and matryoshka truncated-prefix retrieval
  * (Queries.annMatryoshkaTopK). The DuckDB oracles pin Spark↔SQL
  * parity on the real corpus; these pin the vote/pool semantics on
  * constructed geometry.
  */
class LabelPropSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def write(rows: Seq[(Long, Array[Float], Int)]): String = {
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_lprop_")
    rows.toDF("vec_id", "embedding", "label").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  // Exact duplicates always share every LSH bucket (equal vectors →
  // equal hyperplane signs), so the handcrafted neighbor sets are
  // guaranteed candidates regardless of the seeded planes.
  test("majority label wins; vote ties break to the smaller label") {
    val v = Array(1f, 0f, 0f, 0f)
    val w = Array(0f, 1f, 0f, 0f)
    val rows =
      // holdout cluster A: majority label 1 (3 of 5 duplicates)
      Seq((0L, v, 99)) ++
        Seq(50L -> 1, 51L -> 1, 52L -> 1, 53L -> 2, 54L -> 2)
          .map { case (id, lab) => (id, v, lab) } ++
        // holdout cluster B: 2 votes label 3 vs 2 votes label 5 — the
        // fifth neighbor (if LSH surfaces it at cos 0) votes label 7
        // once; either way label 3 wins the tie over label 5
        Seq((1L, w, 99)) ++
        Seq(60L -> 3, 61L -> 3, 62L -> 5, 63L -> 5).map { case (id, lab) => (id, w, lab) } ++
        Seq((70L, Array(0f, 0f, 1f, 0f), 7))
    val got = SparkEntry.queries("knn_label_prop")(spark, write(rows))
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(got(0L).getAs[Int]("pred_label") == 1)
    assert(got(0L).getAs[Long]("votes") == 3)
    assert(got(1L).getAs[Int]("pred_label") == 3)
    assert(got(1L).getAs[Long]("votes") == 2)
  }

  test("holdout rows never vote for each other (labeled split only)") {
    val v = Array(1f, 0f, 0f, 0f)
    // two identical holdout rows with label 42 would dominate the
    // vote if the split leaked; the labeled duplicates carry label 6
    val rows = Seq((0L, v, 42), (1L, v, 42)) ++
      Seq(50L, 51L, 52L).map(id => (id, v, 6))
    val got = SparkEntry.queries("knn_label_prop")(spark, write(rows))
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(got(0L).getAs[Int]("pred_label") == 6)
    assert(got(1L).getAs[Int]("pred_label") == 6)
  }

  test("eval metrics: precision@k over found neighbors, rr of first hit") {
    val v = Array(1f, 0f, 0f, 0f)
    val w = Array(0f, 1f, 0f, 0f)
    // query 0 (label 1): five v-duplicates, labels 1,1,2,2,2 in x_id
    // order -> matches at ranks 1,2: p=0.4, rr=1.0
    // query 1 (label 9): five w-duplicates all label 3 -> p=0, rr=0
    val rows = Seq((0L, v, 1), (1L, w, 9)) ++
      Seq(50L -> 1, 51L -> 1, 52L -> 2, 53L -> 2, 54L -> 2)
        .map { case (id, lab) => (id, v, lab) } ++
      (60L to 64L).map(id => (id, w, 3))
    val got = SparkEntry.queries("eval_knn_metrics")(spark, write(rows))
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(got(0L).getAs[Long]("n_found") == 5)
    assert(got(0L).getAs[Double]("p_at_k") == 0.4)
    assert(got(0L).getAs[Double]("rr") == 1.0)
    assert(got(1L).getAs[Long]("n_found") == 5)
    assert(got(1L).getAs[Double]("p_at_k") == 0.0)
    assert(got(1L).getAs[Double]("rr") == 0.0, "no same-label hit -> rr 0")
  }

  test("matryoshka pool is cut by PREFIX cosine, rescore by full cosine") {
    val dim = 16
    def vec(prefix: Float, tail: Float): Array[Float] = {
      val a = new Array[Float](dim)
      a(0) = prefix; a(8) = tail
      a
    }
    // query (vec_id 0): unit x0 + unit x8
    val q = vec(1f, 1f)
    // 99 fillers: prefix-aligned (pcos 1), varying mild tail values —
    // with the query itself that's exactly the 100-row pool
    val fillers = (1L to 99L).map(i => (i, vec(1f, 0.001f * i), 0))
    // the trap: prefix anti-aligned (pcos -1) but full cosine high —
    // must be EXCLUDED by the 100-row prefix pool despite its full
    // cosine beating every filler
    val trap = (100L, vec(-0.001f, 5f), 0)
    val dir = write(Seq((0L, q, 0)) ++ fillers :+ trap)
    val rows = SparkEntry.queries("ann_matryoshka_topk")(spark, dir).collect()
    val ids = rows.map(_.getAs[Long]("vec_id")).toSet
    assert(!ids.contains(100L), "prefix-poor row must not survive the pool cut")
    assert(rows.head.getAs[Long]("vec_id") == 0L, "self match ranks first")
    assert(rows.head.getAs[Double]("cos") == 1.0)
    // within the pool the final order is FULL cosine: the largest
    // tails (highest full cos with the query's x8 component) lead
    val expected = (99L to 81L by -1L).toSeq
    assert(rows.drop(1).map(_.getAs[Long]("vec_id")).toSeq == expected)
  }
}
