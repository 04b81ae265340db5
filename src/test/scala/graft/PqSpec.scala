package graft

import graft.operators.{Ann, Pq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: encode determinism, ADC column ≡ driver
  * math, two-stage recall against exact brute force, and the
  * code-only plan shape of the ranking scan.
  */
class PqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val qv: Array[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

  private lazy val path = {
    val p = TestSpark.tempDir("graft_pq_spec_")
    Pq.buildPqIndex(emb, "vec_id", "embedding", p, m = 8, k = 32, iterations = 3)
    p
  }

  test("round-trip: persisted codebooks reproduce driver encoding") {
    val cb = Pq.loadCodebooks(spark, path)
    assert(cb.m == 8 && cb.k == 32 && cb.subDim == 8)
    val stored = spark.read.parquet(s"$path/codes").limit(50)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val vecs = emb.filter(col("vec_id").isin(stored.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vecs.foreach { case (id, v) =>
      assert(Pq.encodeVec(v, cb).toSeq == stored(id), s"vec $id")
    }
  }

  test("encodeVec: null and wrong-dimension vectors encode to null") {
    val cb = Pq.loadCodebooks(spark, path)
    assert(Pq.encodeVec(null, cb) == null)
    assert(Pq.encodeVec(Seq(1f, 2f), cb) == null)
  }

  test("adcScore column equals driver-side table lookup sum") {
    val cb = Pq.loadCodebooks(spark, path)
    val table = Pq.adcTable(qv, cb)
    val rows = spark.read.parquet(s"$path/codes").limit(30).collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1)))
    import spark.implicits._
    val fromCol = rows.toSeq.toDF("vec_id", "pq")
      .select(col("vec_id"), Pq.adcScore(col("pq"), table).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, codes) =>
      val want = codes.zipWithIndex
        .map { case (c, s) => BigDecimal(table(s)(c.toInt)).setScale(12, BigDecimal.RoundingMode.HALF_UP) }
        .sum.toDouble
      assert(math.abs(fromCol(id) - want) < 1e-9, s"vec $id: ${fromCol(id)} vs $want")
    }
  }

  test("two-stage ADC top-k recall@20 >= 0.9 vs brute force") {
    val exact = Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20)
      .collect().map(_.getAs[Long]("id")).toSet
    val got = Pq.adcTopK(spark, path, emb, "vec_id", "embedding", qv,
        k = 20, window = 100)
      .collect()
    val recall = got.map(_.getAs[Long]("id")).toSet.intersect(exact).size / 20.0
    assert(recall >= 0.9, s"PQ recall@20 = $recall")
    // survivors carry exact cosines
    val exactScores = Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 500)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("cos")).toMap
    got.foreach { r =>
      assert(r.getAs[Double]("cos") == exactScores(r.getAs[Long]("id")))
    }
  }

  test("IVF-PQ: recall via residual codes, cell pruning, code-only scan") {
    val p = TestSpark.tempDir("graft_ivfpq_spec_")
    Pq.buildIvfPqIndex(emb, "vec_id", "embedding", p,
      nCells = 16, m = 8, k = 32, iterations = 3)
    val probe = Pq.ivfPqTopK(spark, p, emb, "vec_id", "embedding", qv,
      k = 20, nProbe = 8, window = 100)
    val exact = Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20)
      .collect().map(_.getAs[Long]("id")).toSet
    val got = probe.collect().map(_.getAs[Long]("id")).toSet
    // nProbe=8 of 16 on near-uniform vectors: measured 0.9 (cells
    // carry little signal without cluster structure; deterministic)
    assert(got.intersect(exact).size >= 18,
      s"IVF-PQ recall@20 = ${got.intersect(exact).size / 20.0}")
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"IVF-PQ probe must prune cell partitions:\n$plan")
    assert("ReadSchema: [^\n]*pq".r.findAllIn(plan).exists(s => !s.contains("embedding")),
      s"ADC ranking scan must not read float vectors:\n$plan")
  }

  test("ranking scan reads codes only; rescore joins by broadcast") {
    val probe = Pq.adcTopK(spark, path, emb, "vec_id", "embedding", qv,
      k = 20, window = 100)
    val plan = probe.queryExecution.executedPlan.toString
    assert("ReadSchema: [^\n]*pq".r.findAllIn(plan).exists(s => !s.contains("embedding")),
      s"ADC ranking scan must not read float vectors:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"rescore join must broadcast the window candidates:\n$plan")
  }
}
