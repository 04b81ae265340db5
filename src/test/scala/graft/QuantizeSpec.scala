package graft

import graft.operators.{Ann, Quantize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** int8 scalar quantization: reconstruction error bound, the
  * scale-cancels-in-cosine property the integer ranking relies on,
  * column/driver parity of the integer cosine, and end-to-end recall
  * of the two-stage (quantized rank → exact rescore) top-k.
  */
class QuantizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val qv: Array[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

  test("reconstruction error is within half a quantization step") {
    val rng = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val v = Array.fill(32)((rng.nextFloat() - 0.5f) * 20f)
      val q = Quantize.quantizeVec(v.toSeq)
      val maxAbs = v.map(math.abs).max
      val scale = maxAbs / 127f
      v.zip(q).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-5,
          s"value $x reconstructed as ${c * scale}")
        assert(c >= -127 && c <= 127)
      }
    }
    assert(Quantize.quantizeVec(Seq(0f, 0f)).forall(_ == 0))
    assert(Quantize.quantizeVec(Seq.empty).isEmpty)
    assert(Quantize.quantizeVec(null).isEmpty)
  }

  test("int8Cosine column equals driver-side integer math") {
    import spark.implicits._
    val rows = emb.limit(20).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qCodes = Quantize.quantizeVec(qv.toSeq)
    val fromCol = rows.toSeq.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Quantize.int8Cosine(Quantize.quantize(col("embedding")),
          typedLit(qCodes.toSeq)).as("qc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v) =>
      val c = Quantize.quantizeVec(v)
      val dot = c.zip(qCodes).map { case (a, b) => a.toLong * b.toLong }.sum
      val na = c.map(x => x.toLong * x.toLong).sum
      val nb = qCodes.map(x => x.toLong * x.toLong).sum
      val want = dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      assert(fromCol(id) == want, s"vec $id")
    }
  }

  test("quantized IVF probe: recall, exact rescore, pruned columns and cells") {
    import graft.operators.Ann
    val path = TestSpark.tempDir("graft_ivf_quant_")
    Ann.buildIvfIndex(emb, "vec_id", "embedding", path, nCells = 16, iterations = 3)
    val probe = Ann.probeIvfIndexQuantized(spark, path, "vec_id", "embedding",
      qv, k = 20, nProbe = 8, window = 100)
    // recall vs the FLOAT probe of the same cells: the int8 ranking +
    // 100-wide rescore must not lose candidates the float scan keeps
    val floatIds = Ann.probeIvfIndex(spark, path, "vec_id", "embedding", qv,
      k = 20, nProbe = 8).collect().map(_.getAs[Long]("id")).toSet
    val gotRows = probe.collect()
    val got = gotRows.map(_.getAs[Long]("id")).toSet
    assert(got.intersect(floatIds).size >= 18,
      s"quantized IVF recall vs float IVF: ${got.intersect(floatIds).size}/20")
    // surviving ids carry EXACT cosines (the rescore is not quantized)
    val exactScores = Ann.probeIvfIndex(spark, path, "vec_id", "embedding", qv,
        k = 200, nProbe = 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("cos")).toMap
    gotRows.foreach { r =>
      exactScores.get(r.getAs[Long]("id"))
        .foreach(e => assert(r.getAs[Double]("cos") == e))
    }
    val plan = probe.queryExecution.executedPlan.toString
    // the RANKING scan must read codes, not vectors: some FileScan's
    // ReadSchema has q8 without the float embedding column
    val rankScanPruned = "ReadSchema: [^\n]*q8".r.findAllIn(plan)
      .exists(s => !s.contains("embedding"))
    assert(rankScanPruned,
      s"ranking scan must prune the float vector column, plan was:\n$plan")
    // both scans prune to the probed cell partitions
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"quantized probe must push a cell PartitionFilter, plan was:\n$plan")
    // the window→rescore join must broadcast the 100-row candidate set
    assert(plan.contains("BroadcastHashJoin"),
      s"rescore join must broadcast the window candidates, plan was:\n$plan")
  }

  test("quantized kNN join: mean recall@5 >= 0.9 vs the exact knnJoin") {
    import graft.operators.Ann
    val queries = emb.filter(col("vec_id") < 50)
    def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("x_id")).toSet }
    val exact = pairs(Ann.knnJoin(queries, emb, "vec_id", "embedding", k = 5))
    val quant = pairs(Ann.knnJoinQuantized(queries, emb, "vec_id", "embedding",
      k = 5, pool = 20))
    val recalls = exact.map { case (q, ex) =>
      quant.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"quantized kNN join mean recall@5 = $mean")
  }

  test("indexed quantized kNN join: equals ad-hoc at index params; candidate scan reads codes not vectors") {
    import graft.operators.Ann
    val path = TestSpark.tempDir("graft_lsh_quant_join_")
    Ann.buildLshIndex(emb, "vec_id", "embedding", path, bits = 0)
    val meta = spark.read.parquet(s"$path/meta").head()
    val queries = emb.filter(col("vec_id") < 50)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("x_id"),
        r.getAs[Int]("rank"))).toSet
    // persisted codes are the same Quantize.quantize of the same
    // vectors, so the indexed join must reproduce the ad-hoc quantized
    // join at the index's stored (bits, seed) exactly
    val adhoc = rows(Ann.knnJoinQuantized(queries, emb, "vec_id", "embedding",
      k = 5, bits = meta.getAs[Int]("bits"), seed = meta.getAs[Long]("seed"),
      pool = 20))
    val indexed = Ann.knnJoinQuantizedIndexed(spark, path, queries,
      "vec_id", "embedding", k = 5, pool = 20)
    assert(rows(indexed) == adhoc,
      "indexed quantized join must equal the ad-hoc quantized join")
    val plan = indexed.queryExecution.executedPlan.toString
    // the CANDIDATE scan is column-pruned to codes: some FileScan's
    // ReadSchema has q8 without the float embedding column — the float
    // vector never enters the bucket-join shuffle
    assert("ReadSchema: [^\n]*q8".r.findAllIn(plan)
        .exists(s => !s.contains("embedding")),
      s"candidate scan must read q8, not the float vector, plan was:\n$plan")
    // probe-key union pushed into PartitionFilters on the index side
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"index side must push the probe-key union into PartitionFilters:\n$plan")
  }

  test("two-stage quantized top-k recovers the exact top-20 (recall >= 0.95)") {
    val exact = Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20)
      .collect().map(_.getAs[Long]("id")).toSet
    val got = Quantize.quantizedTopK(emb, "vec_id", "embedding", qv, k = 20)
      .collect().map(_.getAs[Long]("id")).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall@20 = $recall after int8 rank + rescore")
    // rescored values are EXACT cosines: the surviving ids must score
    // identically to brute force
    val exactScores = Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("cos")).toMap
    Quantize.quantizedTopK(emb, "vec_id", "embedding", qv, k = 20).collect()
      .foreach { r =>
        val id = r.getAs[Long]("id")
        exactScores.get(id).foreach(e => assert(r.getAs[Double]("cos") == e))
      }
  }
}
