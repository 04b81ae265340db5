package graft

import graft.operators.{Ann, Hnsw}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HNSW graph-ANN: recall against brute force on the sf0.01
  * embeddings (the same bar and probe-settings discipline as
  * AnnSpec), build determinism, blob round-trip, and exact agreement
  * of the internal distance with the CosineSimilarity expression —
  * the property that keeps probe scores oracle-comparable.
  */
class HnswSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val items: Seq[(Long, Array[Float])] =
    emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
  private lazy val qv: Array[Float] = items.find(_._1 == 0L).get._2

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("id").cast("long")).collect().map(_.getLong(0)).toSet

  test("single-graph recall@20 >= 0.9 vs brute force (near-uniform vectors)") {
    val g = Hnsw.buildGraph(items, m = 16, efConstruction = 100, seed = 42L)
    val exact = ids(Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
    val approx = g.search(qv, k = 20, ef = 64).map(_._1).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@20 = $recall with ef=64")
  }

  test("graph cosine replicates the CosineSimilarity expression exactly") {
    val g = Hnsw.buildGraph(items.take(50), m = 8, efConstruction = 50, seed = 1L)
    val fromExpr = emb.filter(col("vec_id") < 50)
      .select(col("vec_id"),
        graft.functions.GraftFunctions.cosineSimilarity(col("embedding"),
          lit(qv)).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0 until g.size).foreach { node =>
      assert(g.cosine(qv, node) == fromExpr(g.ids(node)),
        s"distance diverged from the expression at node $node")
    }
  }

  test("build is deterministic and blobs round-trip") {
    val g1 = Hnsw.buildGraph(items, m = 16, efConstruction = 100, seed = 42L)
    val g2 = Hnsw.buildGraph(items.reverse, m = 16, efConstruction = 100, seed = 42L)
    // same data in any input order → identical graph (inserts sort by id)
    assert(g1.ids.sameElements(g2.ids))
    assert(g1.entry == g2.entry && g1.maxLevel == g2.maxLevel)
    assert(g1.neighbors.zip(g2.neighbors).forall { case (a, b) =>
      a.length == b.length && a.zip(b).forall { case (x, y) => x.sameElements(y) }
    }, "adjacency must be input-order independent")
    val rt = Hnsw.deserialize(Hnsw.serialize(g1))
    assert(rt.search(qv, 20, 64) == g1.search(qv, 20, 64))
  }

  test("persisted multi-partition index: probe merges to brute-force top-k") {
    val path = TestSpark.tempDir("graft_hnsw_spec_")
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", path,
      nPartitions = 4, m = 16, efConstruction = 100)
    val probe = Hnsw.probeHnswIndex(spark, path, qv, k = 20, ef = 64)
      .orderBy(col("cos").desc, col("id").asc).limit(20)
    val exact = ids(Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
    val got = ids(probe)
    val recall = got.intersect(exact).size.toDouble / exact.size
    // 4 graphs of ~125 vectors each, ef=64: each partition's local
    // top-20 is essentially exact, so the merged set should be too
    assert(recall >= 0.9, s"multi-partition recall@20 = $recall")
    // candidate volume = nParts * k, the merge input bound
    assert(Hnsw.probeHnswIndex(spark, path, qv, 20, 64).count() <= 4L * 20)
  }

  test("batch kNN join: contract + per-query recall vs brute force") {
    val path = TestSpark.tempDir("graft_hnsw_knn_")
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", path,
      nPartitions = 4, m = 16, efConstruction = 100)
    val queries = emb.filter(col("vec_id") < 10)
    val got = Hnsw.knnJoin(spark, path, queries, "vec_id", "embedding",
      k = 5, ef = 64).collect()
    val byQ = got.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 5),
        s"query $q must get ranks 1..5")
      assert(!rows.exists(_.getAs[Long]("x_id") == q), "self-match leaked")
    }
    // recall vs exact neighbors (self excluded), averaged over queries
    val recalls = (0L until 10L).map { q =>
      val qv2 = items.find(_._1 == q).get._2
      val exact = Ann.bruteForceTopK(emb.filter(col("vec_id") =!= q),
        "vec_id", "embedding", qv2, 5)
        .collect().map(_.getAs[Long]("id")).toSet
      val approx = byQ(q).map(_.getAs[Long]("x_id")).toSet
      approx.intersect(exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@5 = $mean")
  }

  test("incremental upsert is byte-identical to a full rebuild") {
    val incPath = TestSpark.tempDir("graft_hnsw_inc_")
    val fullPath = TestSpark.tempDir("graft_hnsw_full_")
    // build on the first half, upsert the second half + an UPDATED
    // vector for id 7 (the full build sees the updated value directly)
    val half = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    val updated7 = emb.filter(col("vec_id") === 7)
      .withColumn("embedding", org.apache.spark.sql.functions.transform(
        col("embedding"), x => x * 0.5f))
    Hnsw.buildHnswIndex(half, "vec_id", "embedding", incPath, nPartitions = 4)
    Hnsw.upsertHnswIndex(rest.unionByName(updated7), "vec_id", "embedding", incPath)
    Hnsw.buildHnswIndex(
      emb.filter(col("vec_id") =!= 7).unionByName(updated7),
      "vec_id", "embedding", fullPath, nPartitions = 4)
    val inc = spark.read.parquet(s"$incPath/graph")
      .select("part", "blob").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val full = spark.read.parquet(s"$fullPath/graph")
      .select("part", "blob").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(inc.keySet == full.keySet)
    inc.foreach { case (p, b) =>
      assert(java.util.Arrays.equals(b, full(p)),
        s"partition $p diverged from the full rebuild")
    }
    // the updated vector is live: probing with id 7's OLD embedding no
    // longer returns a perfect self-match, the halved one does
    val probe = Hnsw.probeHnswIndex(spark, incPath,
      items.find(_._1 == 7L).get._2.map(_ * 0.5f), k = 1, ef = 64)
      .orderBy(col("cos").desc).limit(1).collect().head
    assert(probe.getLong(0) == 7L && math.abs(probe.getDouble(1) - 1.0) < 1e-9)
  }

  test("upsert rewrites only the touched partition directories") {
    val path = TestSpark.tempDir("graft_hnsw_touch_")
    Hnsw.buildHnswIndex(emb, "vec_id", "embedding", path, nPartitions = 8)
    def fileSet(p: Int): Set[String] = {
      val d = new java.io.File(s"$path/graph/part=$p")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    val before = (0 until 8).map(p => p -> fileSet(p)).toMap
    // a single-row upsert touches exactly one partition
    Hnsw.upsertHnswIndex(emb.filter(col("vec_id") === 123), "vec_id", "embedding", path)
    val after = (0 until 8).map(p => p -> fileSet(p)).toMap
    val changed = (0 until 8).filter(p => before(p) != after(p))
    assert(changed.size == 1,
      s"exactly one partition dir must be rewritten, got $changed")
  }

  test("non-numeric or null ids fail loudly at the operator entry points") {
    import spark.implicits._
    val badIds = Seq(("doc-a", Seq(1.0f, 0.0f)), ("doc-b", Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Hnsw.buildHnswIndex(badIds, "vec_id", "embedding",
        TestSpark.tempDir("graft_hnsw_badid_"))
    }
    assert(e1.getMessage.contains("numeric ids"))
    val path = TestSpark.tempDir("graft_hnsw_badid_upsert_")
    Hnsw.buildHnswIndex(emb.limit(50), "vec_id", "embedding", path)
    val nullIds = Seq((null.asInstanceOf[java.lang.Long], Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Hnsw.upsertHnswIndex(nullIds, "vec_id", "embedding", path)
    }
    assert(e2.getMessage.contains("numeric ids"))
  }

  test("degenerate inputs: empty partition, dimension mismatch, zero vector") {
    val path = TestSpark.tempDir("graft_hnsw_deg_")
    // more partitions than rows → some partitions empty, still builds
    Hnsw.buildHnswIndex(emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      path, nPartitions = 8, m = 4, efConstruction = 10)
    val got = Hnsw.probeHnswIndex(spark, path, qv, k = 5)
      .orderBy(col("cos").desc).limit(5).count()
    assert(got == 3, "all three vectors must surface")
    val err = intercept[IllegalArgumentException] {
      Hnsw.probeHnswIndex(spark, path, Array(1.0f), k = 5)
    }
    assert(err.getMessage.contains("dimension"))
    // zero query vector: cosine undefined → sentinel sim, no crash
    val g = Hnsw.buildGraph(items.take(10), m = 4, efConstruction = 10, seed = 7L)
    assert(g.search(new Array[Float](qv.length), 3, 16).forall(_._2.isNegInfinity))
  }
}
