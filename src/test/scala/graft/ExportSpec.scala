package graft

import graft.operators.Export
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the training-export sharding operator: deterministic
  * md5 bucketing (re-export lands every doc in the same shard),
  * manifest totals, empty-shard presence, and the partitioned
  * writer's round-trip.
  */
class ExportSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("shardId is deterministic and independent of order and partitioning") {
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("doc_id"), Export.shardId(col("doc_id"), 8).as("shard"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = assign(docs)
    val b = assign(docs.repartition(17).orderBy(col("text")))
    assert(a == b, "shard assignment must not depend on layout")
    assert(a.values.forall(s => s >= 0 && s < 8))
    // decorrelated from id order: consecutive ids spread over shards
    assert(a.filterKeys(_ < 16).values.toSet.size > 2,
      "md5 bucketing must not stripe consecutive ids into one shard")
  }

  test("manifest: totals match the corpus, empty shards present as zeros") {
    val m = Export.shardManifest(docs, "doc_id", lit(1), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.map(_._1).sorted.toSeq == (0L until 8L))
    assert(m.map(_._2).sum == docs.count())
    // tokens expression = lit(1) → n_tokens ≡ n_docs
    assert(m.forall { case (_, d, t) => d == t })
    // a shard count far above the corpus size must still emit every
    // shard row, the empty ones as zeros
    val wide = Export.shardManifest(docs.limit(3), "doc_id", lit(1), 64)
      .collect()
    assert(wide.length == 64)
    assert(wide.map(_.getLong(1)).sum == 3)
  }

  test("shardOrder: reproducible permutation, dense seqs, seed reshuffles") {
    def order(seed: String): Seq[(Long, Long, Int)] =
      Export.shardOrder(docs, "doc_id", 4, seed)
        .select(col("shard"), col("doc_id"), col("seq"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val a = order("epoch-0")
    // identical on replay, regardless of input layout
    val b = Export.shardOrder(docs.repartition(13), "doc_id", 4, "epoch-0")
      .select(col("shard"), col("doc_id"), col("seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(a.toSet == b.toSet, "same seed must replay the same order")
    // seq dense from 0 within each shard
    a.groupBy(_._1).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted == rows.indices.toSeq,
        s"shard $sh seqs not dense")
    }
    // a different seed actually reshuffles (some doc moves seq)
    val c = order("epoch-1")
    assert(a.toSet != c.toSet, "new seed must produce a new permutation")
    // shard membership is seed-INDEPENDENT (only order changes)
    assert(a.map(r => (r._1, r._2)).toSet == c.map(r => (r._1, r._2)).toSet,
      "seed must not move docs between shards")
    // the permutation decorrelates from id order: within a shard, the
    // first few seqs are not simply the smallest ids
    val sh0 = a.filter(_._1 == 0L).sortBy(_._3).map(_._2)
    assert(sh0.take(5) != sh0.sorted.take(5),
      "md5 order must not equal id order")
  }

  test("writeShards salts the writer: >1 file per shard, membership unchanged") {
    val salted = TestSpark.tempDir("graft_export_salted_")
    val unsalted = TestSpark.tempDir("graft_export_unsalted_")
    Export.writeShards(docs, "doc_id", 2, salted, filesPerShard = 8)
    Export.writeShards(docs, "doc_id", 2, unsalted, filesPerShard = 1)
    // the salt spreads a shard's rows over multiple writer tasks —
    // without it every shard funnels through exactly one task (the
    // 100 TB wall-clock tail)
    val partFiles = new java.io.File(salted).listFiles()
      .filter(_.getName.startsWith("shard=")).map(
        _.listFiles().count(_.getName.endsWith(".parquet")))
    assert(partFiles.exists(_ > 1),
      s"expected some shard dir with >1 part file, got ${partFiles.toSeq}")
    // salting changes WHICH task writes a row, never which shard owns it
    val a = spark.read.parquet(salted).select("doc_id", "shard")
    val b = spark.read.parquet(unsalted).select("doc_id", "shard")
    assert(a.count() == docs.count() && b.count() == docs.count())
    assert(a.join(b, Seq("doc_id", "shard")).count() == docs.count(),
      "shard membership must be identical with and without salting")
  }

  test("writeShards round-trips with shard-partitioned layout") {
    val path = TestSpark.tempDir("graft_export_")
    Export.writeShards(docs, "doc_id", 4, path)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted.toSeq
    assert(dirs.nonEmpty && dirs.forall(_.matches("shard=[0-3]")))
    val back = spark.read.parquet(path)
    assert(back.count() == docs.count())
    // written shard column equals a fresh assignment (re-export lands
    // identically)
    val mismatch = back
      .withColumn("again", Export.shardId(col("doc_id"), 4))
      .filter(col("shard") =!= col("again")).count()
    assert(mismatch == 0)
  }
}
