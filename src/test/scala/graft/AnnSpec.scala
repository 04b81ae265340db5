package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN recall tests against exact brute force on the sf0.01
  * embeddings — the analogue of the reference's per-index-type
  * integration tests (extension/tests/integration_tests.rs:653-808),
  * which assert each index returns the expected result set.
  * Approximate paths must reach recall@20 ≥ 0.9 with the probe
  * settings THE DEMO QUERIES USE (stated per test — the near-uniform
  * synthetic vectors need wider probes than the API defaults, which
  * target clustered real embeddings); precision is 1.0 by
  * construction (exact cosine on candidates).
  */
class AnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val qv: Array[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("id").cast("long")).collect().map(_.getLong(0)).toSet

  private def recall(approx: Set[Long], exact: Set[Long]): Double =
    approx.intersect(exact).size.toDouble / exact.size

  test("lshTopK recall@20 >= 0.9 vs brute force (query defaults)") {
    // The sf0.01 embeddings are near-uniform random — the hardest
    // case for angular LSH (recall ≈ fraction of buckets probed).
    // probeHamming=5 is what the demo query uses; measured sweep:
    // probe 3 → 0.75, 4 → 0.85, 5 → 1.0.
    val exact = ids(Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
    val approx = ids(Ann.lshTopK(emb, "vec_id", "embedding", qv,
      k = 20, bits = 8, probeHamming = 5))
    assert(recall(approx, exact) >= 0.9,
      s"lsh recall ${recall(approx, exact)} below 0.9")
  }

  test("persisted LSH probe matches the ad-hoc lshTopK result set") {
    // same planes (seed=42), same probe ring → identical candidates,
    // so the persisted path must return exactly what lshTopK returns
    val path = TestSpark.tempDir("graft_lsh_spec_")
    Ann.buildLshIndex(emb, "vec_id", "embedding", path, bits = 8)
    val adhoc = ids(Ann.lshTopK(emb, "vec_id", "embedding", qv,
      k = 20, bits = 8, probeHamming = 5))
    val persisted = ids(Ann.probeLshIndex(spark, path, "vec_id", "embedding", qv,
      k = 20, probeHamming = 5))
    assert(persisted == adhoc,
      s"persisted LSH diverged from ad-hoc: ${persisted.diff(adhoc)} / ${adhoc.diff(persisted)}")
    val exact = ids(Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
    assert(recall(persisted, exact) >= 0.9,
      s"persisted lsh recall ${recall(persisted, exact)} below 0.9")
  }

  test("LSH probe scans only the Hamming-ring bucket partitions") {
    val path = TestSpark.tempDir("graft_lsh_spec2_")
    Ann.buildLshIndex(emb, "vec_id", "embedding", path, bits = 8)
    val probe = Ann.probeLshIndex(spark, path, "vec_id", "embedding", qv,
      k = 20, probeHamming = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"probe must push a bucket filter into PartitionFilters, plan was:\n$plan")
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val filesRead = scan.flatMap(_.metrics.get("numFiles")).map(_.value)
    // ring size at bits=8, h=2: C(8,0)+C(8,1)+C(8,2) = 37 buckets,
    // one file per bucket (the build repartitions by key)
    assert(filesRead.exists(_ <= 37),
      s"expected at most 37 bucket partition files read, got $filesRead")
    // the ring enumeration itself
    assert(Ann.ringKeys(0L, 8, 2).size == 37)
    assert(Ann.ringKeys(5L, 8, 2).distinct.size == 37)
    assert(Ann.ringKeys(5L, 8, 2).forall(k2 =>
      java.lang.Long.bitCount(k2 ^ 5L) <= 2))
  }

  test("directedProbeKeys: own bucket first, unique keys, nondecreasing flip cost") {
    val margins = Array(0.5, -0.05, 1.2, -0.3, 0.01, -0.9)
    val keys = Ann.directedProbeKeys(margins, bits = 6, maxProbes = 64)
    assert(keys.length == 64, "full budget must enumerate every bucket exactly once")
    assert(keys.distinct.length == 64)
    // first key = query's own bucket (positive margins set their bit)
    val qKey = margins.zipWithIndex.collect { case (m, i) if m > 0 => 1L << i }.sum
    assert(keys.head == qKey)
    // enumeration order: total |margin| of flipped bits never decreases
    val costs = keys.map(k => margins.zipWithIndex.collect {
      case (m, i) if ((k ^ qKey) & (1L << i)) != 0 => math.abs(m)
    }.sum)
    assert(costs.zip(costs.tail).forall { case (a, b) => b >= a - 1e-12 },
      s"probe costs must be nondecreasing: ${costs.toSeq}")
    // the second probe flips exactly the single cheapest bit (bit 4)
    assert(keys(1) == (qKey ^ (1L << 4)))
  }

  test("demo settings: auto-bits index + directed probe reaches recall@20 >= 0.9") {
    // mirrors Queries.annLshTopK exactly: bits auto-derived from the
    // corpus (500 rows → 3 bits), maxProbes = 20
    assert(Ann.deriveBits(500) == 3)
    assert(Ann.deriveBits(2000) == 5)
    assert(Ann.deriveBits(100000000000L) == 16, "bits must cap at 16")
    val path = TestSpark.tempDir("graft_lsh_auto_")
    Ann.buildLshIndex(emb, "vec_id", "embedding", path, bits = 0)
    val got = ids(Ann.probeLshIndexDirected(spark, path, "vec_id", "embedding",
      qv, k = 20, maxProbes = 20))
    val exact = ids(Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
    assert(recall(got, exact) >= 0.9,
      s"auto-bits directed-probe recall ${recall(got, exact)} below 0.9")
  }

  test("clustered vectors: directed probe recall >= 0.9 scanning < 25% of buckets") {
    // On near-uniform vectors any LSH scheme degrades to recall ≈
    // scanned fraction (no per-bit signal to exploit); the scale claim
    // — high recall from a SMALL probe budget — is only measurable on
    // data with neighborhood structure, so this test plants clusters
    // (same fixture shape as the knnJoin test) and asserts both sides
    // of the trade: recall AND the probed-bucket bound.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 32
    val rows = (0 until 40).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until 10).map { i =>
        val v = center.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
        (c * 10L + i, v.toSeq)
      }
    }
    val cdf = rows.toDF("vec_id", "embedding").cache()
    val path = TestSpark.tempDir("graft_lsh_clu_")
    val bits = 8 // 256 buckets; the probe budget covers 16/256 = 6.25%
    Ann.buildLshIndex(cdf, "vec_id", "embedding", path, bits = bits)
    val queries = (0 until 5).map(c => rows(c * 10 * 2)) // 5 cluster reps
    val recalls = queries.map { case (qid, v) =>
      val probe = Ann.probeLshIndexDirected(spark, path, "vec_id", "embedding",
        v.toArray, k = 6, maxProbes = 16)
      val got = ids(probe) - qid
      probe.collect()
      val scan = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      val filesRead = scan.flatMap(_.metrics.get("numFiles")).map(_.value)
      assert(filesRead.exists(_ <= 16),
        s"probe budget 16 must bound the partitions read, got $filesRead")
      val exact = ids(Ann.bruteForceTopK(cdf.filter(col("vec_id") =!= qid),
        "vec_id", "embedding", v.toArray, 5))
      got.intersect(exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9,
      s"clustered directed-probe mean recall@5 $mean below 0.9 at 6.25% scan")
  }

  test("ivf probe recall@20 >= 0.9 vs brute force (query defaults)") {
    val exact = ids(Ann.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
    val path = TestSpark.tempDir("graft_ivf_spec_")
    Ann.buildIvfIndex(emb, "vec_id", "embedding", path, nCells = 16, iterations = 3)
    val approx = ids(Ann.probeIvfIndex(spark, path, "vec_id", "embedding", qv,
      k = 20, nProbe = 8))
    assert(recall(approx, exact) >= 0.9,
      s"ivf recall ${recall(approx, exact)} below 0.9")
  }

  test("ivf probe scans only the probed cell partitions") {
    val path = TestSpark.tempDir("graft_ivf_spec2_")
    Ann.buildIvfIndex(emb, "vec_id", "embedding", path, nCells = 16, iterations = 3)
    val probe = Ann.probeIvfIndex(spark, path, "vec_id", "embedding", qv,
      k = 20, nProbe = 4)
    val plan = probe.queryExecution.executedPlan.toString
    // the filter must appear INSIDE the PartitionFilters list — every
    // partitioned scan prints "PartitionFilters: [...]", so a bare
    // contains("PartitionFilters") passes even with zero pruning.
    // (DataFrame.inputFiles is NOT usable here: it lists the
    // relation's full file index without applying partition pruning.)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"probe must push a cell filter into PartitionFilters, plan was:\n$plan")
    // and the pruning must be real at execution time: the scan's
    // "number of files read" metric counts only selected partitions
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val filesRead = scan.flatMap(_.metrics.get("numFiles")).map(_.value)
    assert(filesRead.exists(_ <= 4),
      s"expected at most 4 cell partition files read, got $filesRead")
  }

  test("knnJoin (multiprobe) mean recall@5 >= 0.9 on clustered vectors") {
    // kNN-join recall is only meaningful when neighbors are actually
    // local (LSH buckets capture clusters). On uniform-random vectors
    // every method degrades to scan-fraction — so this test plants 40
    // clusters of 10 points (centers + small noise) where true top-5
    // neighbors are in-cluster, and asserts the bucketed multiprobe
    // join recovers them.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 32
    val rows = (0 until 40).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until 10).map { i =>
        val v = center.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
        (c * 10L + i, v.toSeq)
      }
    }
    val cdf = rows.toDF("vec_id", "embedding").cache()
    val queries = cdf.filter(col("vec_id") % 10 === 0)
    val got = Ann.knnJoin(queries, cdf, "vec_id", "embedding", k = 5, bits = 6)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("x_id")).toSet).toMap
    val queryVecs = queries.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val recalls = queryVecs.map { case (qid, v) =>
      val exact = Ann.bruteForceTopK(cdf.filter(col("vec_id") =!= qid),
          "vec_id", "embedding", v, 5)
        .select(col("id").cast("long")).collect().map(_.getLong(0)).toSet
      got.getOrElse(qid, Set.empty).intersect(exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"knnJoin mean recall $mean below 0.9")
  }

  test("knnJoinIndexed matches ad-hoc knnJoin and prunes index partitions") {
    val path = TestSpark.tempDir("graft_lsh_knn_")
    Ann.buildLshIndex(emb, "vec_id", "embedding", path, bits = 6)
    val queries = emb.filter(col("vec_id") < 50)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("x_id"),
        r.getAs[Int]("rank"))).toSet
    val adhoc = rows(Ann.knnJoin(queries, emb, "vec_id", "embedding", k = 5, bits = 6))
    val indexed = Ann.knnJoinIndexed(spark, path, queries, "vec_id", "embedding", k = 5)
    assert(rows(indexed) == adhoc,
      "indexed batch kNN must return exactly the ad-hoc multiprobe result")
    val plan = indexed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"index side must push the probe-key union into PartitionFilters:\n$plan")
  }

  test("upsertIvfIndex: frozen-centroid reassignment, only touched cells rewritten") {
    import spark.implicits._
    val path = TestSpark.tempDir("graft_ivf_upsert_")
    Ann.buildIvfIndex(emb, "vec_id", "embedding", path, nCells = 16, iterations = 3)
    val centroids = Ann.loadIvfCentroids(spark, path)
    // flip 5 vectors — cosine inverts, so cells all but certainly move
    val changed = emb.filter(col("vec_id") < 5)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    val changedAssign = Ann.assignCells(changed, "embedding", centroids)
      .select(col("vec_id"), col("__cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val beforeAssign = Ann.assignCells(emb, "embedding", centroids)
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), col("__cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val touched = (changedAssign.values ++ beforeAssign.values).toSet
    val untouched = (0 until 16).toSet -- touched
    assert(untouched.nonEmpty, "test needs at least one untouched cell")
    def cellFiles(c: Int): Map[String, Long] = {
      val d = new java.io.File(s"$path/assigned/cell=$c")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = untouched.map(c => c -> cellFiles(c)).toMap

    Ann.upsertIvfIndex(changed, "vec_id", "embedding", path)

    // 1) content equals a frozen-centroid assignment of the updated corpus
    val expect = Ann.assignCells(
        emb.filter(col("vec_id") >= 5).unionByName(changed),
        "embedding", centroids)
      .select(col("vec_id"), col("__cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = spark.read.parquet(s"$path/assigned")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expect, "assigned table must equal frozen-centroid reassignment")
    // 2) untouched cell partitions were not rewritten
    untouched.foreach { c =>
      assert(cellFiles(c) == before(c), s"untouched cell $c was rewritten")
    }
    // 3) the denormalized q8 codes track the new vectors (quantized
    // probe stays consistent after maintenance)
    val q8 = spark.read.parquet(s"$path/assigned")
      .filter(col("vec_id") === 0).select(col("q8")).head().getSeq[Byte](0)
    val newVec = changed.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    assert(q8 == graft.operators.Quantize.quantizeVec(newVec).toSeq)
  }

  test("upsertLshIndex: frozen-planes re-key, touched buckets only, codes track") {
    val path = TestSpark.tempDir("graft_lsh_upsert_")
    Ann.buildLshIndex(emb, "vec_id", "embedding", path, bits = 4)
    // flip 5 vectors (sign-LSH keys all but certainly move) + one
    // null-vector row that must be IGNORED, not deleted
    val flipped = emb.filter(col("vec_id") < 5)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    val changed = flipped.unionByName(
      emb.filter(col("vec_id") === 7)
        .withColumn("embedding", lit(null).cast("array<float>")))
    def bucketFiles(): Map[String, Map[String, Long]] = {
      val d = new java.io.File(s"$path/buckets")
      d.listFiles().filter(_.getName.startsWith("bucket=")).map { b =>
        b.getName -> b.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap
      }.toMap
    }
    val before = bucketFiles()

    Ann.upsertLshIndex(changed, "vec_id", "embedding", path)

    // 1) content equals a frozen-planes rebuild over the updated corpus
    val rebuilt = TestSpark.tempDir("graft_lsh_rebuild_")
    Ann.buildLshIndex(emb.filter(col("vec_id") >= 5).unionByName(flipped),
      "vec_id", "embedding", rebuilt, bits = 4)
    def content(p: String) = spark.read.parquet(s"$p/buckets")
      .select(col("vec_id"), col("bucket").cast("long"), col("q8"),
        col("vec_prefix"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Byte](2),
        r.getSeq[Float](3))).toSet
    assert(content(path) == content(rebuilt),
      "upserted index must equal a frozen-planes rebuild (incl. q8 codes " +
        "and matryoshka prefixes)")
    // 2) untouched bucket partitions were not rewritten
    val changedKeys = Ann.lshKey(col("embedding"),
      Ann.hyperplanes(4, emb.select(size(col("embedding"))).head().getInt(0)))
    val touched = emb.filter(col("vec_id") < 5).select(changedKeys)
      .unionByName(flipped.select(changedKeys))
      .distinct().collect().map(r => s"bucket=${r.getLong(0)}").toSet
    bucketFiles().foreach { case (b, files) =>
      if (!touched.contains(b))
        assert(files == before(b), s"untouched $b was rewritten")
    }
    // 3) the quantized indexed join stays consistent post-maintenance
    val queries = emb.filter(col("vec_id") >= 5 && col("vec_id") < 55)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("x_id"),
        r.getAs[Int]("rank"))).toSet
    assert(rows(Ann.knnJoinQuantizedIndexed(spark, path, queries,
        "vec_id", "embedding", k = 5, pool = 20)) ==
      rows(Ann.knnJoinQuantizedIndexed(spark, rebuilt, queries,
        "vec_id", "embedding", k = 5, pool = 20)),
      "maintained and rebuilt indexes must serve identical joins")
  }

  test("upsertLshIndex degrades gracefully on a pre-prefix legacy index") {
    // An index persisted before vec_prefix existed (meta without
    // prefix_dims, buckets without the column) must upsert in its own
    // shape — reading prefix_dims unconditionally failed at runtime
    val built = TestSpark.tempDir("graft_lsh_prebuild_")
    Ann.buildLshIndex(emb, "vec_id", "embedding", built, bits = 4)
    val legacy = TestSpark.tempDir("graft_lsh_legacy_")
    spark.read.parquet(s"$built/meta").drop("prefix_dims")
      .coalesce(1).write.parquet(s"$legacy/meta")
    spark.read.parquet(s"$built/buckets").drop("vec_prefix")
      .repartition(col("bucket")).write.partitionBy("bucket")
      .parquet(s"$legacy/buckets")
    val flipped = emb.filter(col("vec_id") < 3)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    Ann.upsertLshIndex(flipped, "vec_id", "embedding", legacy)
    val after = spark.read.parquet(s"$legacy/buckets")
    assert(!after.columns.contains("vec_prefix"),
      "legacy shape must be preserved (no half-populated prefix column)")
    assert(after.count() == emb.count(), "no rows gained or lost")
    // the flipped rows were re-keyed with the frozen planes and their
    // q8 codes track the new vectors
    val planes = Ann.hyperplanes(4,
      emb.select(size(col("embedding"))).head().getInt(0))
    val want = flipped.select(col("vec_id"),
        Ann.lshKey(col("embedding"), planes).as("want_bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    after.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("bucket").cast("long")).collect()
      .foreach(r => assert(r.getLong(1) == want(r.getLong(0))))
  }

  test("upsertIvfIndex: null-vector rows are ignored, not silently deleted") {
    val path = TestSpark.tempDir("graft_ivf_upsert_null_")
    Ann.buildIvfIndex(emb, "vec_id", "embedding", path, nCells = 8, iterations = 3)
    // A changed batch where one row's vector is null: per the scaladoc
    // contract it must be IGNORED — the old row stays in its cell (the
    // HNSW upsert behaves the same under upsertVectorIndex). The bug
    // regression: ids derived from ALL changed rows anti-joined row 3
    // out of its old cell while `fresh` (null-filtered) never re-added
    // it — a silent deletion.
    val changed = emb.filter(col("vec_id") < 5)
      .withColumn("embedding",
        when(col("vec_id") === 3, lit(null)).otherwise(col("embedding")))
    val before3 = spark.read.parquet(s"$path/assigned")
      .filter(col("vec_id") === 3).collect()
    assert(before3.length == 1)
    Ann.upsertIvfIndex(changed, "vec_id", "embedding", path)
    val after = spark.read.parquet(s"$path/assigned")
    assert(after.filter(col("vec_id") === 3).count() == 1,
      "null-vector row must survive the upsert untouched")
    assert(after.count() == emb.count(), "no rows gained or lost")
  }

  test("assignCells survives nClusters >= 2048 (sqrt-N scale) and matches driver argmin") {
    // The √N rule puts nClusters at 10⁴–10⁵ for 100 TB corpora. The
    // old least(struct × nCells) unrolling blew Janino's method-size
    // limit well before that; the broadcast-argmin UDF must (a) not
    // blow up at 2048 cells and (b) agree with an independent
    // driver-side argmin, including the ties-to-lowest-cell rule.
    import spark.implicits._
    val dim = 16
    val n = 4096
    def vecOf(i: Long): Array[Float] = {
      var h = i * 0x9E3779B97F4A7C15L + 1L
      Array.fill(dim) {
        h ^= h >>> 12; h ^= h << 25; h ^= h >>> 27
        ((h * 0x2545F4914F6CDD1DL) >> 40).toFloat / (1 << 23).toFloat
      }
    }
    val rows = (0L until n).map(i => (i, vecOf(i).toSeq)).toDF("vec_id", "embedding")
    val centroids: Array[(Int, Array[Float])] =
      Array.tabulate(2048)(c => (c, vecOf(1000000L + c)))
    val assigned = Ann.assignCells(rows, "embedding", centroids)
      .select(col("vec_id"), col("__cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned.size == n)
    // independent driver-side check on a deterministic sample
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val d2 = na + nb - 2.0 * dot
      math.sqrt(if (d2 < 0.0) 0.0 else d2)
    }
    (0L until n by 37L).foreach { i =>
      val v = vecOf(i)
      val best = centroids.map { case (c, cv) => (l2(v, cv), c) }.minBy(identity)
      assert(assigned(i) == best._2, s"row $i: got ${assigned(i)}, want ${best._2}")
    }
    // tie-break: a row exactly equidistant from two centroids (both
    // AT the row's vector) must land in the lower cell id
    val tieVec = vecOf(7L)
    val tieCentroids: Array[(Int, Array[Float])] =
      Array((9, tieVec.clone), (3, tieVec.clone), (11, vecOf(8L)))
    val tie = Ann.assignCells(Seq((7L, tieVec.toSeq)).toDF("vec_id", "embedding"),
      "embedding", tieCentroids).select("__cell").head().getInt(0)
    assert(tie == 3, s"tie must break to lowest cell id, got $tie")
    // NaN ranks as +infinity, like the least(struct) ordering it
    // replaced: a NaN distance from the FIRST centroid must not pin
    // the assignment to it when a later centroid is finite
    val nanCentroids: Array[(Int, Array[Float])] = Array(
      (0, Array(Float.NaN, 0f)), (1, Array(1f, 1f)))
    val nanPick = Ann.assignCells(
      Seq((1L, Seq(0f, 0f))).toDF("vec_id", "embedding"),
      "embedding", nanCentroids).select("__cell").head().getInt(0)
    assert(nanPick == 1, s"NaN distance must lose to a finite one, got $nanPick")
    // all-NaN distances: deterministic lowest cell (NaN==NaN tie rule)
    val allNan = Ann.assignCells(
      Seq((2L, Seq(Float.NaN, 0f))).toDF("vec_id", "embedding"),
      "embedding", nanCentroids).select("__cell").head().getInt(0)
    assert(allNan == 0, s"all-NaN row must keep the lowest cell, got $allNan")
  }

  test("empty index: knnJoin returns no rows; IVF build errors meaningfully") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val queries = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Ann.knnJoin(queries, empty, "vec_id", "embedding", k = 5).collect().isEmpty)
    val e = intercept[IllegalArgumentException] {
      Ann.ivfCentroids(empty, "vec_id", "embedding", nCells = 4)
    }
    assert(e.getMessage.contains("empty"))
  }
}
