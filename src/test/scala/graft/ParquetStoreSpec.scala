package graft

import graft.sources.ParquetStore
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-merge store semantics: upsert correctness AND the scale
  * property that a merge rewrites only the key-hash buckets it
  * touches (per-merge I/O ∝ batch, not table — the property Delta
  * MERGE has and copy-on-write-the-world does not).
  */
class ParquetStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(ids: Range, tag: String) =
    ids.map(i => (i.toString, s"$tag-$i")).toDF("pkey", "payload")

  test("merge: updates replace same-key rows, new keys append") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_"))
    store.merge("t", rows(1 to 100, "v1"), "pkey")
    assert(store.read("t").count() == 100)
    store.merge("t", rows(50 to 120, "v2"), "pkey")
    val got = store.read("t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == 120)
    assert(got("10") == "v1-10")
    assert(got("50") == "v2-50" && got("120") == "v2-120")
  }

  test("merge bounds output files per bucket (salted write shuffle)") {
    // without the pre-write shuffle, every upstream task writes its
    // own file into every bucket it touches: a 32-partition merge
    // into 16 buckets left up to 512 files, and small-table probes
    // paid per-file listing/footer costs 3x the data
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_files_"))
    store.merge("t", rows(1 to 500, "v1").repartition(32), "pkey")
    store.merge("t", rows(200 to 700, "v2").repartition(32), "pkey")
    val root = store.read("t").inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).getParentFile)
    val perBucket = root.groupBy(_.getName).map { case (b, fs) =>
      b -> fs.flatMap(_.listFiles()).distinct
        .count(_.getName.endsWith(".parquet"))
    }
    assert(perBucket.nonEmpty)
    perBucket.foreach { case (b, n) =>
      assert(n <= 4, s"bucket $b has $n part files; the salted shuffle " +
        "must bound files per bucket to filesPerBucket")
    }
    // and the salt must actually SPREAD a bucket over several writers —
    // a salt derived from the same hash as the bucket is arithmetically
    // inert when filesPerBucket divides nBuckets (every bucket
    // collapses back to one writer task, the 100 TB tail)
    assert(perBucket.values.exists(_ > 1),
      s"expected some bucket with >1 part file, got ${perBucket.toSeq.sorted}")
  }

  test("merge widens a pre-existing table with new update columns") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_evo_"))
    store.merge("t", rows(1 to 10, "v1"), "pkey")
    // render path grows a column (the search_token_counts shape):
    // updated rows carry it, kept rows surface it as null — never
    // silently dropped
    val wide = (5 to 12).map(i => (i.toString, s"v2-$i", i * 10))
      .toDF("pkey", "payload", "extra")
    store.merge("t", wide, "pkey")
    val got = store.read("t").collect()
      .map(r => r.getString(0) -> Option(r.getAs[Any]("extra"))).toMap
    assert(got.size == 12)
    assert(got("3") == None, "kept row gets null for the new column")
    assert(got("7") == Some(70) && got("12") == Some(120))
  }

  test("merge rewrites ONLY the touched buckets") {
    val dir = TestSpark.tempDir("graft_ps_")
    val store = new ParquetStore(spark, dir)
    store.merge("t", rows(1 to 200, "v1"), "pkey")

    def bucketDirs(v: Long): Set[String] = {
      val p = new Path(s"$dir/t/v_$v")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName).filter(_.startsWith("__bucket=")).toSet
    }
    val v0Buckets = bucketDirs(0)
    assert(v0Buckets.size > 1, "initial merge must produce multiple buckets")

    // a single-key update touches exactly ONE bucket
    store.merge("t", Seq(("7", "v2-7")).toDF("pkey", "payload"), "pkey")
    val v1Buckets = bucketDirs(1)
    assert(v1Buckets.size == 1,
      s"single-key merge must rewrite one bucket, rewrote: $v1Buckets")
    // untouched buckets still served from v_0 (files untouched on disk)
    assert(v0Buckets.intersect(bucketDirs(0)).size == v0Buckets.size)
    val got = store.read("t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == 200)
    assert(got("7") == "v2-7")
    assert(got("8") == "v1-8")
  }

  test("flat overwrite is re-bucketed by the first merge without losing rows") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_"))
    store.overwrite("t", rows(1 to 50, "v1"))
    assert(store.read("t").count() == 50)
    store.merge("t", Seq(("3", "v2-3"), ("99", "v2-99")).toDF("pkey", "payload"), "pkey")
    val got = store.read("t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == 51)
    assert(got("3") == "v2-3" && got("99") == "v2-99" && got("17") == "v1-17")
  }

  test("delete removes only the named keys, bucket-scoped") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_"))
    store.merge("t", rows(1 to 100, "v1"), "pkey")
    store.delete("t", Seq("5", "6").toDF("pkey"), "pkey")
    val got = store.read("t").collect().map(_.getString(0)).toSet
    assert(got.size == 98 && !got.contains("5") && !got.contains("6"))
  }

  test("repeated merges GC unreferenced snapshots but keep the previous one") {
    val dir = TestSpark.tempDir("graft_ps_")
    val store = new ParquetStore(spark, dir)
    store.merge("t", rows(1 to 20, "v1"), "pkey")
    (1 to 5).foreach(i => store.merge("t", Seq(("1", s"u$i")).toDF("pkey", "payload"), "pkey"))
    assert(store.read("t").collect().map(r => r.getString(0) -> r.getString(1))
      .toMap.apply("1") == "u5")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new Path(s"$dir/t")).map(_.getPath.getName)
      .filter(_.startsWith("v_")).map(_.stripPrefix("v_").toLong).toSet
    // v_0 still referenced by untouched buckets; intermediate
    // single-bucket versions (superseded and older than current-1)
    // must be gone
    assert(versions.contains(0L))
    assert(versions.contains(5L))
    assert(!versions.exists(v => v >= 1 && v <= 3),
      s"superseded snapshots not GC'd: $versions")
  }

  test("bucket count is persisted: reopening with a different nBuckets stays correct") {
    val root = TestSpark.tempDir("graft_ps_")
    val store16 = new ParquetStore(spark, root, nBuckets = 16)
    store16.merge("t", rows(1 to 100, "v1"), "pkey")
    // a session with a different constructor value must honor the
    // on-disk layout, not re-hash into phantom buckets
    val store32 = new ParquetStore(spark, root, nBuckets = 32)
    store32.merge("t", rows(50 to 120, "v2"), "pkey")
    val got = store32.read("t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == 120, "no duplicate or lost pkeys after bucket-count mismatch")
    assert(got("10") == "v1-10" && got("50") == "v2-50")
    store32.delete("t", Seq("60").toDF("pkey"), "pkey")
    assert(store32.read("t").count() == 119)
  }

  test("deleting every remaining key leaves the table nonexistent, not bricked") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_"))
    store.merge("t", rows(1 to 5, "v1"), "pkey")
    store.delete("t", rows(1 to 5, "v1").select("pkey"), "pkey")
    assert(!store.exists("t"), "empty table == nonexistent table")
    store.merge("t", rows(1 to 3, "v2"), "pkey")
    assert(store.read("t").count() == 3)
  }

  test("zero-row first merge leaves the table nonexistent, not bricked") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_"))
    store.merge("t", rows(1 to 0, "v1"), "pkey")
    assert(!store.exists("t"))
    // and a later real merge works normally
    store.merge("t", rows(1 to 5, "v1"), "pkey")
    assert(store.read("t").count() == 5)
  }

  test("legacy table (_CURRENT without _BUCKETS) stays readable and re-buckets on merge") {
    // simulate the pre-bucketing format: one flat snapshot at v_0 and
    // a _CURRENT pointer, no _BUCKETS file
    val root = TestSpark.tempDir("graft_ps_legacy_")
    rows(1 to 50, "old").write.parquet(s"$root/t/v_0")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$root/t/_CURRENT"), true)
    out.write("0".getBytes("UTF-8")); out.close()

    val store = new ParquetStore(spark, root)
    assert(store.exists("t"))
    assert(store.read("t").count() == 50) // not "no data for table"
    // the next merge re-buckets the legacy snapshot without losing rows
    store.merge("t", rows(40 to 60, "new"), "pkey")
    val got = store.read("t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == 60)
    assert(got("10") == "old-10" && got("40") == "new-40" && got("60") == "new-60")
  }

  test("null-key rows upsert (replace), never accumulate duplicates") {
    import org.apache.spark.sql.functions.lit
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_"))
    val withNull = rows(1 to 3, "v1")
      .union(Seq((null.asInstanceOf[String], "n-1")).toDF("pkey", "payload"))
    store.merge("t", withNull, "pkey")
    store.merge("t", Seq((null.asInstanceOf[String], "n-2")).toDF("pkey", "payload"), "pkey")
    val got = store.read("t").collect()
    assert(got.length == 4, "null key must replace, not append")
    assert(got.filter(_.isNullAt(0)).map(_.getString(1)).toSeq == Seq("n-2"))
    store.delete("t", Seq(null.asInstanceOf[String]).toDF("pkey"), "pkey")
    assert(store.read("t").filter(lit(true)).collect().forall(!_.isNullAt(0)))
  }

  test("idempotent replay: merging the same batch twice is a no-op") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_"))
    val batch = rows(1 to 30, "v1")
    store.merge("t", batch, "pkey")
    val before = store.read("t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    store.merge("t", batch, "pkey")
    val after = store.read("t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after == before)
  }

  test("_META sidecar: roundtrip, overwrite, survives merges, dies with drop") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_"))
    assert(store.getMeta("t").isEmpty, "no sidecar yet")
    store.putMeta("t", Map("minhash.bands" -> "16", "note" -> "a b c"))
    assert(store.getMeta("t") ==
      Map("minhash.bands" -> "16", "note" -> "a b c"),
      "values may contain spaces (first-space split)")
    store.merge("t", rows(1 to 5, "v1"), "pkey")
    store.merge("t", rows(3 to 8, "v2"), "pkey")
    assert(store.getMeta("t")("minhash.bands") == "16",
      "meta describes the table, not a snapshot — merges keep it")
    store.putMeta("t", Map("minhash.bands" -> "8"))
    assert(store.getMeta("t") == Map("minhash.bands" -> "8"),
      "putMeta replaces the whole property set atomically")
    intercept[IllegalArgumentException] {
      store.putMeta("t", Map("bad key" -> "x"))
    }
    intercept[IllegalArgumentException] {
      store.putMeta("t", Map("k" -> "line1\nline2"))
    }
    store.drop("t")
    assert(store.getMeta("t").isEmpty, "drop removes the sidecar")
  }

  test("sidecar-era table never serves the legacy _META over a plain " +
      "overwrite (ADVICE r16)") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_"))
    // legacy era: table-level _META describes the table
    store.overwrite("t", rows(1 to 5, "v1"))
    store.putMeta("t", Map("label" -> "legacy"))
    assert(store.getMeta("t") == Map("label" -> "legacy"))
    // versioned era begins: the sidecar wins AND the legacy file is
    // deleted (the era is permanent — see the GC pin below)
    store.overwriteWithMeta("t", rows(1 to 5, "v2"), Map("label" -> "snap2"))
    assert(store.getMeta("t") == Map("label" -> "snap2"))
    // a legacy putMeta on a sidecar-era table fails loudly instead of
    // writing a label nothing would serve (review r17)
    val e = intercept[IllegalStateException] {
      store.putMeta("t", Map("label" -> "sneaky"))
    }
    assert(e.getMessage.contains("overwriteWithMeta"))
    // a later PLAIN overwrite leaves the current version sidecar-less;
    // the superseded label must NOT come back (stale label over fresh
    // cells)
    store.overwrite("t", rows(1 to 5, "v3"))
    assert(store.getMeta("t").isEmpty,
      "sidecar-era table without a current sidecar is unknown provenance")
    val (df, props) = store.readSnapshotWithMeta("t")
    assert(props.isEmpty,
      "readSnapshotWithMeta must apply the same rule on its stable fallback")
    assert(df.count() == 5)
    // GC pin (review r17): one MORE commit ages the v2 sidecar out of
    // cleanOld's grace window, so era detection via surviving sidecars
    // alone would flip back to the legacy fallback — the stale label
    // must stay gone because overwriteWithMeta DELETED the legacy file
    store.overwrite("t", rows(1 to 5, "v4"))
    assert(store.getMeta("t").isEmpty,
      "a GC'd sidecar era must never resurrect the superseded legacy label")
  }

  test("legacy _META is PROMOTED to the pre-refresh version's sidecar, " +
      "so a crash before the pointer flip keeps the live pair (review r17)") {
    val root = TestSpark.tempDir("graft_ps_promo_")
    val store = new ParquetStore(spark, root)
    store.overwrite("t", rows(1 to 5, "v1")) // version 0
    store.putMeta("t", Map("label" -> "legacy"))
    store.overwriteWithMeta("t", rows(1 to 5, "v2"), Map("label" -> "snap2"))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the retire step must not DELETE a label the old snapshot still
    // needs: the legacy file is gone, but its content survives as the
    // pre-refresh version's EXACT sidecar — the state a crash between
    // the retire and the _CURRENT flip would leave behind pairs the
    // old data with the old label (a bare delete stripped a LIVE
    // snapshot's provenance and era-locked putMeta, unrecoverably)
    assert(!fs.exists(new Path(s"$root/t/_META")), "legacy file retired")
    assert(fs.exists(new Path(s"$root/t/_META_v0")),
      "legacy label must be promoted to the pre-refresh version's sidecar")
    // simulate the crash window: point _CURRENT back at version 0 (as
    // if the flip never happened) — the old (data, label) pair must
    // serve intact through the exact-version rule
    val out = fs.create(new Path(s"$root/t/_CURRENT"), true)
    out.write("0".getBytes("UTF-8")); out.close()
    assert(store.getMeta("t") == Map("label" -> "legacy"),
      "pre-flip crash must leave the live snapshot's provenance readable")
  }

  test("promote-then-crash era-lock recovers through an overwriteWithMeta " +
      "retry (ADVICE r17)") {
    // the one crash window ADVICE r17 flagged untested: legacy _META
    // promoted to _META_v<v0> (entering the sidecar era, so putMeta is
    // now locked) but the _CURRENT flip never happened — no sidecar-
    // committed refresh ever landed, yet the table is era-locked. The
    // documented recovery is a successful overwriteWithMeta retry;
    // this pins that the retry actually restores a serving
    // (data, meta) pair, so the recovery path stays guaranteed.
    val root = TestSpark.tempDir("graft_ps_lock_")
    val store = new ParquetStore(spark, root)
    store.overwrite("t", rows(1 to 5, "v1")) // version 0
    store.putMeta("t", Map("label" -> "legacy"))
    store.overwriteWithMeta("t", rows(1 to 5, "v2"), Map("label" -> "snap2"))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash: pointer back at v0, promoted sidecar + staged
    // v1 artifacts left behind (exactly what a crash between the retire
    // and the flip leaves)
    val out = fs.create(new Path(s"$root/t/_CURRENT"), true)
    out.write("0".getBytes("UTF-8")); out.close()
    // the lock is real: putMeta refuses (era permanence)
    intercept[IllegalStateException] {
      store.putMeta("t", Map("label" -> "poke"))
    }
    // ...but the retry path restores a fully-served pair
    store.overwriteWithMeta("t", rows(1 to 7, "v3"), Map("label" -> "snap3"))
    val (df, meta) = store.readSnapshotWithMeta("t")
    assert(meta == Map("label" -> "snap3"),
      "retry must commit its own label as the serving properties")
    assert(df.count() == 7, "retry must serve its own data")
    assert(store.getMeta("t") == Map("label" -> "snap3"))
  }

  test("a FAILED overwriteWithMeta leaves a legacy table out of the " +
      "sidecar era entirely (review r17, third pass)") {
    val store = new ParquetStore(spark, TestSpark.tempDir("graft_ps_fail_"))
    store.overwrite("t", rows(1 to 5, "v1"))
    store.putMeta("t", Map("label" -> "legacy"))
    // a refresh whose df THROWS during the data write must not have
    // promoted/deleted anything: the retire step runs after the write
    val boom = org.apache.spark.sql.functions.udf((x: Long) => {
      if (x >= 0) throw new RuntimeException("boom"); x
    })
    import org.apache.spark.sql.functions.col
    val bad = spark.range(3).select(boom(col("id")).as("k"), col("id").as("v"))
    intercept[Throwable] {
      store.overwriteWithMeta("t", bad, Map("label" -> "snap2"))
    }
    assert(store.getMeta("t") == Map("label" -> "legacy"),
      "failed refresh must leave the legacy label serving")
    // and crucially putMeta is NOT era-locked: no sidecar was written
    store.putMeta("t", Map("label" -> "legacy2"))
    assert(store.getMeta("t") == Map("label" -> "legacy2"))
    assert(store.read("t").count() == 5, "old snapshot still serves")
  }
}
