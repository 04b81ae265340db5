package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the sampling/packing manifests that the
  * DuckDB hash oracles can't express as readably: temperature
  * flattening's rate monotonicity, representative-selection argmax
  * semantics, and pack_offsets ≡ pack_sequences aggregation.
  */
class MixPackSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("mix_temperature: synthetic corpus keeps exactly the expected id set") {
    // a controlled corpus where the expected kept set is computable
    // independently in plain Scala: three sources with skewed sizes,
    // one-token-per-word texts
    import spark.implicits._
    val tmp = TestSpark.tempDir("mixtemp")
    val rows = (0L until 300L).map { id =>
      val src = if (id < 220) "web" else if (id < 280) "books" else "wiki"
      (id, src, Seq.fill(5)("tok").mkString(" "), "en")
    }
    rows.toDF("doc_id", "source", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // independent reimplementation of the contract (the oracle's math)
    val nTok = rows.groupBy(_._2).view.mapValues(_.size * 5L).toMap
    val sW = nTok.view.mapValues(n => math.floor(math.sqrt(n.toDouble) * 1000).toLong).toMap
    val sTot = sW.values.sum
    val thresh = nTok.map { case (src, n) =>
      src -> math.floor(math.min(1.0,
        (Queries.mixTempBudget.toDouble * sW(src)) /
          (sTot.toDouble * n.toDouble)) * 10000).toLong
    }
    val expected = rows.collect {
      case (id, src, _, _) if (id % 100003L) * 2654435761L % 10000L < thresh(src) => id
    }.toSet
    // temperature property on the thresholds themselves (deterministic,
    // no sampling noise): smaller source ⇒ keep rate at least as high
    assert(thresh("wiki") >= thresh("books") && thresh("books") >= thresh("web"),
      s"thresholds not monotone in source size: $thresh")

    val got = Queries.all("mix_temperature")(spark, tmp)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected,
      s"kept set diverged: missing=${expected -- got} extra=${got -- expected}")
  }

  test("dedup_cluster_best: one representative per cluster, argmax by (quality, -id)") {
    val out = Queries.all("dedup_cluster_best")(spark, dir)
      .collect()
    assert(out.nonEmpty, "test corpus must contain near-dup clusters")
    // per-doc quality recomputed OUTSIDE the query's plan (same
    // production scorer — this pin checks the argmax/tie-break wiring;
    // the scorer itself is independently guarded by the DuckDB
    // oracle's qualitySql replay)
    val quality = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("q"))
      .toMap
    val byCluster = out.groupBy(_.getAs[Long]("canonical_id"))
    byCluster.foreach { case (cid, rows) =>
      val reps = rows.filter(_.getAs[Boolean]("is_rep"))
      assert(reps.length == 1,
        s"cluster $cid has ${reps.length} representatives")
      val rep = reps.head
      val repQ = rep.getAs[Double]("rep_quality")
      rows.foreach { r =>
        assert(r.getAs[Long]("rep_id") == rep.getAs[Long]("doc_id"),
          s"cluster $cid members disagree on rep_id")
        assert(r.getAs[Double]("rep_quality") == repQ,
          s"cluster $cid members disagree on rep_quality")
      }
      // the rep is the member maximizing quality, ties to min doc_id
      val expected = rows.map(r => r.getAs[Long]("doc_id"))
        .minBy(id => (-quality(id), id))
      assert(rep.getAs[Long]("doc_id") == expected,
        s"cluster $cid picked ${rep.getAs[Long]("doc_id")}, " +
          s"argmax says $expected")
      assert(repQ == quality(expected),
        s"cluster $cid rep_quality $repQ != member quality ${quality(expected)}")
    }
  }

  test("dedup_cluster_best: membership and sizes agree with dedup_clusters") {
    val best = Queries.all("dedup_cluster_best")(spark, dir)
      .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val clusters = Queries.all("dedup_clusters")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("canonical_id"), r.getAs[Long]("cluster_size"))).toSet
    assert(best == clusters,
      "cluster-best must partition the corpus exactly as dedup_clusters")
  }

  test("pack_offsets aggregates exactly to pack_sequences") {
    val offsets = Queries.all("pack_offsets")(spark, dir)
    val rolled = offsets.groupBy(col("lang"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("lang"), col("shard"), col("bin"))
      .collect().toSeq
    val bins = Queries.all("pack_sequences")(spark, dir).collect().toSeq
    assert(rolled.map(_.toSeq) == bins.map(_.toSeq),
      s"pack_offsets rollup diverged from pack_sequences")
  }

  test("pack_efficiency aggregates exactly to pack_sequences; fill vs budget") {
    val bins = Queries.all("pack_sequences")(spark, dir).collect().toSeq
    val expected = bins.groupBy(r =>
        (r.getAs[String]("lang"), r.getAs[Int]("shard")))
      .map { case ((lang, shard), rows) =>
        val nBins = rows.size.toLong
        val nToks = rows.map(_.getAs[Long]("n_tokens")).sum
        (lang, shard) -> (nBins, rows.map(_.getAs[Long]("n_docs")).sum, nToks,
          BigDecimal(nToks.toDouble / (nBins * Queries.packBudget).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = Queries.all("pack_efficiency")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("shard")) ->
        (r.getAs[Long]("n_bins"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"), r.getAs[Double]("fill_rate"))).toMap
    assert(got == expected,
      s"pack_efficiency diverged from the pack_sequences rollup")
    // every non-final bin of a stream holds >= budget-worth of starts:
    // fill_rate is meaningful (bounded below by (n_bins-1)/n_bins
    // would need doc-level data; assert the cheap invariant instead)
    got.values.foreach { case (nBins, _, nToks, fill) =>
      assert(fill > 0.0 && nToks > 0L && nBins > 0L)
    }
  }

  test("quality_percentile: cume_dist semantics per language") {
    val rows = Queries.all("quality_percentile")(spark, dir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, members) =>
      val n = members.length.toDouble
      members.foreach { r =>
        val q = r.getAs[Double]("quality")
        val below = members.count(_.getAs[Double]("quality") <= q)
        val expected = BigDecimal(below / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("pct") == expected,
          s"$lang doc ${r.getAs[Long]("doc_id")}: pct ${r.getAs[Double]("pct")} != brute cume_dist $expected")
      }
      val top = members.map(_.getAs[Double]("pct")).max
      assert(top == 1.0, s"$lang: max pct must be 1.0, got $top")
    }
  }

  test("pii_report aggregates exactly to text_pii_scrub per source") {
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Queries.all("text_pii_scrub")(spark, dir).collect()
      .groupBy(r => src(r.getAs[Long]("doc_id")))
      .map { case (s, rows) =>
        val ne = rows.map(_.getAs[Int]("n_emails").toLong)
        val np = rows.map(_.getAs[Int]("n_phones").toLong)
        val hits = rows.count(r => r.getAs[Int]("n_emails") > 0 ||
          r.getAs[Int]("n_phones") > 0).toLong
        s -> (rows.length.toLong, ne.count(_ > 0).toLong, ne.sum,
          np.count(_ > 0).toLong, np.sum, hits,
          BigDecimal(hits.toDouble / rows.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = Queries.all("pii_report")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("docs_with_email"),
          r.getAs[Long]("n_emails"), r.getAs[Long]("docs_with_phone"),
          r.getAs[Long]("n_phones"), r.getAs[Long]("docs_with_pii"),
          r.getAs[Double]("pii_doc_rate"))).toMap
    assert(got == expected, "pii_report diverged from the per-doc scrub")
  }

  test("token_fertility aggregates exactly to f9_token_bpe per language") {
    val lang = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Queries.all("f9_token_bpe")(spark, dir).collect()
      .groupBy(r => lang(r.getAs[Long]("doc_id")))
      .map { case (l, rows) =>
        val ws = rows.map(_.getAs[Int]("ws_tokens").toLong).sum
        val bpe = rows.map(_.getAs[Int]("bpe_tokens").toLong).sum
        l -> (rows.length.toLong, ws, bpe,
          BigDecimal(bpe.toDouble / math.max(ws, 1L).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = Queries.all("token_fertility")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("ws_tokens"),
          r.getAs[Long]("bpe_tokens"), r.getAs[Double]("fertility"))).toMap
    assert(got == expected, "token_fertility diverged from f9_token_bpe")
    // no floor assertion: a whitespace-only doc counts ws=1/bpe=0
    // (the f9 split-of-trimmed-empty semantic), so a stratum of such
    // docs legitimately reads fertility 0 — the equality pin above is
    // the real check
  }

  test("sample_percentile keeps exactly quality_percentile's pct >= gate set") {
    val all = Queries.all("quality_percentile")(spark, dir).collect()
    val expected = all.filter(_.getAs[Double]("pct") >= Queries.percentileGate)
      .map(_.getAs[Long]("doc_id")).toSet
    val got = Queries.all("sample_percentile")(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected, "percentile gate diverged from the percentile frame")
    assert(got.nonEmpty && got.size < all.length,
      "gate must keep a strict, nonempty subset at the 0.8 knob")
  }

  test("export_curriculum: dense per-shard seq, pct non-decreasing, same membership as export_order") {
    val cur = Queries.all("export_curriculum")(spark, dir).collect()
    val byShard = cur.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("seq"))
      assert(sorted.map(_.getAs[Int]("seq")).toSeq == sorted.indices.toSeq,
        s"shard $shard: seq not dense from 0")
      val pcts = sorted.map(_.getAs[Double]("pct"))
      assert(pcts.zip(pcts.tail).forall { case (a, b) => a <= b },
        s"shard $shard: pct must be non-decreasing along seq (best data last)")
    }
    // same md5 shard membership as the plain epoch order — BOTH
    // directions: the size check catches a curriculum that silently
    // DROPS documents (e.g. a non-null-safe percentile join), which
    // the per-row containment alone would pass vacuously
    val plain = Queries.all("export_order")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(cur.length == plain.size,
      s"curriculum lost documents: ${cur.length} vs ${plain.size}")
    cur.foreach { r =>
      assert(plain(r.getAs[Long]("doc_id")) == r.getAs[Long]("shard"),
        "curriculum must not move documents between shards")
    }
  }

  test("pipeline_curriculum: ladder-survivor membership, dense seq, survivor-calibrated pct") {
    // the sf0.01 fixtures plant the ladder's drops; sf0.001 has no
    // planted leakage, so the composed terminal is checked at 0.01
    val pdir = "/root/testdata/sf0.01"
    val cur = Queries.all("pipeline_curriculum")(spark, pdir).collect()
    // membership ≡ the CLEANED corpus: exactly the docs the terminal
    // packing places (pipeline_pack_offsets is the per-doc view of
    // pipeline_pack's survivor set)
    val packed = Queries.all("pipeline_pack_offsets")(spark, pdir)
      .select("doc_id").collect().map(_.getAs[Long]("doc_id")).toSet
    val curIds = cur.map(_.getAs[Long]("doc_id")).toSet
    assert(curIds == packed,
      s"curriculum membership must equal the terminal packing's survivor " +
        s"set: ${curIds.size} vs ${packed.size}")
    // dense per-shard seq + anneal order (best data last), like
    // export_curriculum
    cur.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("seq"))
      assert(sorted.map(_.getAs[Int]("seq")).toSeq == sorted.indices.toSeq,
        s"shard $shard: seq not dense from 0")
      val pcts = sorted.map(_.getAs[Double]("pct"))
      assert(pcts.zip(pcts.tail).forall { case (a, b) => a <= b },
        s"shard $shard: pct must be non-decreasing along seq")
    }
    // the pct is calibrated on the SURVIVORS, not the raw corpus: the
    // maximum percentile of EVERY language must be exactly 1.0 (each
    // language's best surviving doc IS its language's top), which a
    // raw-corpus CDF would violate for any language whose best raw doc
    // was dropped by the ladder — per-language, because a global max
    // would pass as long as ONE language happened to calibrate right
    val langOf = spark.read.parquet(s"$pdir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("lang")).getOrElse("∅")).toMap
    cur.groupBy(r => langOf(r.getAs[Long]("doc_id")))
      .foreach { case (lang, rows) =>
        val top = rows.map(_.getAs[Double]("pct")).max
        assert(top == 1.0,
          s"survivor CDF for lang $lang must top out at exactly 1.0, got $top")
      }
  }

  test("ingest_audit_gated: monotone funnel, percentile stage prunes between blocklist and decontam") {
    val pdir = "/root/testdata/sf0.01"
    val a = Queries.all("ingest_audit_gated")(spark, pdir).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_docs"))).toMap
    val order = Seq("0_batch", "1_exact_dedup", "2_blocklist",
      "2p_percentile", "3_decontam", "3s_semantic", "4_near_dedup")
    assert(a.keySet == order.toSet, s"stage set mismatch: ${a.keySet}")
    // each stage's survivors are a subset of the previous stage's —
    // counts must be non-increasing along the pipeline order
    order.sliding(2).foreach { case Seq(x, y) =>
      assert(a(y) <= a(x), s"funnel not monotone at $x -> $y: $a")
    }
    // the fixture plants work for the gate AND the stages after it
    assert(a("2p_percentile") < a("2_blocklist"),
      s"percentile gate must prune at sf0.01: $a")
    assert(a("4_near_dedup") > 0, s"survivors must be nonempty: $a")
    // gated funnel agrees with the ungated ladder through the shared
    // prefix (batch, exact, blocklist are gate-independent)
    val ladder = Queries.all("ingest_audit_ladder")(spark, pdir).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_docs"))).toMap
    Seq("0_batch", "1_exact_dedup", "2_blocklist").foreach { s =>
      assert(a(s) == ladder(s), s"shared prefix diverged at $s: $a vs $ladder")
    }
  }

  test("dedup_source_matrix: equals the brute-force doc-pair count") {
    // independent plain-Scala oracle over the small corpus: the same
    // normalization as Dedup.normHash (lower, trim, collapse ws),
    // then literal enumeration of all duplicate doc pairs by source
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getAs[String]("source"),
        // SQL trim strips SPACES only (Java .trim would also strip
        // \n/\t and diverge from normHash on whitespace-padded docs)
        Option(r.getAs[String]("text")).getOrElse("")
          .replaceAll("\\A +| +\\z", "")
          .toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")))
    val brute = docs.groupBy(_._2).values.flatMap { group =>
      for {
        i <- group.indices; j <- (i + 1) until group.length
        pair = if (group(i)._1 <= group(j)._1) (group(i)._1, group(j)._1)
               else (group(j)._1, group(i)._1)
      } yield pair
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Queries.all("dedup_source_matrix")(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("n_dup_pairs")).toMap
    assert(got == brute,
      s"matrix diverged from brute force: got=$got brute=$brute")
  }

  test("eval_split_leakage: matrix equals a driver-side replay over the " +
      "stored pair sweep (independent md5 path)") {
    // label each near-dup pair with java.security MessageDigest — an
    // md5 implementation independent of both Spark's and DuckDB's —
    // and rebuild the matrix in plain Scala
    val pdir = "/root/testdata/sf0.01" // sf0.001 has too few pairs
    def splitOf(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id${Queries.splitSalt}".getBytes("UTF-8"))
      val h = d.take(2).map("%02x".format(_)).mkString
      if (h < Queries.splitTrainMax) "train"
      else if (h < Queries.splitValMax) "val" else "test"
    }
    val pairs = Queries.all("dedup_minhash_lsh_stored")(spark, pdir)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard")))
    assert(pairs.nonEmpty, "fixture must yield near-dup pairs")
    val expect = pairs
      .map { case (a, b, j) =>
        val (sa, sb) = (splitOf(a), splitOf(b))
        (if (sa <= sb) (sa, sb) else (sb, sa), j)
      }
      .filter { case ((sa, sb), _) => sa != sb }
      .groupBy(_._1)
      .map { case (k, v) => (k._1, k._2, v.size.toLong, v.map(_._2).max) }
      .toSet
    assert(expect.nonEmpty, "fixture must leak across at least one boundary")
    val df = Queries.all("eval_split_leakage")(spark, pdir)
    val got = df.collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b"),
        r.getAs[Long]("n_leak_pairs"), r.getAs[Double]("max_jaccard")))
      .toSet
    assert(got == expect, s"leakage matrix mismatch: $got vs $expect")
    // split labels are per-row arithmetic on the pair's own ids: the
    // matrix must come entirely off the signature index — no corpus
    // text scan, no join back to the documents table
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"leakage matrix must not scan the documents table:\n$plan")
  }

  test("pack_offsets: positions dense from 0, offsets are the doc-length prefix sum") {
    val rows = Queries.all("pack_offsets")(spark, dir)
      .collect()
      .groupBy(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"),
        r.getAs[Long]("bin")))
    rows.foreach { case (key, members) =>
      val sorted = members.sortBy(_.getAs[Int]("pos"))
      assert(sorted.map(_.getAs[Int]("pos")).toSeq ==
        sorted.indices.toSeq, s"bin $key positions not dense")
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("tok_offset") == cum,
          s"bin $key offset mismatch at pos ${r.getAs[Int]("pos")}")
        cum += r.getAs[Long]("n_toks")
      }
    }
  }
}
