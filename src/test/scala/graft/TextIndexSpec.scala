package graft

import graft.operators.TextIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Inverted-postings lexical index (the GIN analogue): result parity
  * with the scan-based tsvector path, partition pruning on the
  * lexeme-hash buckets, and the driver/executor crc32 agreement the
  * probe depends on.
  */
class TextIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("driver bucketOf matches the Spark crc32 expression for every lexeme") {
    import spark.implicits._
    val lexemes = Seq("stream", "merg", "join", "0", "zzz", "a b", "héllo")
    val sparkSide = lexemes.toDF("lexeme")
      .select(col("lexeme"), (crc32(col("lexeme")) % 64).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    lexemes.foreach { l =>
      assert(TextIndex.bucketOf(l, 64) == sparkSide(l),
        s"bucket mismatch for '$l'")
    }
  }

  test("bm25Leg over the token store scores exactly like the postings index") {
    val path = TestSpark.tempDir("graft_postings_bm25leg_")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    TextIndex.buildPostingsIndex(docs, "doc_id", "text", path)
    val indexed = TextIndex.searchPostingsBm25(spark, path,
        graft.functions.TextAnalyzer.queryLexemes(Queries.f2QueryText), k = 1000)
      .collect().map(r => r.getAs[Long]("doc_id").toString -> r.getAs[Double]("score")).toMap
    // same docs as a hybrid-search token store: aligned lexeme/count arrays
    val tc = graft.functions.GraftFunctions.tsvectorWithCounts(col("text"))
    val tokens = docs.select(col("doc_id").cast("string").as("pkey"),
      tc.getField("_1").as("search_tokens"), tc.getField("_2").as("search_token_counts"))
    val leg = graft.operators.Search.bm25Leg(tokens, Queries.f2QueryText, windowSize = 1000)
      .collect().map(r => r.getAs[String]("pkey") -> r.getAs[Double]("fts_score")).toMap
    assert(leg.nonEmpty && leg.keySet == indexed.keySet,
      s"match sets diverged: leg=${leg.size} index=${indexed.size}")
    leg.foreach { case (id, s) =>
      val want = indexed(id)
      assert(math.abs(BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble - want) == 0.0,
        s"doc $id: leg=$s index=$want")
    }
  }

  test("bm25Leg degrades legacy rows (null counts) and empty corpora safely") {
    import spark.implicits._
    val tokens = Seq(
      ("a", Seq("merg", "stream"), Some(Seq(3, 2))),
      ("b", Seq("merg", "stream"), None), // legacy widened row
      ("c", Seq.empty[String], None)      // no lexemes: out of N/avgdl
    ).toDF("pkey", "search_tokens", "search_token_counts")
    val got = graft.operators.Search.bm25Leg(tokens, "merging streams", 10)
      .collect().map(r => r.getAs[String]("pkey") -> r.getAs[Int]("fts_rank")).toMap
    assert(got == Map("a" -> 1, "b" -> 2),
      "counted row must outrank the count-1 legacy row; empty row absent")
    val empty = graft.operators.Search.bm25Leg(
      tokens.filter(col("pkey") === "c"), "merging streams", 10)
    assert(empty.columns.toSeq == Seq("pkey", "fts_score", "fts_rank"))
    assert(empty.count() == 0)
  }

  test("postings search returns exactly the scan-based f2 ranking") {
    val path = TestSpark.tempDir("graft_postings_spec_")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    TextIndex.buildPostingsIndex(docs, "doc_id", "text", path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("rank"))).toSeq
    val indexed = rows(TextIndex.searchPostings(spark, path,
      graft.functions.TextAnalyzer.queryLexemes(Queries.f2QueryText), k = 50))
    val scanned = rows(Queries.f2TsvectorRank(spark, dir))
    assert(indexed == scanned,
      s"postings ranking diverged from the tsvector scan path")
    assert(indexed.nonEmpty)
  }

  test("exact rank_cd postings search returns exactly the scan-based f4 ranking") {
    val path = TestSpark.tempDir("graft_postings_cd_spec_")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    TextIndex.buildPostingsIndex(docs, "doc_id", "text", path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("rank"))).toSeq
    val indexed = rows(TextIndex.searchPostingsRankCd(spark, path,
      graft.functions.TextAnalyzer.queryLexemes(Queries.f2QueryText), k = 50))
    val scanned = rows(Queries.f4RankCd(spark, dir))
    assert(indexed == scanned,
      "exact-rank postings probe diverged from the tsRankCd scan path")
    assert(indexed.nonEmpty)
    // exact cover-density must differ from the tf-proxy somewhere on a
    // real corpus (otherwise the new path isn't actually live)
    val proxy = rows(TextIndex.searchPostings(spark, path,
      graft.functions.TextAnalyzer.queryLexemes(Queries.f2QueryText), k = 50))
    assert(proxy.map(_._2) != indexed.map(_._2),
      "rank_cd values should not coincide with the tf-proxy ranks")
  }

  test("phrase probe over the index equals the scan-based phrase match") {
    val path = TestSpark.tempDir("graft_postings_ph_spec_")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    TextIndex.buildPostingsIndex(docs, "doc_id", "text", path)
    val indexed = TextIndex.searchPostingsPhrase(spark, path, Queries.phraseTerms)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val scanned = Queries.f5PhraseMatch(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(indexed == scanned, "indexed phrase probe diverged from the scan")
    assert(indexed.nonEmpty)
    // and it's a strict subset of the OR match on the SAME lexemes
    // (adjacency required)
    val orMatch = docs.filter(graft.functions.GraftFunctions.tsMatches(
        graft.functions.GraftFunctions.toTsvector(col("text")),
        lit(Queries.phraseTerms.map(_._1).toArray)))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(indexed.toSet.subsetOf(orMatch) && indexed.size < orMatch.size)
    // the probe stays bucket-pruned like the rank probes
    val plan = TextIndex.searchPostingsPhrase(spark, path, Queries.phraseTerms)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"phrase probe must push a bucket partition filter, plan was:\n$plan")
  }

  test("probe scans only the query lexemes' bucket partitions") {
    val path = TestSpark.tempDir("graft_postings_spec2_")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    TextIndex.buildPostingsIndex(docs, "doc_id", "text", path, nBuckets = 64)
    val qlex = graft.functions.TextAnalyzer.queryLexemes(Queries.f2QueryText)
    val probe = TextIndex.searchPostings(spark, path, qlex, k = 50)
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"probe must push a bucket filter into PartitionFilters, plan was:\n$plan")
    // the lexeme filter reaches the parquet scan (row-group pruning)
    assert("PushedFilters: \\[[^\\]]*lexeme".r.findFirstIn(plan).isDefined,
      s"lexeme IN must be pushed to the scan, plan was:\n$plan")
    probe.collect()
    // the groupBy makes this an adaptive plan: unwrap AQE nodes to
    // reach the actual file scan
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScan(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Some(s)
      case other => other.children.iterator.map(findScan).collectFirst {
        case Some(s) => s
      }
    }
    val scan = findScan(probe.queryExecution.executedPlan)
    val filesRead = scan.flatMap(_.metrics.get("numFiles")).map(_.value)
    val qBuckets = qlex.map(TextIndex.bucketOf(_, 64)).distinct.size
    assert(filesRead.exists(_ <= qBuckets),
      s"expected at most $qBuckets bucket files read, got $filesRead")
  }

  test("empty query rejected; single-lexeme query works") {
    val path = TestSpark.tempDir("graft_postings_spec3_")
    import spark.implicits._
    TextIndex.buildPostingsIndex(
      Seq((1L, "streams merge quickly"), (2L, "gardens bloom slowly"))
        .toDF("doc_id", "text"), "doc_id", "text", path, nBuckets = 8)
    intercept[IllegalArgumentException] {
      TextIndex.searchPostings(spark, path, Nil, k = 5)
    }
    val got = TextIndex.searchPostings(spark, path,
      graft.functions.TextAnalyzer.queryLexemes("merging"), k = 5).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
  }
}
