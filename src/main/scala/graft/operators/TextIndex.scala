package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted inverted-postings index for the lexical search leg — the
  * Spark analogue of the reference's GIN index on tsvector
  * (core/src/query.rs:222-252, `CREATE INDEX ... USING gin
  * (search_tokens)`), per SURVEY §4: "later: precomputed
  * inverted-postings table (explode + partition by lexeme)".
  *
  * Layout: one row per (lexeme, doc), partitioned by
  * `bucket = crc32(lexeme) % nBuckets` so a query reads ONLY the
  * bucket directories its (few) lexemes hash into — at 100 TB the
  * lexical probe scans |postings| · qBuckets / nBuckets, not the
  * whole corpus, and the per-doc lexeme count is denormalized into
  * the postings rows so ranking needs no join back to the documents.
  * crc32 is bit-identical between the Spark expression and
  * java.util.zip.CRC32, which is what lets the probe enumerate its
  * buckets driver-side (same trick as the LSH index's Hamming ring).
  *
  * Stopwords never enter the index (toTsvector filters them), which
  * is also the GIN story for why the worst skew (the/and/of) is
  * absent; residual hot lexemes spread across files within a bucket
  * and stay AQE-splittable because the probe is a plain scan+agg.
  */
object TextIndex {

  /** Driver-side twin of the Spark `crc32` expression. */
  private[graft] def bucketOf(lexeme: String, nBuckets: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(lexeme.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    c.getValue % nBuckets
  }

  /** Build and persist the postings index:
    * `path/postings` = (lexeme, id, n_lex, positions, npos)
    * partitioned by bucket, `path/meta` = nBuckets. One shuffle
    * (repartition by bucket) so each bucket directory holds whole
    * files. `positions` is the lexeme's clamped tsvector position
    * list and `npos` its length, denormalized into the postings so
    * exact OR cover-density rank (searchPostingsRankCd) AND phrase
    * probes (searchPostingsPhrase) need no second table — the GIN
    * analogue of tsvector storing its position lists.
    */
  def buildPostingsIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    val exploded = docs
      .select(col(idCol).as("id"), tsvectorPositions(col(textCol)).as("__pp"))
      .withColumn("n_lex", size(col("__pp")))
      .select(col("id"), col("n_lex"), explode(col("__pp")).as(Seq("lexeme", "positions")))
      .withColumn("npos", size(col("positions")))
      // dl = doc length in indexed tokens (Σ npos) — denormalized so
      // BM25's length normalization needs no join back to the docs
      .withColumn("dl",
        sum(col("npos")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"))))
    exploded
      .withColumn("bucket", crc32(col("lexeme")) % nBuckets)
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$path/postings")
    // corpus stats for BM25 idf / length norm (one build-time agg over
    // the per-doc lengths; docs with no lexemes never enter postings
    // and are consistently absent from N and avgdl)
    // exact long sum / count, NOT avg(): Spark's avg sums doubles in
    // partition order (nondeterministic last bits) where the oracle's
    // integer sum is exact — divide once on the driver instead
    val stats = spark.read.parquet(s"$path/postings")
      .select(col("id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
    // a corpus where no doc yields lexemes (all stopwords/empty) is
    // degenerate but valid: write n_docs=0, avg_dl=0 instead of
    // NPE-ing on the null sum / dividing by zero
    val nDocs = stats.getLong(0)
    val avgDl = if (nDocs == 0) 0.0 else stats.getLong(1).toDouble / nDocs
    import spark.implicits._
    Seq((nBuckets, nDocs, avgDl))
      .toDF("n_buckets", "n_docs", "avg_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Ranked lexical search over the postings index. Semantics are
    * IDENTICAL to the scan-based tsvector path (Queries.f2): match =
    * any query lexeme present, rank = the ts_rank_cd tf-proxy
    * matched/|qlex| · (1 + matched/|doc lexemes|), presentation order
    * on the ROUNDED rank. The plan is the index shape: scan only the
    * query lexemes' bucket partitions (PartitionFilters), push
    * `lexeme IN (...)` into the parquet scan, then one partial-agg
    * count per doc — no full-corpus array scan anywhere.
    */
  def searchPostings(spark: SparkSession, path: String,
      queryLexemes: Seq[String], k: Int): DataFrame = {
    // query lexemes are a SET (tsquery 'a | a' ≡ 'a'): dedup before
    // sizing qn, or a duplicated input lexeme would inflate the rank
    // denominator while the match count m (grouped over the index's
    // deduplicated postings) can never see the duplicate
    val qlex = queryLexemes.distinct
    require(qlex.nonEmpty, "empty query")
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    val buckets = qlex.map(bucketOf(_, nBuckets)).distinct
    val qn = qlex.size
    spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*)) // partition pruning
      .filter(col("lexeme").isin(qlex: _*)) // parquet-pushed
      .groupBy(col("id"), col("n_lex"))
      // postings hold DISTINCT lexemes per doc (toTsvector dedups), so
      // the group size IS the matched-lexeme count
      .agg(count(lit(1)).as("m"))
      .select(col("id").as("doc_id"),
        round((col("m").cast("double") / qn)
          * (lit(1.0) + col("m").cast("double") / col("n_lex")), 4).as("rank"))
      .orderBy(col("rank").desc, col("doc_id").asc)
      .limit(k)
  }

  /** EXACT `ts_rank_cd` lexical search over the postings index, for
    * the reference's OR-rewritten queries (core/src/query.rs:766-773).
    * With OR semantics every matched position is its own minimal
    * cover, so cover-density reduces to 0.1 · Σ npos over the matched
    * (doc, lexeme) postings (TextAnalyzer.rankCdOr) — the plan is the
    * same pruned probe as [[searchPostings]] (bucket partition
    * pruning + parquet-pushed lexeme IN + one partial agg), just
    * summing the denormalized position counts instead of counting
    * rows. `0.1 * sum` (one multiply, integer sum) keeps the double
    * bit-identical to the scan path and the DuckDB oracle.
    */
  def searchPostingsRankCd(spark: SparkSession, path: String,
      queryLexemes: Seq[String], k: Int): DataFrame = {
    val qlex = queryLexemes.distinct
    require(qlex.nonEmpty, "empty query")
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    val buckets = qlex.map(bucketOf(_, nBuckets)).distinct
    val postings = spark.read.parquet(s"$path/postings")
    require(postings.columns.contains("npos"),
      s"postings index at $path predates position counts (no npos column) — " +
        "rebuild it with buildPostingsIndex before exact-rank probing")
    postings
      .filter(col("bucket").isin(buckets: _*)) // partition pruning
      .filter(col("lexeme").isin(qlex: _*)) // parquet-pushed
      .groupBy(col("id"))
      .agg(sum(col("npos")).as("__tot"))
      .select(col("id").as("doc_id"),
        round(lit(0.1) * col("__tot"), 4).as("rank"))
      .orderBy(col("rank").desc, col("doc_id").asc)
      .limit(k)
  }

  /** BM25 ranked search over the postings index (Robertson/Spärck
    * Jones; the Lucene-style `ln(1 + (N-df+0.5)/(df+0.5))` idf) — the
    * modern ranking upgrade over ts_rank_cd, computable entirely from
    * what the index denormalizes: tf = npos, doc length = dl, df =
    * per-lexeme posting count within the pruned buckets, N/avgdl from
    * the build-time meta. Plan shape matches the other probes: bucket
    * partition pruning + pushed lexeme IN + one broadcast of the
    * |query|-row df table + one partial agg. Per-term scores are
    * summed as decimals so the total is addition-order-independent
    * (the DuckDB oracle replays the identical formula and sum).
    */
  def searchPostingsBm25(spark: SparkSession, path: String,
      queryLexemes: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qlex = queryLexemes.distinct
    require(qlex.nonEmpty, "empty query")
    // check the meta SCHEMA before dereferencing fields 1/2, so a
    // legacy index (meta = n_buckets only) hits this descriptive
    // message instead of an opaque positional out-of-bounds
    val metaDf = spark.read.parquet(s"$path/meta")
    require(metaDf.columns.contains("n_docs") && metaDf.columns.contains("avg_dl"),
      s"postings index at $path predates doc-length stats — rebuild it " +
        "with buildPostingsIndex before BM25 probing")
    val meta = metaDf.select(col("n_buckets"), col("n_docs"), col("avg_dl")).head()
    val nBuckets = meta.getInt(0)
    val nDocs = meta.getLong(1)
    val avgDl = meta.getDouble(2)
    val buckets = qlex.map(bucketOf(_, nBuckets)).distinct
    val postings = spark.read.parquet(s"$path/postings")
    require(postings.columns.contains("dl"),
      s"postings index at $path predates doc-length stats — rebuild it " +
        "with buildPostingsIndex before BM25 probing")
    val p = postings
      .filter(col("bucket").isin(buckets: _*)) // partition pruning
      .filter(col("lexeme").isin(qlex: _*)) // parquet-pushed
      .select(col("id"), col("lexeme"), col("npos"), col("dl"))
    val dfs = p.groupBy(col("lexeme")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = col("__idf") * (col("npos") * lit(k1 + 1.0)) /
      (col("npos") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgDl)))
    p.join(broadcast(dfs.withColumn("__idf", idf)), Seq("lexeme"))
      .withColumn("__t", termScore)
      .groupBy(col("id"))
      .agg(sum(col("__t").cast("decimal(28,12)")).as("__s"))
      .select(col("id").as("doc_id"),
        round(col("__s").cast("double"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Phrase probe (`@@ phraseto_tsquery`) over the postings index:
    * scan ONLY the phrase lexemes' bucket partitions, anchor on the
    * first term's positions, and require every term at anchor +
    * offset — the same walk TextAnalyzer.phraseMatch does per row,
    * but over |phrase| pruned posting rows per doc instead of the
    * whole corpus's token arrays. The anchor check is a per-doc
    * equi-join (id) + array_contains filter + distinct-term count, so
    * at 100 TB the cost is the phrase terms' posting lists, never a
    * table scan. Returns matching doc ids.
    */
  def searchPostingsPhrase(spark: SparkSession, path: String,
      phrase: Seq[(String, Int)]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    val lexemes = phrase.map(_._1).distinct
    val buckets = lexemes.map(bucketOf(_, nBuckets)).distinct
    val postings = spark.read.parquet(s"$path/postings")
    require(postings.columns.contains("positions"),
      s"postings index at $path predates position lists — rebuild it " +
        "with buildPostingsIndex before phrase probing")
    val p = postings
      .filter(col("bucket").isin(buckets: _*)) // partition pruning
      .filter(col("lexeme").isin(lexemes: _*)) // parquet-pushed
      .select(col("id"), col("lexeme"), col("positions"))
    val anchors = p.filter(col("lexeme") === phrase.head._1)
      .select(col("id"), explode(col("positions")).as("b"))
    // one row per (anchor, phrase term) that is satisfied; an anchor
    // wins when all |phrase| terms are (posting rows are unique per
    // (id, lexeme), and offsets within a duplicated lexeme differ)
    import spark.implicits._
    val terms = phrase.toDF("__lex", "__off")
    val satisfied = anchors.crossJoin(broadcast(terms))
      .join(p.select(col("id"), col("lexeme").as("__lex"), col("positions").as("__ps")),
        Seq("id", "__lex"))
      .filter(array_contains(col("__ps"), col("b") + col("__off")))
    satisfied.groupBy(col("id"), col("b"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") === phrase.size)
      .select(col("id").as("doc_id"))
      .distinct()
      .orderBy(col("doc_id"))
  }
}
