package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw-corpus document by how much it
  * resembles a (small) target corpus under hashed-n-gram bag-of-words
  * language models, then sample proportionally via Gumbel top-k.
  * This is the canonical "make 100 TB of web text look like
  * Wikipedia" selection operator a pretraining pipeline runs between
  * dedup and mixing.
  *
  * Model: each distinct per-doc n-gram (the project-standard
  * [[Dedup.ngramSet]] binary-feature variant of the paper's counts)
  * hashes to one of 16^bucketHexLen buckets by md5-prefix — a string
  * bucket key, chosen over integer arithmetic so the DuckDB oracle
  * replays it verbatim with substr(md5(g),…). Bucket unigram models
  * with Laplace smoothing over target (p) and raw (q) give each
  * bucket a log-likelihood ratio ln p_b − ln q_b; a document's
  * importance log-weight is the sum over its grams' buckets.
  *
  * 100 TB posture: the per-bucket ratio table is ≤16^bucketHexLen
  * rows (4096 at the default) regardless of corpus size — always a
  * broadcast — so scoring is: explode grams (map-side), broadcast
  * probe, one map-side-combinable groupBy(doc). The two model fits
  * are B-keyed count aggregations (map-side combine, tiny shuffle);
  * the one-row totals ride broadcast cross joins, the repo's BM25
  * pattern. Nothing grows with corpus size except the two linear
  * gram scans.
  */
object Dsir {

  /** Per-document importance log-weights for `raw` against `target`.
    * Returns (id, logw); documents with no n-grams (shorter than n
    * tokens) produce no row — they carry no evidence either way.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, n: Int = 2, bucketHexLen: Int = 3,
      alpha: Double = 1.0): DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 8,
      s"bucketHexLen must be in [1, 8], got $bucketHexLen")
    val nBuckets = math.pow(16.0, bucketHexLen) // exact for hexLen <= 8
    def grams(df: DataFrame) = df.select(
      col(idCol).as("id"),
      explode(Dedup.ngramSet(col(textCol), n)).as("g"))
      .withColumn("b", substring(md5(col("g")), 1, bucketHexLen))
    val tGrams = grams(target)
    val rGrams = grams(raw)
    val tCounts = tGrams.groupBy("b").agg(count(lit(1)).as("ct"))
    val rCounts = rGrams.groupBy("b").agg(count(lit(1)).as("cr"))
    val tTotal = tCounts.agg(sum("ct").as("tt"))
    val rTotal = rCounts.agg(sum("cr").as("rt"))
    // full outer: a bucket seen only on one side still needs its
    // smoothed ratio (every RAW gram's bucket is present via rCounts,
    // so the probe join below can stay inner)
    val ratio = tCounts.join(rCounts, Seq("b"), "full_outer")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(tTotal)).crossJoin(broadcast(rTotal))
      .select(col("b"),
        (log(col("ct") + lit(alpha)) - log(col("tt") + lit(alpha * nBuckets))
          - log(col("cr") + lit(alpha)) + log(col("rt") + lit(alpha * nBuckets)))
          .as("llr"))
    rGrams.join(broadcast(ratio), Seq("b"))
      .groupBy("id").agg(sum("llr").as("logw"))
  }

  /** Gumbel top-k resampling over [[importanceWeights]]: sampling k
    * documents WITHOUT replacement with probability proportional to
    * exp(logw) is exactly taking the top k by logw + Gumbel noise
    * (the Gumbel-max trick). The uniform driving the noise is the
    * repo's pure-integer hash of the id (the mix_sample construction)
    * so the draw is deterministic, replayable in plain SQL, and
    * stable under corpus growth: a document's key never changes, so
    * re-runs and incremental extensions agree on the overlap.
    *
    * `id` must be numeric and non-null: a null id makes the key NULL,
    * which silently excludes the row from any top-k over it.
    * DataFrame-level callers should guard with
    * [[Guards.requireNumericIds]] (the bounded try_cast probe) before
    * materializing a sample.
    */
  def gumbelKey(logw: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val u = ((id % 100003L) * 2654435761L % 10000L + lit(0.5)) / lit(10000.0)
    logw - log(-log(u))
  }
}
