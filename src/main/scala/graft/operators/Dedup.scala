package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (project north-star additions beyond the reference's surface).
  *
  * Scale design: every variant is blocking-based — candidate pairs
  * are generated only within small buckets (hash groups, LSH bands,
  * SimHash bands), never via a full cross join, so the pair stage is
  * a shuffle on the bucket key followed by per-bucket local joins.
  * At 100 TB the bucket key is the shuffle dimension; skewed buckets
  * are AQE-splittable because all per-bucket work is a plain
  * equi-join.
  */
object Dedup {

  /** Exact dedup: group identical normalized text. Returns one row
    * per document with its canonical (minimum) id, so downstream can
    * `filter(col(id) =!= col("canonical_id"))` to drop duplicates.
    * Implemented as a window-min over the normalized-text hash — a
    * single hash-shuffle, the canonical map-side-combinable shape.
    */
  def exactCanonical(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val w = Window.partitionBy(col("__norm_hash"))
    docs
      .withColumn("__norm_hash", md5(norm))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .drop("__norm_hash")
  }

  /** MinHash+LSH near-dup candidates: shingle → k-perm MinHash
    * signature → band buckets → equi-join within buckets → verified
    * by exact shingle Jaccard (Broder 1997 / LSH banding as in
    * Mining of Massive Datasets ch.3).
    *
    * numHashes must be divisible by bands; rowsPerBand =
    * numHashes/bands. Returns (id_a, id_b, est_jaccard, jaccard)
    * pairs with jaccard >= threshold, id_a < id_b, deduplicated
    * across bands.
    */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val withSig = docs
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("shingles", array_distinct(shingles(col("text"), lit(shingleN))))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minHash(col("shingles"), lit(numHashes)))
    // band key = hash of the band's signature slice
    val banded = withSig.select(
      col("id"), col("shingles"), col("sig"),
      posexplode(sequence(lit(0), lit(bands - 1))).as(Seq("__p", "band")))
      .withColumn("band_key",
        hash(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))))
      .select("id", "shingles", "band", "band_key")
    val a = banded.select(col("band"), col("band_key"),
      col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("band_key"),
      col("id").as("id_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup: 64-bit signatures; pairs whose signatures
    * agree on at least one 16-bit band are candidates (standard
    * Charikar-style blocking); verified by Hamming distance <=
    * maxHamming.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSig = docs
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", simHash(col("text")))
    val bandKeys = array((0 until 4).map { bnd =>
      concat(lit(s"$bnd:"),
        shiftrightunsigned(col("sig"), bnd * 16).bitwiseAND(lit(0xFFFFL)))
    }: _*)
    val banded = withSig
      .withColumn("band_key", explode(bandKeys))
      .select("id", "sig", "band_key")
    val a = banded.select(col("band_key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_key"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDist64(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity pairs within a blocking column
    * (e.g. source, language, or an LSH bucket). Pure built-ins:
    * token n-grams via transform over index sequence, set ops via
    * array_intersect/union — everything stays in codegen.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 2, threshold: Double = 0.2): DataFrame = {
    val toks = filter_tokens(col(textCol))
    // documents shorter than n tokens produce no grams (matches the
    // oracle's bigram CTE exactly)
    val grams =
      if (n == 1) array_distinct(toks)
      else when(size(toks) >= n,
        array_distinct(
          transform(sequence(lit(0), size(toks) - n),
            i => array_join(slice(toks, i + 1, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))
    val prepped = docs.select(
      col(blockCol).as("block"), col(idCol).as("id"), grams.as("grams"))
      .filter(size(col("grams")) > 0)
    val a = prepped.select(col("block"), col("id").as("id_a"), col("grams").as("g_a"))
    val b = prepped.select(col("block"), col("id").as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select("block", "id_a", "id_b", "jaccard")
  }

  /** Tokenize to lowercase alphanumeric runs (matches
    * TextAnalyzer.tokenize) with built-ins only.
    */
  private def filter_tokens(text: org.apache.spark.sql.Column) =
    filter(split(lower(coalesce(text, lit(""))), "[^a-z0-9]+"), t => t =!= "")

  /** Embedding-cosine near-dup pairs within a blocking column (label,
    * IVF cell, or LSH bucket at scale). Cosine computed in double via
    * codegen'd higher-order functions.
    */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double = 0.95): DataFrame = {
    val prepped = emb.select(
      col(blockCol).as("block"), col(idCol).as("id"), col(vecCol).as("vec"))
    val a = prepped.select(col("block"), col("id").as("id_a"), col("vec").as("v_a"))
    val b = prepped.select(col("block"), col("id").as("id_b"), col("vec").as("v_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("block", "id_a", "id_b", "cos")
  }
}
