package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Training-export sharding (north-star addition): the terminal
  * fan-out of a cleaned corpus into N training shards, the step after
  * packing where tokenizer/loader workers each consume one shard
  * directory.
  *
  * Scale design: the shard id is a DETERMINISTIC md5 bucket of the
  * document key — engine-agnostic (replays bit-identically in DuckDB,
  * unlike Spark's Murmur `hash()`), independent of partitioning, row
  * order, and session — so a re-export of the same corpus lands every
  * document in the same shard (resumable exports, diffable
  * manifests), and shards are decorrelated from id assignment order
  * (a `pmod(id, n)` would stripe time-ordered crawls across shards
  * systematically). Writing is ONE shuffle on the shard key; the
  * manifest is one narrow scan + an N-row map-side-combinable
  * aggregate. Shard token balance is statistical (law of large
  * numbers over ~N_docs/N per shard); the manifest's ratio column is
  * the ops signal that a shard count was set too high for a small
  * corpus.
  */
object Export {

  /** Deterministic shard id in [0, nShards): first 8 md5 hex chars of
    * the stringified key, as an unsigned 32-bit value, mod nShards.
    * DuckDB replay: `CAST(('0x' || substr(md5(CAST(k AS VARCHAR)),1,8))
    * AS BIGINT) % n`.
    */
  def shardId(key: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong))
  }

  /** Per-shard export manifest: (shard, n_docs, n_tokens) for every
    * shard 0..nShards-1 — empty shards surface as zero rows rather
    * than vanishing (a loader that expects N directories must see N
    * manifest rows). `tokens` is the caller's token expression over a
    * document row (tokenization-agnostic: whitespace, BPE, or the
    * corpus-standard lowercase-alnum tokens).
    */
  def shardManifest(docs: DataFrame, idCol: String, tokens: Column,
      nShards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs
      .select(shardId(col(idCol), nShards).as("shard"), tokens.as("__toks"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("n_tokens"))
    (0L until nShards.toLong).toDF("shard")
      .join(counted, Seq("shard"), "left")
      .select(col("shard"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** Deterministic training ORDER within each shard — the
    * reproducible global shuffle a training loader needs: documents
    * are permuted by an md5 sort key over (seed, id), so (a) the
    * order decorrelates from id assignment (crawl-time order would
    * otherwise leak curriculum into training), (b) a re-export
    * replays the IDENTICAL order — a loader restarting at
    * (shard, seq) resumes on the same document — and (c) changing the
    * seed reshuffles every epoch deterministically. Returns one row
    * per doc: (shard, `idCol`, sort_key, seq) with seq dense from 0
    * per shard.
    *
    * Scale shape: the sort key and shard id compute at the scan; the
    * only shuffle is the per-shard row_number window, partitioned by
    * the md5-bucket shard so no key exceeds ~N_docs/nShards rows.
    * Like [[shardId]], the key is md5, not Spark's Murmur `hash()` —
    * engine-agnostic, so the DuckDB oracle replays the permutation
    * bit-for-bit.
    */
  /** The deterministic per-epoch permutation key shared by
    * [[shardOrder]] and [[shardOrderBy]] (and staged incrementally by
    * the streaming curriculum export) — ONE definition so the
    * documented shared-tiebreak contract can't drift between the
    * batch and streaming paths.
    */
  private[graft] def orderKey(id: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed), id.cast("string")))

  def shardOrder(docs: DataFrame, idCol: String, nShards: Int,
      seed: String): DataFrame =
    docs
      .select(shardId(col(idCol), nShards).as("shard"), col(idCol),
        orderKey(col(idCol), seed).as("sort_key"))
      .withColumn("seq",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("sort_key"), col(idCol))) - 1)

  /** CURRICULUM variant of [[shardOrder]]: within each shard the
    * primary order is a caller-supplied curriculum signal (ASCENDING
    * — pass a negated column for descending), with the same md5
    * sort key + id as the deterministic tiebreak. An ascending
    * quality signal puts the best data LAST — the end-of-run quality
    * anneal schedule; any per-doc difficulty/length/quality column
    * works. The signal must itself be deterministic and
    * engine-replayable (a rounded percentile, a length bucket), or
    * the order stops being reproducible — which is the entire point.
    * NULL levels sort LAST (asc_nulls_last, pinned explicitly:
    * Spark's ascending default is NULLS FIRST where most SQL engines
    * — and any DuckDB replay — default to NULLS LAST, so the default
    * would silently shift every seq in a shard the moment a nullable
    * signal appears). Same scale shape as shardOrder: signal and
    * shard id compute at the scan, one md5-bucket-bounded row_number
    * window. Kept separate from [[shardOrder]] so export_order's
    * locked plan never carries a constant order column; the md5 key
    * is the shared [[orderKey]], and the seq window is
    * [[sequenceStaged]]'s — both single-sourced.
    */
  def shardOrderBy(docs: DataFrame, idCol: String, nShards: Int,
      seed: String, curriculum: Column): DataFrame =
    sequenceStaged(
      docs.select(shardId(col(idCol), nShards).as("shard"), col(idCol),
        curriculum.as("level"), orderKey(col(idCol), seed).as("sort_key")),
      idCol)

  /** The NUMBERING half of [[shardOrderBy]], over an already-staged
    * frame carrying (shard, `idCol`, level, sort_key): dense per-shard
    * seq with ascending level (NULLS LAST), the md5 sort key and id
    * as tiebreaks. Split out because seq assignment is inherently
    * GLOBAL — a newly arrived mid-level document belongs in the
    * middle of its shard's sequence, shifting every later seq — so a
    * streaming ingest stages the per-row halves incrementally
    * (deterministic, MERGE-idempotent) and defers this one bounded
    * window to export time ([[graft.streaming.Realtime
    * .curriculumOrder]]). Same scale shape as the batch path: the
    * window partitions on the md5-bucket shard, so no partition
    * outgrows ~N/nShards narrow rows.
    */
  def sequenceStaged(staged: DataFrame, idCol: String): DataFrame =
    staged.withColumn("seq",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard"))
        .orderBy(col("level").asc_nulls_last, col("sort_key"), col(idCol))) - 1)

  /** Write the corpus partitioned by shard id — the one terminal
    * shuffle of an export. Each `shard=K` directory is one loader
    * unit; repartitioning on (shard, salt) bounds a shard's output to
    * `filesPerShard` files instead of nShards files per input task
    * (at 1000 executors the difference is N×k files vs N×1000) while
    * ALSO spreading each shard's bytes over k writer tasks — a plain
    * `repartition(col("shard"))` funnels every shard through exactly
    * one task, so at ~1024 shards over 100 TB the export's wall-clock
    * is the slowest ~100 GB single-writer tail. The salt is a
    * deterministic hash of the id, so it changes only WHICH task
    * writes a row; shard MEMBERSHIP stays the pure md5 bucket of
    * [[shardId]] and re-exports land every document in the same
    * `shard=K` directory.
    */
  def writeShards(docs: DataFrame, idCol: String, nShards: Int,
      path: String, filesPerShard: Int = 4): Unit = {
    require(filesPerShard > 0,
      s"filesPerShard must be positive, got $filesPerShard")
    docs.withColumn("shard", shardId(col(idCol), nShards))
      .withColumn("__salt", pmod(hash(col(idCol)), lit(filesPerShard)))
      .repartition(nShards * filesPerShard, col("shard"), col("__salt"))
      .drop("__salt")
      .write.partitionBy("shard").mode("overwrite").parquet(path)
  }
}
