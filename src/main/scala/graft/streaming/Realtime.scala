package graft.streaming

import graft.VectorizeEngine
import graft.operators.Pipeline
import graft.types.{TableMethod, VectorizeJob}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Realtime (incremental) embedding maintenance.
  *
  * The reference's realtime mode is trigger → pgmq queue → background
  * worker (SURVEY §2.9 R1-R5). The Spark-native equivalent collapses
  * the queue into Structured Streaming micro-batches: a stream of
  * source rows drives `foreachBatch`, each batch is rendered,
  * embedded, and MERGEd — idempotently, so the at-least-once
  * delivery of checkpoint recovery preserves correctness exactly the
  * way the reference's `ON CONFLICT DO UPDATE` upsert does
  * (worker/src/ops.rs:8-70).
  */
object Realtime {

  /** Process one micro-batch of changed source rows for `job`:
    * render → embed → MERGE embeddings + search tokens. This is the
    * exact body of the reference worker's execute_job
    * (worker/src/executor.rs:60-160) re-expressed on DataFrames.
    */
  def processBatch(engine: VectorizeEngine, job: VectorizeJob, batch: DataFrame,
      indexPath: Option[String] = None): Unit = {
    if (batch.isEmpty) return
    // A micro-batch may contain several versions of one key (insert
    // then update, or at-least-once redelivery): keep only the last
    // writer per pkey (by update_time_col when present) so the MERGE
    // sees at most one row per key — the same end state Postgres
    // reaches by applying the statements in order.
    val deduped = job.updateTimeCol match {
      case Some(u) if batch.columns.contains(u) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(job.primaryKey)).orderBy(col(u).desc)
        batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case _ =>
        // Without an update-time column there is no order to recover:
        // which duplicate survives is arbitrary (same as the reference
        // worker, whose queue message carries only record ids — the
        // row is re-read from the source at process time). Jobs whose
        // streams can carry multiple versions of a key per batch
        // should declare update_time_col.
        batch.dropDuplicates(job.primaryKey)
    }
    val inputs = Pipeline.renderInputs(deduped, job.primaryKey, job.srcColumns)
    // persisted: the store MERGE runs two actions (touched-bucket
    // collect + write), each of which would otherwise re-run the
    // mapPartitions provider calls — 2x API cost per micro-batch
    // (same guard refreshJoin documents)
    val embedded = Pipeline.embed(inputs, engine.provider(job), job.model.apiName)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      job.tableMethod match {
        case TableMethod.Append =>
          // Append jobs are served from the wide `_append_<job>` table
          // (VectorizeEngine.embeddingsOf) — merge the embedded rows
          // there, joined back to their source columns, or streamed
          // updates would never become searchable.
          val withPkey = deduped.withColumn("pkey", col(job.primaryKey).cast("string"))
          val wide = withPkey.join(
            embedded.withColumnRenamed("updated_at", "__emb_updated_at"), Seq("pkey"))
          engine.store.merge(engine.appTable(job.jobName), wide, "pkey")
        case _ =>
          engine.store.merge(engine.embTable(job.jobName), embedded, "pkey")
      }
      val tokens = Pipeline.renderSearchTokens(deduped, job.primaryKey, job.srcColumns)
      engine.store.merge(engine.tokTable(job.jobName), tokens, "pkey")
      // keep the job's ANN index fresh alongside the store (the
      // reference's pgvector index updates with every upsert): the
      // partition-granular upsert rebuilds only touched graph
      // partitions, and replays reproduce byte-identical partitions,
      // so at-least-once redelivery stays idempotent here too
      indexPath.foreach { p =>
        engine.upsertVectorIndex(job.jobName, p,
          embedded.select(col("pkey"), col("embeddings")))
      }
    } finally embedded.unpersist()
  }

  /** Start the realtime pipeline from a streaming DataFrame of source
    * rows (file stream, Kafka, Delta CDF...). Checkpointing gives
    * at-least-once; the MERGE makes replays idempotent (R5).
    */
  def start(engine: VectorizeEngine, jobName: String, stream: DataFrame,
      checkpointDir: String, trigger: Trigger = Trigger.ProcessingTime("2 seconds"),
      indexPath: Option[String] = None): StreamingQuery = {
    val job = engine.job(jobName).getOrElse(
      throw new IllegalArgumentException(s"unknown job: $jobName"))
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(engine, job, batch, indexPath)
      }
      .start()
  }

  /** Cron-mode equivalent (R6): one Trigger.AvailableNow pass over
    * whatever accumulated since the last run.
    */
  def runAvailableNow(engine: VectorizeEngine, jobName: String, stream: DataFrame,
      checkpointDir: String, indexPath: Option[String] = None): StreamingQuery =
    start(engine, jobName, stream, checkpointDir, Trigger.AvailableNow(), indexPath)

  /** Windowed event-stream aggregation with watermarking — the
    * streaming-analytics shape (late data dropped after the
    * watermark; event-time tumbling windows). Works identically on a
    * batch DataFrame (watermark is a no-op there), which is how the
    * oracle checks it.
    */
  def windowedEventCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, watermark: String = "10 minutes",
      valueCol: String = "value"): DataFrame = {
    val maybeWatermarked =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    maybeWatermarked
      .groupBy(window(col(tsCol), windowDur).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n"), col("total_value"))
  }

  /** Stream-stream interval join with watermarks — the streaming
    * sibling of RangeJoin.pointInInterval / AsOf.join: each left
    * event pairs with same-key right events at most `lookback` older
    * (r.ts ∈ [l.ts − lookback, l.ts]). The time-range join condition
    * plus both-side watermarks is what lets Spark EXPIRE join state:
    * right rows older than watermark + lookback leave the state
    * store, so state is bounded by rate × lookback, not by stream
    * history. Inner-join matches emit immediately (no watermark
    * latency). Exact latest-only as-of on streams needs
    * flatMapGroupsWithState ordering state; this bounded interval
    * join is the backpressure-safe shape (Flink's interval join), and
    * a downstream max_by per left event recovers as-of semantics.
    * Right-side columns return prefixed `r_`. Works identically on
    * batch frames (watermarks no-op), which is how the spec checks it.
    */
  def intervalEnrich(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, lookback: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val prefixed = right.columns.foldLeft(right)(
      (d, c) => d.withColumnRenamed(c, s"r_$c"))
    val l = if (left.isStreaming) left.withWatermark(tsCol, watermark) else left
    val r = if (prefixed.isStreaming)
      prefixed.withWatermark(s"r_$tsCol", watermark) else prefixed
    l.join(r,
      col(keyCol) === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(tsCol) - expr(s"INTERVAL $lookback") &&
        col(s"r_$tsCol") <= col(tsCol))
  }

  /** Streaming first-seen document dedup — [[graft.operators.Dedup
    * .exactCanonical]]'s streaming counterpart for a continuously
    * ingested corpus: a document is emitted iff its normalized-text
    * hash has not been seen within the watermark horizon; later
    * duplicates (same batch, later batch, or after a checkpointed
    * restart) are dropped. State is one compact row per distinct hash
    * in the state store, EXPIRED past the event-time watermark via
    * dropDuplicatesWithinWatermark — memory is bounded by
    * distinct-rate × horizon, not stream history. Without `tsCol` the
    * state never expires (exact global dedup; unbounded — pass a time
    * column in production). On a batch frame this degenerates to
    * dropDuplicates(hash), whose surviving row is arbitrary — batch
    * pipelines should use exactCanonical's deterministic min-id pick;
    * under streaming, first ARRIVAL is the deterministic choice.
    */
  def streamDedup(docs: DataFrame, textCol: String,
      tsCol: Option[String] = None, horizon: String = "1 hour"): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val hashed = docs.withColumn("__norm_hash", md5(norm))
    (tsCol match {
      case Some(t) if docs.isStreaming =>
        hashed.withWatermark(t, horizon)
          .dropDuplicatesWithinWatermark("__norm_hash")
      case _ => hashed.dropDuplicates("__norm_hash")
    }).drop("__norm_hash")
  }

  /** Sessionization via session_window (gap-based) — the canonical
    * stateful-streaming operator beyond tumbling windows.
    */
  def sessionize(events: DataFrame, tsCol: String, userCol: String,
      gap: String = "30 minutes", valueCol: String = "value"): DataFrame = {
    val maybeWatermarked =
      if (events.isStreaming) events.withWatermark(tsCol, gap) else events
    maybeWatermarked
      .groupBy(session_window(col(tsCol), gap).as("s"), col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col("s.start").as("session_start"), col("s.end").as("session_end"),
        col(userCol), col("n_events"), col("total_value"))
  }
}
