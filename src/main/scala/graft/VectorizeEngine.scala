package graft

import graft.operators.{Ann, Hnsw, Pipeline, Search}
import graft.providers.{ChatProvider, DeterministicChatProvider, EmbeddingProvider, Providers}
import graft.sources.ParquetStore
import graft.types._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's default models and prompt task
  * (extension/src/api.rs:159-223), single-sourced: the Scala API
  * defaults, the SQL scalar/TVF registrations, and the oracle
  * replays all reference THESE — a default changed in one copy but
  * not another would silently diverge the surfaces with no compile
  * error and no failing test.
  */
object VectorizeEngine {
  val DefaultChatModel = "openai/gpt-4o-mini"
  val DefaultEmbedModel = "sentence-transformers/all-MiniLM-L6-v2"
  val DefaultRagTask = "question_answer"
  val DefaultRagNumContext = 2
}

/** The user-facing engine: job lifecycle + search + RAG.
  *
  * A user of pg_vectorize interacts through `vectorize.table(...)`,
  * `vectorize.search(...)`, `vectorize.hybrid_search(...)`,
  * `vectorize.rag(...)` etc. (SURVEY §2.10); this class is the Spark
  * equivalent of that API surface. Jobs bind a source DataFrame
  * (registered by name) to an embeddings + search-tokens store kept
  * in a [[ParquetStore]] warehouse; the catalog itself is persisted
  * like the reference's `vectorize.job` table
  * (core/src/query.rs:205-220).
  */
final class VectorizeEngine(
    val spark: SparkSession,
    warehouseDir: String,
    embeddingProviderOverride: Option[EmbeddingProvider] = None,
    chatProvider: ChatProvider = new DeterministicChatProvider
) {

  val store = new ParquetStore(spark, warehouseDir)

  private val sources = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val jobs = scala.collection.concurrent.TrieMap.empty[String, VectorizeJob]

  // serializes catalog mutations against refreshCatalog's replace-all
  // reconcile (see refreshCatalog doc)
  private val catalogLock = new Object
  // task type → (sys_prompt, user_prompt); persisted like
  // vectorize.prompts (extension/sql/meta.sql:9-13) so custom RAG
  // tasks survive restart exactly as jobs do
  private val prompts = scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  // S9/R8 — catalog reload: like the reference's startup read of
  // vectorize.job (core/src/db.rs:4-19, cached server/src/cache.rs),
  // a new engine over an existing warehouse recovers every job. The
  // sources themselves are re-registered by the caller (they live
  // outside the warehouse, like the reference's user tables live in
  // Postgres); searches work immediately since the embedding/token
  // stores persist.
  locally { refreshCatalog() }

  /** R8 — live cache invalidation: re-read the persisted job and
    * prompt catalogs into memory, REPLACING the in-memory view (jobs
    * deleted by the WRITER engine over the same warehouse disappear,
    * created ones appear). The reference keeps its server/proxy caches
    * fresh with pg_notify/LISTEN (server/src/cache.rs:59-150,
    * proxy/src/cache.rs:9-57); parquet has no notification channel, so
    * the Spark analogue is poll-based — [[graft.streaming.JobScheduler]]
    * calls this once per poll tick, and any reader engine can call it
    * on demand.
    *
    * Concurrency: catalog MUTATION stays single-writer (persistCatalog
    * overwrites the table from the local view, matching ParquetStore's
    * one-writer-per-table contract); refreshCatalog is what lets any
    * number of READER engines — schedulers, search-serving sessions —
    * converge on the writer's state. Within one engine, the reconcile
    * and every mutation serialize on `catalogLock`, so a scheduler
    * tick's replace-all can never evict a job a caller thread is
    * concurrently creating (the reconcile sees either pre-put-pre-
    * persist or post-both, never the torn middle).
    */
  def refreshCatalog(): Unit = catalogLock.synchronized {
    if (store.exists("job_catalog")) {
      val loaded = store.read("job_catalog").collect().map { r =>
        VectorizeJob(
          jobName = r.getAs[String]("job_name"),
          srcTable = r.getAs[String]("src_table"),
          srcColumns = r.getAs[scala.collection.Seq[String]]("src_columns").toSeq,
          primaryKey = r.getAs[String]("primary_key"),
          updateTimeCol = Option(r.getAs[String]("update_time_col")),
          model = Model.parseUnsafe(r.getAs[String]("model")),
          tableMethod = TableMethod.parse(r.getAs[String]("table_method")),
          indexDist = IndexDist.parse(r.getAs[String]("index_dist_type")),
          schedule = r.getAs[String]("schedule"),
          params = Option(r.getAs[scala.collection.Map[String, String]]("params"))
            .map(_.toMap).getOrElse(Map.empty))
      }
      val names = loaded.map(_.jobName).toSet
      loaded.foreach(j => jobs.put(j.jobName, j))
      jobs.keys.filterNot(names).foreach(jobs.remove)
    }
    if (store.exists("prompt_catalog")) {
      val loaded = store.read("prompt_catalog").collect().map { r =>
        r.getAs[String]("prompt_type") ->
          (r.getAs[String]("sys_prompt"), r.getAs[String]("user_prompt"))
      }
      loaded.foreach { case (t, p) => prompts.put(t, p) }
      prompts.keys.filterNot(loaded.map(_._1).toSet).foreach(prompts.remove)
    }
  }

  /** Register a RAG prompt template under `promptType` and persist it
    * (vectorize.prompts analogue — users add task types as rows,
    * extension/sql/meta.sql:9-13). Overwrites an existing row like an
    * UPSERT; rag(task = promptType) resolves this catalog before the
    * process-wide [[graft.rag.PromptTemplates]] built-ins.
    */
  def registerPrompt(promptType: String, sysPrompt: String, userPrompt: String): Unit =
    catalogLock.synchronized {
      prompts.put(promptType, (sysPrompt, userPrompt))
      persistPrompts()
    }

  def listPrompts: Seq[String] = prompts.keys.toSeq.sorted

  private def persistPrompts(): Unit = {
    import spark.implicits._
    store.overwrite("prompt_catalog",
      prompts.toSeq.map { case (t, (s, u)) => (t, s, u) }
        .toDF("prompt_type", "sys_prompt", "user_prompt"))
  }

  /** Register a source DataFrame under a table name (replaces the
    * reference's information_schema introspection of an existing
    * Postgres table, core/src/init.rs:26-54).
    */
  def registerSource(name: String, df: DataFrame): Unit = {
    Identifiers.validate(name)
    sources.put(name, df)
    df.createOrReplaceTempView(name)
  }

  /** Provider for a job: job params `api_key` / `base_url` override
    * environment defaults, with `${VAR}` interpolation applied first
    * (F11, core/src/transformers/generic.rs:14-40 — the reference
    * interpolates provider config at use time so catalogs never store
    * raw secrets).
    */
  def provider(job: VectorizeJob): EmbeddingProvider =
    embeddingProviderOverride.getOrElse {
      def param(k: String): Option[String] = job.params.get(k).map { raw =>
        EnvInterpolation.interpolate(raw).fold(
          err => throw new IllegalArgumentException(err), identity)
      }
      Providers.forModel(job.model,
        baseUrl = param("base_url"), apiKey = param("api_key"))
    }

  // private[graft]: the streaming path (Realtime.processBatch) merges
  // into the same tables — one naming scheme, not two copies.
  private[graft] def embTable(job: String) = s"_embeddings_$job"
  private[graft] def tokTable(job: String) = s"_search_tokens_$job"
  private[graft] def appTable(job: String) = s"_append_$job"

  /** The (pkey, embeddings, updated_at) frame for a job regardless of
    * table method: join keeps a separate `_embeddings_<job>` table;
    * append stores embeddings inline in a wide `_append_<job>` table
    * (the reference ALTERs the source table itself,
    * core/src/types.rs:107-115) and projects the bookkeeping columns.
    */
  // Tables can legitimately not exist yet (zero-row backfill leaves
  // them uncreated): search over such a job returns empty results,
  // matching the reference (a query over an empty embeddings table),
  // instead of throwing "no such table".
  private def embeddingsOf(job: VectorizeJob): DataFrame = job.tableMethod match {
    case TableMethod.Append =>
      if (!store.exists(appTable(job.jobName)))
        store.readOrEmpty(appTable(job.jobName), Pipeline.embeddingSchema)
      else store.read(appTable(job.jobName))
        .select(col("pkey"), col("embeddings"),
          col("__emb_updated_at").as("updated_at"))
        .filter(col("embeddings").isNotNull)
    case _ => store.readOrEmpty(embTable(job.jobName), Pipeline.embeddingSchema)
  }

  private def tokensOf(jobName: String): DataFrame =
    store.readOrEmpty(tokTable(jobName), Pipeline.tokenSchema)

  /** `vectorize.table(...)` (extension/src/api.rs:80-114 +
    * initialize_job core/src/init.rs:122-269): validate, persist the
    * job row, create stores, run the initial backfill (embeddings +
    * search tokens).
    */
  private def validateJob(job: VectorizeJob): Unit = {
    Identifiers.validate(job.jobName)
    job.srcColumns.foreach(Identifiers.validate)
    Identifiers.validate(job.primaryKey)
    // R6 — schedule must be 'realtime', 'manual', or valid 5-field
    // cron (the reference would fail later at cron.schedule; we fail
    // at creation). Interpretation: graft.streaming.JobScheduler.
    Schedule.parse(job.schedule).left.foreach(err =>
      throw new IllegalArgumentException(s"invalid schedule: $err"))
    val src = sources.getOrElse(job.srcTable,
      throw new IllegalArgumentException(s"unknown source table: ${job.srcTable}"))
    // update_time_col type check (server/src/routes/table.rs:32-49)
    job.updateTimeCol.foreach { u =>
      val f = src.schema.fields.find(_.name == u).getOrElse(
        throw new IllegalArgumentException(s"no such column: $u"))
      require(f.dataType.typeName == "timestamp",
        s"update_time_col '$u' must be timestamp, got ${f.dataType.typeName}")
    }
  }

  /** Re-creating an existing job with any change that affects what
    * got embedded (model, table method, source table/columns, key,
    * watermark column) must not serve vectors from the old embedding
    * space — drop the old stores so the rebuild starts clean.
    * Param/schedule-only changes (API key rotation, cron tweak) keep
    * the backfill; same-config re-create stays idempotent. Applies to
    * BOTH creation paths (table and table_from).
    */
  private def dropStoresIfReconfigured(job: VectorizeJob): Unit =
    jobs.get(job.jobName).foreach { old =>
      def embeddingConfig(j: VectorizeJob) =
        (j.model, j.tableMethod, j.srcTable, j.srcColumns, j.primaryKey, j.updateTimeCol)
      if (embeddingConfig(old) != embeddingConfig(job)) {
        store.drop(embTable(job.jobName))
        store.drop(tokTable(job.jobName))
        store.drop(appTable(job.jobName))
      }
    }

  def createJob(job: VectorizeJob): VectorizeJob = {
    validateJob(job)
    dropStoresIfReconfigured(job)
    catalogLock.synchronized {
      jobs.put(job.jobName, job)
      persistCatalog()
    }
    refreshJob(job.jobName)
    job
  }

  /** `vectorize.job_execute` / cron target
    * (extension/src/executor.rs:43-96): incremental delta scan →
    * embed → MERGE. Idempotent — safe under at-least-once retries.
    *
    * The delta and the embedded rows are persisted for the duration
    * of the refresh: `embedded` is referenced by the MERGE (twice —
    * anti-join + union) AND the returned count, and `delta` by both
    * the embedding and the search-tokens pass. Without the persist
    * each reference would re-run the whole pipeline INCLUDING the
    * provider calls — with a paid HTTP provider that multiplies cost
    * per refresh (the count alone doubled it).
    */
  def refreshJob(jobName: String): Long = job(jobName) match {
    case Some(j) if j.tableMethod == TableMethod.Append => refreshAppend(j)
    case Some(j) => refreshJoin(j)
    case None => throw new NoSuchElementException(s"no such job: $jobName")
  }

  private def refreshJoin(job: VectorizeJob): Long = {
    val src = sources(job.srcTable)
    val embName = embTable(job.jobName)
    val delta = (
      if (store.exists(embName))
        Pipeline.deltaScanJoin(src, store.read(embName), job.primaryKey, job.updateTimeCol)
      else src
    ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Tokens FIRST, embeddings second: the retry delta is derived
      // from embedding staleness, so a crash after the tokens MERGE
      // re-runs both merges (idempotent), while the reverse order
      // would lose the tokens of already-embedded rows forever.
      val tokens = Pipeline.renderSearchTokens(delta, job.primaryKey, job.srcColumns)
      store.merge(tokTable(job.jobName), tokens, "pkey")
      val inputs = Pipeline.renderInputs(delta, job.primaryKey, job.srcColumns)
      val embedded = Pipeline.embed(inputs, provider(job), job.model.apiName)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        store.merge(embName, embedded, "pkey")
        embedded.count() // served from cache — no provider re-call
      } finally embedded.unpersist()
    } finally delta.unpersist()
  }

  /** Append method (extension/src/executor.rs:98-133): the reference
    * keeps embeddings + bookkeeping ON the source table. Spark-side
    * equivalent: a wide `_append_<job>` table = all source columns +
    * pkey + embeddings + `__emb_updated_at`, rebuilt by MERGE-ing
    * freshly embedded rows into the previous bookkeeping and joining
    * back to the (authoritative) source. Search reads embeddings
    * straight from the wide table — one fewer join at query time,
    * which is the method's point.
    */
  private def refreshAppend(job: VectorizeJob): Long = {
    val aName = appTable(job.jobName)
    val src = sources(job.srcTable)
    val withPkey = src.withColumn("pkey", col(job.primaryKey).cast("string"))
    val book =
      if (store.exists(aName))
        store.read(aName).select(col("pkey"), col("embeddings"), col("__emb_updated_at"))
          .filter(col("embeddings").isNotNull)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          Pipeline.embeddingSchema.fields.map(f =>
            if (f.name == "updated_at") f.copy(name = "__emb_updated_at") else f)))
    val joined = withPkey.join(book, Seq("pkey"), "left_outer")
    val stale = job.updateTimeCol match {
      case Some(u) => col("__emb_updated_at").isNull || col(u) > col("__emb_updated_at")
      case None    => col("__emb_updated_at").isNull
    }
    val delta = joined.filter(stale)
      .select(withPkey.columns.map(col).toIndexedSeq: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // tokens first — same crash-retry argument as refreshJoin
      val tokens = Pipeline.renderSearchTokens(delta, job.primaryKey, job.srcColumns)
      store.merge(tokTable(job.jobName), tokens, "pkey")
      val inputs = Pipeline.renderInputs(delta, job.primaryKey, job.srcColumns)
      val embedded = Pipeline.embed(inputs, provider(job), job.model.apiName)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = embedded.count()
        if (!store.exists(aName)) {
          // initial build: the full wide table, including not-yet-
          // embedded rows with null embeddings (the reference ALTERs
          // the source table, so every row is present from day one)
          val newBook = embedded.withColumnRenamed("updated_at", "__emb_updated_at")
          store.overwrite(aName, withPkey.join(newBook, Seq("pkey"), "left_outer"))
        } else {
          // incremental: MERGE only the delta's wide rows — a full
          // overwrite here would be O(|table|) per refresh, defeating
          // the bucketed store (the streaming path already merges)
          val wide = delta.join(
            embedded.withColumnRenamed("updated_at", "__emb_updated_at"), Seq("pkey"))
          store.merge(aName, wide, "pkey")
        }
        n
      } finally embedded.unpersist()
    } finally delta.unpersist()
  }

  /** `vectorize.import_embeddings` (extension/src/api.rs:250-326):
    * copy precomputed vectors for rows not already embedded.
    */
  def importEmbeddings(jobName: String, external: DataFrame,
      extPk: String, extVecCol: String): Unit = {
    val j = jobs(jobName)
    val incoming = external.select(
      col(extPk).cast("string").as("pkey"),
      col(extVecCol).cast("array<float>").as("embeddings"),
      current_timestamp().as("updated_at"))
    // Reject dimension mismatches AT IMPORT, not at first search:
    // with the strict dimension check in VectorBinaryExpression a
    // mis-sized imported vector would otherwise make every subsequent
    // query over the job throw.
    val dims = incoming.filter(col("embeddings").isNotNull)
      .select(size(col("embeddings")).as("d")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (dims.nonEmpty) {
      require(dims.length == 1,
        s"imported embeddings have mixed dimensions: ${dims.mkString(", ")}")
      // the job model's dimension; a provider whose dim probe needs
      // network (e.g. a live model server) falls back to accepting the
      // uniform incoming dim
      val expected = try provider(j).modelDim(j.model.apiName)
        catch { case _: Exception => dims.head }
      require(dims.head == expected,
        s"imported embedding dimension ${dims.head} != model dimension " +
          s"$expected for ${j.model.fullname}")
    }
    // Imported rows must be lexically searchable too: the refresh
    // delta skips them (they have embeddings), so their search
    // tokens are rendered here from the source rows.
    val srcForTokens = sources(j.srcTable).join(incoming.select("pkey"),
      col(j.primaryKey).cast("string") === col("pkey"), "left_semi")
    store.merge(tokTable(jobName),
      Pipeline.renderSearchTokens(srcForTokens, j.primaryKey, j.srcColumns), "pkey")
    j.tableMethod match {
      case TableMethod.Append =>
        // Append jobs serve from the wide `_append_` table — vectors
        // imported into `_embeddings_` would be dead data AND the
        // next refresh would re-embed (and re-pay for) every row.
        val aName = appTable(jobName)
        val withPkey = sources(j.srcTable)
          .withColumn("pkey", col(j.primaryKey).cast("string"))
        val fresh =
          if (store.exists(aName))
            incoming.join(store.read(aName)
              .filter(col("embeddings").isNotNull).select("pkey"),
              Seq("pkey"), "left_anti")
          else incoming
        val wide = withPkey.join(
          fresh.withColumnRenamed("updated_at", "__emb_updated_at"), Seq("pkey"))
        store.merge(aName, wide, "pkey")
      case _ =>
        val embName = embTable(jobName)
        val fresh =
          if (store.exists(embName))
            incoming.join(store.read(embName).select("pkey"), Seq("pkey"), "left_anti")
          else incoming
        store.merge(embName, fresh, "pkey")
    }
  }

  /** `vectorize.table_from` (extension/src/api.rs:328-390). */
  def createJobFromExisting(job: VectorizeJob, external: DataFrame,
      extPk: String, extVecCol: String): VectorizeJob = {
    validateJob(job)
    // same reconfiguration rule as createJob: a table_from with a
    // changed embedding config must not mix old-space vectors with
    // the imported ones
    dropStoresIfReconfigured(job)
    catalogLock.synchronized {
      jobs.put(job.jobName, job)
      persistCatalog()
    }
    importEmbeddings(job.jobName, external, extPk, extVecCol)
    // tokens + any rows the import missed
    refreshJob(job.jobName)
    job
  }

  /** `DELETE /api/v1/table/{job}` → cleanup_job
    * (core/src/init.rs:317-395). Failure-tolerant like the reference.
    */
  def deleteJob(jobName: String): Unit = {
    store.drop(embTable(jobName))
    store.drop(tokTable(jobName))
    store.drop(appTable(jobName))
    catalogLock.synchronized {
      jobs.remove(jobName)
      persistCatalog()
    }
  }

  /** `vectorize.chunk_table` (extension/src/api.rs:17-78): chunk one
    * text column of a registered source and WRITE the result as a
    * warehouse table of (original_id, chunk_index, chunk) — the
    * reference's output_table shape. Rows with a null key or null
    * text are skipped like the reference's `if let (Some, Some)`.
    * Overwrite (idempotent re-chunk) instead of the reference's
    * CREATE-IF-NOT-EXISTS + INSERT, which duplicates rows on re-run.
    * Returns the written table's DataFrame.
    */
  def chunkTable(inputTable: String, columnName: String, primaryKey: String,
      maxChunkSize: Int = 1000, outputTable: String = "chunked_data"): DataFrame = {
    Identifiers.validate(columnName)
    Identifiers.validate(primaryKey)
    Identifiers.validate(outputTable)
    require(maxChunkSize > 0, s"max_chunk_size must be positive, got $maxChunkSize")
    val src = sources.getOrElse(inputTable,
      throw new IllegalArgumentException(s"unknown source table: $inputTable"))
    val chunked = src
      .filter(col(primaryKey).isNotNull && col(columnName).isNotNull)
      .select(col(primaryKey).as("original_id"),
        posexplode(graft.functions.GraftFunctions.chunkText(
          col(columnName), lit(maxChunkSize))).as(Seq("chunk_index", "chunk")))
    store.overwrite(outputTable, chunked)
    store.read(outputTable)
  }

  /** `vectorize.encode` (extension/src/api.rs:159-177). */
  def encode(jobOrModel: String, text: String): Array[Float] = {
    val model = jobs.get(jobOrModel).map(_.model)
      .getOrElse(Model.parseUnsafe(jobOrModel))
    val p = jobs.get(jobOrModel).map(provider)
      .getOrElse(embeddingProviderOverride.getOrElse(Providers.forModel(model)))
    p.generateEmbeddings(model.apiName, Seq(text)).head
  }

  /** `vectorize.search` (extension/src/api.rs:116-134): embed the
    * query on the driver (the reference's network boundary #1), then
    * exact cosine top-k distributed on executors.
    */
  def search(jobName: String, query: String, limit: Int = 10,
      filters: Map[String, FilterValue] = Map.empty,
      returnCols: Seq[String] = Seq("*"),
      preFilter: Boolean = false,
      whereSql: Option[String] = None): DataFrame = {
    val job = jobs(jobName)
    val qv = encode(jobName, query)
    // P5 — raw where_sql predicate: applied post-join over the full
    // ranking like the typed filters (reference placement,
    // core/src/query.rs:669-700 WHERE on the joined result).
    // Caller-supplied SQL, same trust model as the reference.
    Search.semanticSearch(sources(job.srcTable), embeddingsOf(job),
      job.primaryKey, qv, limit, filters, returnCols, preFilter, whereSql)
  }

  /** P8 — JSON row encoding: the reference returns `SETOF jsonb` from
    * its search functions via `to_jsonb(t)` (core/src/query.rs:688,
    * 735; per-column assembly extension/src/search.rs:227-261). One
    * `results` string column per hit.
    */
  def searchJson(jobName: String, query: String, limit: Int = 10,
      filters: Map[String, FilterValue] = Map.empty,
      returnCols: Seq[String] = Seq("*"),
      whereSql: Option[String] = None): DataFrame =
    search(jobName, query, limit, filters, returnCols, whereSql = whereSql)
      .select(to_json(struct(col("*"))).as("results"))

  def hybridSearchJson(jobName: String, query: String, limit: Int = 10,
      filters: Map[String, FilterValue] = Map.empty,
      returnCols: Seq[String] = Seq("*"),
      whereSql: Option[String] = None): DataFrame =
    hybridSearch(jobName, query, limit, filters = filters,
        returnCols = returnCols, whereSql = whereSql)
      .select(to_json(struct(col("*"))).as("results"))

  /** `vectorize.hybrid_search` (extension/src/api.rs:136-157).
    * `bm25 = true` swaps the lexical leg's ts_rank_cd scoring for
    * BM25 over the same token store — a capability the reference
    * lacks; RRF fusion, weights, and windowing are unchanged.
    */
  def hybridSearch(jobName: String, query: String, limit: Int = 10,
      windowSize: Option[Int] = None, rrfK: Double = 60.0,
      semanticWt: Double = 1.0, ftsWt: Double = 1.0,
      filters: Map[String, FilterValue] = Map.empty,
      returnCols: Seq[String] = Seq("*"),
      bm25: Boolean = false,
      whereSql: Option[String] = None): DataFrame = {
    val job = jobs(jobName)
    val qv = encode(jobName, query)
    Search.hybridSearch(sources(job.srcTable), embeddingsOf(job),
      tokensOf(jobName), job.primaryKey, qv, query, limit,
      windowSize, rrfK, semanticWt, ftsWt, filters, returnCols, bm25,
      whereSql)
  }

  /** `vectorize.rag` (extension/src/api.rs:179-205): retrieve top
    * `numContext` rows, render the prompt template, trim to the model
    * context window, call the chat provider. Chat jobs require
    * exactly one content column (extension/src/chat/ops.rs:56-58).
    */
  def rag(jobName: String, query: String,
      chatModel: String = VectorizeEngine.DefaultChatModel,
      task: String = VectorizeEngine.DefaultRagTask,
      numContext: Int = VectorizeEngine.DefaultRagNumContext,
      forceTrim: Boolean = false): DataFrame = {
    val trimmed = ragPrompt(jobName, query, chatModel, task, numContext, forceTrim)
    val answer = chatProvider.generateResponse(chatModel, trimmed.sysPrompt, trimmed.userPrompt)
    import spark.implicits._
    Seq((query, answer)).toDF("query", "chat_response")
  }

  /** The deterministic prefix of [[rag]] — retrieve, render, trim —
    * without the chat call, exposed so the rendered prompt can be
    * DuckDB-oracled (the chat response itself is JVM-only and stays
    * EngineSpec-covered).
    */
  def ragPrompt(jobName: String, query: String,
      chatModel: String = VectorizeEngine.DefaultChatModel,
      task: String = VectorizeEngine.DefaultRagTask,
      numContext: Int = VectorizeEngine.DefaultRagNumContext,
      forceTrim: Boolean = false): graft.rag.RenderedPrompt = {
    val job = jobs(jobName)
    require(job.srcColumns.size == 1,
      s"chat jobs require exactly one content column, got ${job.srcColumns.size}")
    val contentCol = job.srcColumns.head
    val hits = search(jobName, query, numContext)
      .select(col(contentCol).cast("string")) // non-string content columns render, not crash
      .collect().map(_.getString(0))
      .filter(_ != null) // a null content column must not render "null" into the prompt
    // engine-persisted templates first, then the process-wide ones
    val tpl = prompts.get(task).orElse(graft.rag.PromptTemplates.resolve(task))
      .getOrElse(throw new IllegalArgumentException(s"unknown prompt task: $task"))
    val rendered = graft.rag.PromptTemplates.renderTemplate(tpl, hits.mkString("\n"), query)
    graft.rag.ContextWindow.enforce(chatModel, rendered, forceTrim)
  }

  /** `vectorize.generate` (extension/src/api.rs:207-223). */
  def generate(input: String,
      model: String = VectorizeEngine.DefaultChatModel): String =
    chatProvider.generateResponse(model, "You are a helpful assistant.", input)

  def job(name: String): Option[VectorizeJob] = jobs.get(name)
  def listJobs: Seq[VectorizeJob] = jobs.values.toSeq

  /** Install the SQL surface on this engine's session: the native
    * vector functions (cosine_similarity / dot_product / l2_distance),
    * `vectorize_embed(query, job)` with its driver-side
    * constant-folding rule — the Catalyst equivalent of the
    * reference's proxy rewrite (SURVEY §2.11,
    * proxy/src/embeddings.rs:66-182) — and the engine entry points as
    * TABLE functions (`SELECT * FROM vectorize_search(...)`, the
    * reference's pg_extern surface, extension/src/api.rs:116-157).
    * Idempotent.
    */
  def enableSqlFunctions(): Unit = {
    graft.plans.GraftSqlFunctions.registerAll(spark)
    graft.plans.SqlTableFunctions.register(this)
    // last-enabled engine owns the rule (one rule instance total)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[graft.plans.ResolveVectorizeEmbed]) :+
        new graft.plans.ResolveVectorizeEmbed(this)
  }

  /** CREATE INDEX analogue dispatched on the job's `IndexDist` hint
    * (extension/src/init.rs:86-146 builds the pgvector index flavor
    * the job declared; core/src/types.rs:61-68). `pgv_hnsw_*` builds
    * the per-partition HNSW graph index (operators/Hnsw.scala);
    * `vsc_diskann_cosine` builds the IVF index — SURVEY §4's
    * documented Spark-native substitution for a disk-resident graph.
    * All flavors rank by cosine, matching the search path (the
    * reference's generated queries always use the cosine operator
    * regardless of declared flavor — core/src/query.rs:653-699).
    * v1 limitation, checked loudly: pkeys must be numeric, because
    * the index stores long ids.
    */
  def buildVectorIndex(jobName: String, path: String): Unit = {
    val job = jobs(jobName)
    val emb = embeddingsOf(job)
    require(emb.filter(col("pkey").cast("long").isNull).limit(1).count() == 0,
      s"buildVectorIndex($jobName): non-numeric pkey values — " +
        "the v1 vector index requires numeric primary keys")
    job.indexDist match {
      case IndexDist.PgvHnswL2 | IndexDist.PgvHnswIp | IndexDist.PgvHnswCosine =>
        Hnsw.buildHnswIndex(emb, "pkey", "embeddings", path)
      case IndexDist.VscDiskannCos =>
        // store only what probes read — (pkey, embeddings) — so
        // refresh batches of the same shape can upsert cells directly
        Ann.buildIvfIndex(emb.select(col("pkey"), col("embeddings")),
          "pkey", "embeddings", path, nCells = 16, iterations = 3)
    }
  }

  /** Keep the job's vector index fresh after a refresh: `pgv_hnsw_*`
    * upserts at partition granularity (Hnsw.upsertHnswIndex — only
    * touched graph partitions rebuild, byte-identical to a full
    * build); `vsc_diskann_cosine` re-assigns changed rows against the
    * FROZEN trained centroids and rewrites only the touched cell
    * partitions (Ann.upsertIvfIndex — centroid drift is a rebuild
    * decision, like a native REINDEX). `changed` is the refreshed
    * embeddings subset (pkey, embeddings), e.g. the rows a refreshJob
    * batch upserted.
    */
  def upsertVectorIndex(jobName: String, path: String, changed: DataFrame): Unit =
    jobs(jobName).indexDist match {
      case IndexDist.PgvHnswL2 | IndexDist.PgvHnswIp | IndexDist.PgvHnswCosine =>
        Hnsw.upsertHnswIndex(changed, "pkey", "embeddings", path)
      case IndexDist.VscDiskannCos =>
        Ann.upsertIvfIndex(changed, "pkey", "embeddings", path)
    }

  /** Probe the index [[buildVectorIndex]] built for this job's hint:
    * same (id, cos) contract as the exact search leg, top-k merge at
    * the caller.
    */
  def probeVectorIndex(jobName: String, path: String, queryVec: Array[Float],
      k: Int): DataFrame = jobs(jobName).indexDist match {
    case IndexDist.PgvHnswL2 | IndexDist.PgvHnswIp | IndexDist.PgvHnswCosine =>
      Hnsw.probeHnswIndex(spark, path, queryVec, k)
        .orderBy(col("cos").desc, col("id").asc).limit(k)
    case IndexDist.VscDiskannCos =>
      Ann.probeIvfIndex(spark, path, "pkey", "embeddings", queryVec, k)
  }

  /** Index-backed semantic search with the reference's POST-filter
    * semantics (HNSW index scan + filter, core/src/query.rs:686-699):
    * the probe retrieves a candidate window (window_size = 5×limit
    * when filters are present — the same recall knob the scan path
    * exposes), the source join and P4 typed filters apply AFTER the
    * index scan, so an aggressively selective filter can return fewer
    * than `limit` rows — the reference's documented index-scan
    * behavior, preserved rather than silently "fixed" (the
    * better-recall pre-filter form exists on the scan path via
    * `search(preFilter = true)`). The probe output is ≤ window rows,
    * so the source join broadcasts — the big table never shuffles.
    */
  def searchIndexed(jobName: String, path: String, query: String,
      limit: Int = 10, filters: Map[String, FilterValue] = Map.empty,
      returnCols: Seq[String] = Seq("*")): DataFrame = {
    val job = jobs(jobName)
    val window = if (filters.isEmpty) limit else limit * 5
    val probe = probeVectorIndex(jobName, path, encode(jobName, query), window)
    val src = sources(job.srcTable)
    val joined = src.join(broadcast(probe),
      src(job.primaryKey).cast("long") === probe("id"), "inner")
    operators.Search.applyFilters(joined, filters)
      .select(operators.Search.projectCols(src, returnCols) ++ Seq(
        probe("cos").as("similarity_score"), probe("id").as("__id")): _*)
      .orderBy(col("similarity_score").desc, col("__id").asc)
      .limit(limit).drop("__id")
  }

  /** Project view (core/src/query.rs:311-320): source ⋈ embeddings. */
  def projectView(jobName: String): DataFrame = {
    val job = jobs(jobName)
    val src = sources(job.srcTable)
    val emb = embeddingsOf(job)
      .withColumnRenamed("updated_at", "embeddings_updated_at")
    src.join(emb, src(job.primaryKey).cast("string") === emb("pkey")).drop("pkey")
  }

  /** Persist the catalog like vectorize.job (tiny table → overwrite). */
  private def persistCatalog(): Unit = {
    import spark.implicits._
    val rows = jobs.values.toSeq.map { j =>
      (j.jobName, j.srcTable, j.srcColumns, j.primaryKey,
        j.updateTimeCol.orNull, j.model.fullname, j.tableMethod.name,
        j.indexDist.name, j.schedule, j.params)
    }
    // Written even when empty so deleting the last job persists.
    // params travel too — provider config (api_key/base_url refs)
    // must survive restart, vectorize.job.params JSONB equivalent.
    store.overwrite("job_catalog", rows.toDF(
      "job_name", "src_table", "src_columns", "primary_key",
      "update_time_col", "model", "table_method", "index_dist_type",
      "schedule", "params"))
  }
}
