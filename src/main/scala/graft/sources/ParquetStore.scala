package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot-versioned Parquet table with key-hash-bucketed upsert
  * (MERGE) semantics.
  *
  * The reference upserts embeddings with
  * `INSERT ... ON CONFLICT (pkey) DO UPDATE` (worker/src/ops.rs:8-70)
  * and bulk update-joins (worker/src/ops.rs:95-160). Spark+Parquet has
  * no in-place upsert, so rows live in `nBuckets` key-hash buckets
  * (`pmod(hash(key), nBuckets)` — deterministic across sessions) and
  * a MERGE rewrites ONLY the buckets its update keys fall into:
  * per-merge I/O is O(|table| * touchedBuckets / nBuckets + |batch|),
  * not O(|table|). At 100 TB with a realistic bucket count the write
  * path scales with the batch, which is the property Delta/Iceberg
  * MERGE gives and a naive copy-on-write-the-world store does not.
  *
  * Layout per table:
  *   `_CURRENT`       — monotonic global version pointer (liveness)
  *   `_BUCKETS`       — "bucket version" lines: which snapshot dir
  *                      holds each bucket's current data (-1 = flat,
  *                      unbucketed snapshot from overwrite())
  *   `v_<n>/__bucket=<b>/` — parquet for the buckets rewritten at n
  *
  * Both pointer files flip via overwriting rename (posix/HDFS rename
  * onto an existing path is atomic), so readers never observe a
  * missing or partial pointer; a failed merge leaves the previous
  * pointers intact — idempotent-retry safe, which is what makes the
  * streaming path's at-least-once delivery correct (SURVEY §7.4).
  * Old snapshot dirs are GC'd once no bucket references them.
  *
  * Concurrency contract: ONE writer per table (the engine is the
  * single writer; streaming micro-batches are serialized by
  * foreachBatch). Two concurrent merges would race the version
  * counter — multi-writer needs the optimistic-commit protocol of a
  * real table format, which is part of what the Delta swap buys.
  * Readers are safe against a single concurrent writer: pointer flips
  * are atomic renames, and GC retains the previous bucket map's
  * versions for one commit cycle. Catalog-level changes made by THE
  * writer engine (job/prompt create, delete) propagate to reader
  * engines over the same warehouse without restart via
  * VectorizeEngine.refreshCatalog — the poll-based analogue of the
  * reference's LISTEN/NOTIFY cache invalidation, called once per
  * JobScheduler tick. Catalog mutation itself remains single-writer
  * (persistCatalog overwrites from the local view).
  *
  * On a production cluster this class is swapped for Delta
  * `MERGE INTO` (same call signature); the engine's call sites depend
  * only on `read`/`merge`/`overwrite`.
  */
final class ParquetStore(spark: SparkSession, root: String, nBuckets: Int = 16,
    filesPerBucket: Int = 4) extends Serializable {
  require(filesPerBucket > 0,
    s"filesPerBucket must be positive, got $filesPerBucket")

  /** The session this store reads/writes with — for helpers that
    * build driver-side frames destined for this store (review r19:
    * `SparkSession.active` is the wrong session whenever the caller's
    * context differs from the store's, and throws when none is
    * active). */
  private[graft] def session: SparkSession = spark

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Control-file IO (pointers, bucket maps, meta sidecars) through
    * the RAW filesystem when the scheme wraps a checksummed one
    * (local `file://`): ChecksumFileSystem keeps each file's CRC in a
    * separate `.name.crc` sidecar which does NOT flip atomically with
    * the overwriting rename, so a concurrent reader could pair the
    * NEW pointer bytes with the OLD sidecar and fail with
    * ChecksumException — observed under the concurrent
    * refresh-while-serving pin (r16), violating the "readers see old
    * or new content, never an error" contract the atomic rename
    * exists for. Raw IO keeps no sidecar. Data files are unaffected
    * (Spark manages its own parquet IO).
    */
  private def controlFs: org.apache.hadoop.fs.FileSystem = fs match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }
  private def pointer(table: String) = new Path(s"$root/$table/_CURRENT")
  private def bucketsPath(table: String) = new Path(s"$root/$table/_BUCKETS")
  private def versionDir(table: String, v: Long) = s"$root/$table/v_$v"

  /** Effective bucket count for a table: the count persisted in its
    * _BUCKETS header (written at first bucketed commit), falling back
    * to the constructor value for new or legacy tables. Persisting it
    * makes the layout self-describing — reopening an existing table
    * with a different constructor nBuckets would otherwise hash keys
    * into the wrong buckets and silently duplicate/miss rows on merge.
    */
  private def tableBuckets(table: String): Int = {
    val p = bucketsPath(table)
    if (!fs.exists(p)) nBuckets
    else new String(readFully(p), "UTF-8").linesIterator
      .find(_.startsWith("#n "))
      .map(_.stripPrefix("#n ").trim.toInt)
      .getOrElse(nBuckets)
  }

  private def bucketOf(key: String, nb: Int) = pmod(hash(col(key)), lit(nb))

  /** Writer tasks per bucket dir. Without a pre-write shuffle, every
    * upstream task writes its own file into every bucket it touches —
    * a 32-partition merge into 16 buckets leaves up to 512 files, and
    * on a SMALL table the probe-side read then pays per-file
    * listing/footer costs far exceeding the data (measured 3× on the
    * 250-row incremental-dedup index). Repartitioning on
    * (__bucket, salt) bounds output to `filesPerBucket` files per
    * bucket while still giving each bucket `filesPerBucket` parallel
    * writers — the single-writer-per-bucket tail a plain
    * repartition(__bucket) would create. Write parallelism = touched
    * buckets × filesPerBucket: both are constructor knobs, and at
    * 100 TB they are sized TOGETHER (thousands of buckets so a merge
    * rewrites a thin table slice, filesPerBucket at the executor
    * count over the touched-bucket count so every writer slot is
    * busy). The small defaults fit the sf-scale test stores.
    */
  private def bucketedWrite(df: DataFrame, key: String, dir: String,
      nTargetBuckets: Int): Unit =
    // the salt MUST come from a hash independent of bucketOf's: with
    // the same murmur hash, pmod(h, filesPerBucket) is fully
    // determined by __bucket = pmod(h, nBuckets) whenever
    // filesPerBucket divides nBuckets (the 16/4 default!), collapsing
    // every bucket back to one writer partition — xxhash64 decorrelates
    df.repartition(math.max(1, nTargetBuckets * filesPerBucket),
        col("__bucket"),
        pmod(org.apache.spark.sql.functions.xxhash64(col(key)),
          lit(filesPerBucket.toLong)))
      .write.partitionBy("__bucket").mode(SaveMode.Overwrite).parquet(dir)

  private def metaPath(table: String) = new Path(s"$root/$table/_META")

  /** Table-level key→value properties sidecar (`_META`) — the
    * self-describing-layout companion to the `#n` bucket-count header:
    * index builders record their frozen build parameters here (e.g.
    * the MinHash (shingleN, numHashes, bands) geometry) so a probe
    * can REQUIRE-match them instead of trusting the caller to have
    * remembered them. Written via the same atomic tmp+rename as the
    * pointers; survives merges (it describes the table, not a
    * snapshot) and dies with drop(). Keys must be whitespace-free,
    * values newline-free — enforced here so getMeta's line format
    * can never be corrupted into silently wrong pairs.
    */
  private def validateMetaProps(props: Map[String, String]): Unit = {
    require(props.keys.forall(k => k.nonEmpty && !k.exists(_.isWhitespace)),
      s"putMeta keys must be non-empty and whitespace-free: ${props.keys}")
    require(props.values.forall(v => !v.exists(c => c == '\n' || c == '\r')),
      "putMeta values must be newline-free")
  }

  private def renderMeta(props: Map[String, String]): String =
    props.toSeq.sortBy(_._1).map { case (k, v) => s"$k $v" }.mkString("\n")

  private def parseMeta(bytes: Array[Byte]): Map[String, String] =
    new String(bytes, "UTF-8").linesIterator
      .map(_.trim).filter(_.nonEmpty).map { line =>
        val i = line.indexOf(' ')
        if (i < 0) line -> "" else line.substring(0, i) -> line.substring(i + 1)
      }.toMap

  def putMeta(table: String, props: Map[String, String]): Unit = {
    validateMetaProps(props)
    // review r17: on a sidecar-era table (ANY _META_v exists) this
    // legacy write would SUCCEED but never be served — getMeta
    // resolves sidecars or loud unknown provenance — so the caller's
    // update silently vanishes; fail loudly instead. Tables
    // maintained by putMeta alone (the signature-geometry stores)
    // never have sidecars. Once every sidecar is GC'd (plain
    // overwrites aged the era out entirely), putMeta is legal again:
    // with no versioned trace left, the table-level label coherently
    // describes the table.
    if (metaVersions(table).nonEmpty)
      throw new IllegalStateException(
        s"$root/$table: this table's properties are versioned " +
          "(_META_v sidecars via overwriteWithMeta) — a legacy putMeta " +
          "would never be served; refresh it through overwriteWithMeta")
    atomicWrite(metaPath(table), renderMeta(props))
  }

  /** Per-version `_META_v<n>` sidecar path — written by
    * [[overwriteWithMeta]] BEFORE the `_CURRENT` flip, so the
    * snapshot's data and its properties commit atomically (readers
    * resolving the pointer see either the old pair or the new pair,
    * never new data under old properties — the calibration-refresh
    * race the table-level `_META` write order could not close).
    */
  private def metaVPath(table: String, v: Long) =
    new Path(s"$root/$table/_META_v$v")

  /** Versions carrying a versioned `_META_v<n>` sidecar, ascending. */
  private def metaVersions(table: String): Seq[Long] = {
    val dir = new Path(s"$root/$table")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_META_v"))
      .flatMap(n => scala.util.Try(n.stripPrefix("_META_v").toLong).toOption)
      .sorted
  }

  /** Properties for the table: the `_META_v<current>` sidecar when
    * the CURRENT version carries one (committed via
    * [[overwriteWithMeta]]), else the table-level `_META` written by
    * [[putMeta]]; empty for tables with neither. Resolution is
    * EXACT-version, not newest-at-or-below (code review r16): a
    * version committed WITHOUT a sidecar — a plain [[overwrite]], or
    * a [[merge]] — after an overwriteWithMeta must read as "no
    * versioned properties" (falling back to the legacy sidecar, or
    * unknown provenance), never serve the SUPERSEDED snapshot's
    * label for data it does not describe: a stale label under fresh
    * cells is exactly the silent miscalibration the atomic commit
    * exists to prevent. Consequence: overwriteWithMeta tables are
    * full-replace tables — refresh them only through
    * overwriteWithMeta (a merge would drop them to unknown
    * provenance, loudly).
    */
  def getMeta(table: String): Map[String, String] = {
    // tolerant sidecar read: a sidecar GC'd between the exists probe
    // and the read degrades to the legacy path (consistent-pair
    // consumers use readSnapshotWithMeta, which retries instead)
    val exact = currentVersion(table).map(metaVPath(table, _))
      .filter(fs.exists)
      .flatMap(p => try Some(parseMeta(readFully(p)))
        catch { case _: java.io.FileNotFoundException => None })
    exact.getOrElse {
      // legacy fallback ONLY for tables that never entered the
      // versioned-sidecar era (ADVICE r16): once any _META_v exists,
      // a current version without its own sidecar is unknown
      // provenance — the legacy table-level _META describes some
      // SUPERSEDED snapshot, and serving its label over fresher cells
      // is the exact stale pairing the exact-version rule blocks for
      // sidecars
      if (metaVersions(table).nonEmpty) Map.empty
      else {
        val p = metaPath(table)
        if (!fs.exists(p)) Map.empty else parseMeta(readFully(p))
      }
    }
  }

  def currentVersion(table: String): Option[Long] = {
    val p = pointer(table)
    if (!fs.exists(p)) None
    else Some(new String(readFully(p), "UTF-8").trim.toLong)
  }

  def exists(table: String): Boolean = currentVersion(table).isDefined

  /** bucket → snapshot version holding its current data. Bucket -1
    * marks a flat (unbucketed) snapshot written by overwrite().
    */
  private def readBucketMap(table: String): Map[Int, Long] = {
    val p = bucketsPath(table)
    if (!fs.exists(p))
      // Migration: a pre-bucketing table has _CURRENT but no _BUCKETS
      // (the old format stored one flat snapshot at the current
      // version). Synthesize the flat map so legacy warehouses stay
      // readable; the next merge re-buckets them like any flat
      // overwrite() snapshot.
      currentVersion(table).map(v => Map(-1 -> v)).getOrElse(Map.empty)
    else new String(readFully(p), "UTF-8").linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val Array(b, v) = line.split("\\s+")
        b.toInt -> v.toLong
      }.toMap
  }

  private def readFully(p: Path): Array[Byte] = {
    val in = controlFs.open(p)
    try in.readAllBytes() finally in.close()
  }

  private def bucketDataPaths(table: String, m: Map[Int, Long]): Seq[String] =
    m.toSeq.sortBy(_._1).map {
      case (-1, v) => versionDir(table, v)
      case (b, v) => s"${versionDir(table, v)}/__bucket=$b"
    }.filter(p => fs.exists(new Path(p)))

  def read(table: String): DataFrame = {
    if (!exists(table))
      throw new IllegalStateException(s"no such table: $root/$table")
    val paths = bucketDataPaths(table, readBucketMap(table))
    if (paths.isEmpty)
      throw new IllegalStateException(s"no data for table: $root/$table")
    // recursiveFileLookup disables partition-directory inference — the
    // leaf dirs come from different snapshot versions, which would
    // otherwise trip "conflicting directory structures".
    spark.read.option("recursiveFileLookup", "true").parquet(paths: _*)
  }

  /** read(), or an empty frame of `schema` when the table does not
    * exist (zero-row backfills deliberately leave tables uncreated).
    */
  def readOrEmpty(table: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (exists(table)) read(table)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Atomic pointer write: tmp file + overwriting rename — the
    * pointer is NEVER absent once created; a crash or concurrent
    * reader observes either the old or the new content.
    */
  private def atomicWrite(target: Path, content: String): Unit = {
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    // raw create: no CRC sidecar, so the rename below is the WHOLE
    // publish — nothing else has to flip in step with it
    val out = controlFs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if ("file".equalsIgnoreCase(fs.getUri.getScheme)) {
      // POSIX rename(2): atomically REPLACES the target in one
      // syscall. Hadoop's local FileContext rename with OVERWRITE is
      // delete-then-rename — a concurrent reader can observe the
      // pointer ABSENT between the two (caught by the r16 concurrent
      // refresh-while-serving pin), which breaks this store's
      // "pointer never absent once created" contract.
      java.nio.file.Files.move(
        java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(fs.makeQualified(target).toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      // HDFS and object-store schemes: FileContext rename with
      // OVERWRITE is a single atomic namespace operation
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(target),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    // drop any stale checksum sidecar a pre-r16 (checksummed) write
    // left for this control file — raw readers ignore it, but a
    // leftover would confuse external checksummed tooling forever
    val crc = new Path(target.getParent, s".${target.getName}.crc")
    if (controlFs.exists(crc)) controlFs.delete(crc, false)
  }

  private def commit(table: String, v: Long, bucketMap: Map[Int, Long],
      nb: Int, prevReferenced: Set[Long] = Set.empty): Unit = {
    // Pointer-write ORDER is crash-critical, and differs by case:
    // - first commit: _BUCKETS before _CURRENT, so exists() only turns
    //   true once the map it implies is in place (a crash between the
    //   two leaves the table nonexistent — correct).
    // - later commits: _CURRENT before _BUCKETS. The reverse would
    //   leave a crashed merge's NEW map visible with the OLD version
    //   counter — the retry would then recompute the same v and
    //   SaveMode.Overwrite the very directories its input paths point
    //   into. With pointer-first, a crash leaves the old map intact:
    //   readers serve the pre-merge state and the retry writes a fresh
    //   v+1 directory.
    // The "#n" header pins the table's bucket count (self-describing
    // layout — see tableBuckets).
    val bucketsContent =
      (s"#n $nb" +:
        bucketMap.toSeq.sortBy(_._1).map { case (b, ver) => s"$b $ver" }).mkString("\n")
    if (currentVersion(table).isEmpty) {
      atomicWrite(bucketsPath(table), bucketsContent)
      atomicWrite(pointer(table), v.toString)
    } else {
      atomicWrite(pointer(table), v.toString)
      atomicWrite(bucketsPath(table), bucketsContent)
    }
    cleanOld(table, v, bucketMap, prevReferenced)
  }

  /** Full overwrite (initial backfill / small dimension tables /
    * catalog). Written flat — a subsequent merge re-buckets.
    */
  def overwrite(table: String, df: DataFrame): Unit = {
    val prev = readBucketMap(table).values.toSet
    val v = currentVersion(table).getOrElse(-1L) + 1L
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(table, v))
    commit(table, v, Map(-1 -> v), tableBuckets(table), prev)
  }

  /** [[overwrite]] with the snapshot's properties committed
    * ATOMICALLY alongside it: data dir and `_META_v<n>` sidecar are
    * both in place BEFORE the `_CURRENT` flip, so the pointer — the
    * single commit point — publishes the (data, properties) pair
    * together. A crash anywhere before the flip leaves the previous
    * pair fully served; there is no window where readers see new data
    * under old properties or vice versa (the two-step
    * overwrite+putMeta refresh has exactly that window between its
    * writes). Use for snapshot-versioned reference tables whose
    * properties name the snapshot (e.g. the quality-CDF calibration
    * store); read the consistent pair back via
    * [[readSnapshotWithMeta]].
    *
    * Writer contract: SINGLE WRITER PER TABLE (ADVICE r16). The
    * atomicity above is crash-atomicity, not isolation — two
    * concurrent refreshers can compute the same next version and one
    * writer's parquet dir can land under the other's sidecar before
    * they race on `_CURRENT`. The pre-flip check below turns the
    * common interleaving into a loud failure (the version read at
    * start must still be current at commit), but it is best-effort —
    * a local filesystem has no compare-and-swap rename, so a writer
    * sneaking in between the check and the flip is not detected.
    * Serialize refreshes per table (the calibration scheduler's
    * single maintenance job does).
    */
  def overwriteWithMeta(table: String, df: DataFrame,
      props: Map[String, String]): Unit = {
    validateMetaProps(props)
    val prev = readBucketMap(table).values.toSet
    val v0 = currentVersion(table)
    val v = v0.getOrElse(-1L) + 1L
    def checkUnmoved(stage: String): Unit = {
      val vNow = currentVersion(table)
      if (vNow != v0) throw new IllegalStateException(
        s"$root/$table: concurrent refresh detected $stage — _CURRENT " +
          s"moved from ${v0.getOrElse(-1L)} to ${vNow.getOrElse(-1L)} " +
          s"while this overwriteWithMeta was staging version $v; " +
          "overwriteWithMeta tables are single-writer (serialize refreshes)")
    }
    // BEFORE the destructive write (review r17): if another writer
    // already committed the same next version, overwriting its dir
    // would clobber COMMITTED data before this writer's own check
    // could abort it; catching the already-moved pointer here leaves
    // the winner untouched. (Best-effort, as documented above — a
    // writer landing between this read and the write is undetectable
    // without a CAS rename.)
    checkUnmoved("before staging")
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(table, v))
    // the era is permanent (review r17): retire the legacy table-level
    // _META on every overwriteWithMeta, BEFORE the flip. Era detection
    // via surviving sidecars is GC-defeatable — cleanOld drops
    // sidecars of superseded versions after one grace commit, so a
    // plain overwrite + one more commit would otherwise resurrect the
    // legacy label for data it never described. Retire = PROMOTE then
    // delete (review r17, second pass): the legacy label describes the
    // STILL-CURRENT snapshot v0 until the pointer flips, so a bare
    // delete that crashed before the flip would strip a live
    // snapshot's provenance (and era-permanence locks putMeta, so it
    // could never be restored). Re-writing it first as v0's exact
    // _META_v sidecar preserves the pair across every crash point:
    // after the flip it is superseded and GC'd on the normal grace
    // schedule, before the flip it serves exactly what the legacy
    // fallback served. Placed AFTER the (long, failure-prone) data
    // write (review r17, third pass): a df whose computation throws
    // must leave the table OUT of the sidecar era entirely — the
    // promote-first ordering era-locked putMeta on a refresh that
    // never staged any data.
    val legacy = metaPath(table)
    if (fs.exists(legacy)) {
      v0.foreach { cur =>
        val curSidecar = metaVPath(table, cur)
        if (!fs.exists(curSidecar))
          try atomicWrite(curSidecar,
            new String(readFully(legacy), "UTF-8"))
          catch { case _: java.io.FileNotFoundException => () }
      }
      fs.delete(legacy, false)
    }
    atomicWrite(metaVPath(table, v), renderMeta(props))
    checkUnmoved("before the pointer flip")
    commit(table, v, Map(-1 -> v), tableBuckets(table), prev)
  }

  /** The current snapshot's data and the properties committed WITH it,
    * resolved from ONE `_CURRENT` read — the consistent pair for
    * tables maintained by [[overwriteWithMeta]]. Separate
    * `getMeta`+`read` calls each resolve the pointer independently,
    * so a refresh landing between them can pair one snapshot's
    * properties with another's data; here both halves derive from the
    * same version (whose files are immutable and GC-graced one commit
    * cycle). Tables without a versioned sidecar at the current
    * version (legacy two-step writers, or a merge since the last
    * overwriteWithMeta) fall back to `(read, getMeta)` with that
    * pairing caveat.
    */
  def readSnapshotWithMeta(table: String): (DataFrame, Map[String, String]) = {
    // bounded retry (code review r16): a reader can resolve a version
    // whose sidecar was just GC'd because refreshes outpaced it —
    // falling back to the two-call pair THERE would silently re-open
    // the torn-pair window this method exists to close, so re-resolve
    // instead. But a current version that lacks a sidecar and is
    // STABLE across two looks (a plain overwrite/merge landed, or a
    // legacy putMeta table) is not a race: take the documented
    // two-call fallback — with exact-version getMeta that reads as
    // the table-level properties or unknown provenance, never a
    // superseded snapshot's label.
    var attempt = 0
    var lastV = Long.MinValue
    while (true) {
      val v = currentVersion(table).getOrElse(
        throw new IllegalStateException(s"no such table: $root/$table"))
      val mp = metaVPath(table, v)
      // tolerant sidecar read (review r16): a sidecar GC'd between
      // the exists probe and the read is the same outpacing race —
      // fall through to the retry instead of surfacing a raw
      // FileNotFoundException
      val sidecar =
        if (!fs.exists(mp)) None
        else try Some(parseMeta(readFully(mp)))
        catch { case _: java.io.FileNotFoundException => None }
      sidecar match {
        case Some(m) =>
          return (spark.read.option("recursiveFileLookup", "true")
            .parquet(versionDir(table, v)), m)
        case None =>
          if (v == lastV || metaVersions(table).isEmpty) {
            // STABLE sidecar-less version: pair the data with the
            // LEGACY table-level _META only — a plain getMeta here
            // could find a versioned sidecar a refresh committed
            // between our two calls and pair a FRESH label with this
            // resolution's older cells (review r16); legacy-absent
            // reads as unknown provenance, which is loud downstream.
            // And only for tables that never entered the sidecar era
            // (ADVICE r16, the getMeta rule): once any _META_v
            // exists, the legacy _META describes a superseded
            // snapshot — unknown provenance, never its stale label.
            val p = metaPath(table)
            val legacy =
              if (metaVersions(table).nonEmpty || !fs.exists(p))
                Map.empty[String, String]
              else parseMeta(readFully(p))
            return (read(table), legacy)
          }
          lastV = v
          attempt += 1
          if (attempt >= 5) throw new IllegalStateException(
            s"$root/$table: refreshes outpaced this reader $attempt times " +
              "(each resolved version's _META_v sidecar was replaced before " +
              "it could be read) — retry under a calmer refresh cadence")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** MERGE: rows in `updates` replace same-key rows in the current
    * snapshot; new keys are appended. `updates` must contain at most
    * one row per key (enforce upstream), matching the reference's
    * ON CONFLICT upsert semantics. Rewrites ONLY the buckets the
    * update keys hash into.
    */
  def merge(table: String, updates: DataFrame, key: String): Unit = {
    val nb = tableBuckets(table)
    if (!exists(table)) {
      // first write: bucketed from the start
      val v = 0L
      bucketedWrite(updates.withColumn("__bucket", bucketOf(key, nb)), key,
        versionDir(table, v), nb)
      val written = writtenBuckets(table, v)
      if (written.isEmpty) {
        // zero-row first merge: committing an empty bucket map would
        // make exists() true but read() impossible — leave the table
        // nonexistent instead
        fs.delete(new Path(versionDir(table, v)), true)
        return
      }
      commit(table, v, written, nb)
      return
    }
    val m = readBucketMap(table)
    // persisted: merge runs three actions over `updates` (touched-
    // bucket collect, the anti-join probe, the union write) — callers
    // should not have to know to pre-persist to avoid 3x upstream I/O
    val upd = updates.withColumn("__bucket", bucketOf(key, nb))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = upd.select("__bucket").distinct().collect().map(_.getInt(0)).toSet
      if (touched.isEmpty) return
      // additive schema evolution: updates carrying a column the table
      // lacks force a one-time FULL rewrite (the flat path below), so
      // every committed file shares the widened schema — rewriting
      // only touched buckets would leave mixed-schema bucket dirs and
      // read() projects whichever file's footer it samples. Footer
      // probe is driver-side and cheap next to the merge itself.
      val allPaths = bucketDataPaths(table, m)
      val curFields =
        if (allPaths.isEmpty) updates.columns.toSet
        else spark.read.option("recursiveFileLookup", "true")
          .parquet(allPaths: _*).schema.fieldNames.toSet
      val evolving = updates.columns.exists(!curFields.contains(_))
      // current rows of ONLY the touched buckets (a flat snapshot has
      // no bucket dirs yet — filter it by recomputed bucket; a schema
      // evolution rewrites everything like a flat snapshot)
      val flat = m.contains(-1) || evolving
      val curPaths = bucketDataPaths(table,
        if (flat) m else m.filter { case (b, _) => touched.contains(b) })
      val cur0 =
        if (curPaths.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            updates.schema)
        else spark.read.option("recursiveFileLookup", "true").parquet(curPaths: _*)
      // flat snapshots are fully re-bucketed on first merge (every row
      // must land in a bucket dir); bucketed snapshots only load and
      // rewrite the touched buckets
      val curAll = cur0.withColumn("__bucket", bucketOf(key, nb))
      val cur = if (flat) curAll else curAll.filter(col("__bucket").isin(touched.toSeq: _*))
      // null-safe anti join: a null-key update must REPLACE the
      // existing null-key row, not append a duplicate every merge
      // (plain equality never matches null = null)
      val kept = cur.join(upd.select(col(key).as("__mk")),
        cur(key) <=> col("__mk"), "left_anti")
      // schema evolution, additive only: a column newly produced by the
      // render path (e.g. search_token_counts) must not be silently
      // dropped when merging into a pre-existing table — widen KEPT
      // rows with nulls instead, so consumers see the column and can
      // coalesce legacy rows. An update missing a CURRENT column still
      // fails loudly in unionByName (a sign the caller regressed).
      val newCols = upd.columns.filterNot(cur.columns.contains)
      val keptWide = newCols.foldLeft(kept)((d, c) =>
        d.withColumn(c, org.apache.spark.sql.functions.lit(null).cast(upd.schema(c).dataType)))
      val next = keptWide.unionByName(upd)
      val v = currentVersion(table).get + 1L
      bucketedWrite(next, key, versionDir(table, v),
        if (flat) nb else touched.size)
      val written = writtenBuckets(table, v)
      // a flat snapshot must be fully re-bucketed on first merge (its
      // untouched rows were rewritten into v as well)
      val base = if (flat) Map.empty[Int, Long] else m
      commit(table, v, base -- touched ++ written, nb, m.values.toSet)
    } finally upd.unpersist()
  }

  /** Buckets actually present in a freshly written snapshot dir. */
  private def writtenBuckets(table: String, v: Long): Map[Int, Long] = {
    val dir = new Path(versionDir(table, v))
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("__bucket="))
      .map(n => n.stripPrefix("__bucket=").toInt -> v)
      .toMap
  }

  /** Delete rows whose key appears in `keys` — rewrites only the
    * touched buckets, like merge.
    */
  def delete(table: String, keys: DataFrame, key: String): Unit = {
    if (!exists(table)) return
    val nb = tableBuckets(table)
    val m = readBucketMap(table)
    val keyed = keys.select(key).withColumn("__bucket", bucketOf(key, nb))
    val touched = keyed.select("__bucket").distinct().collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return
    val flat = m.contains(-1)
    val curPaths = bucketDataPaths(table,
      if (flat) m else m.filter { case (b, _) => touched.contains(b) })
    if (curPaths.isEmpty) return
    val cur = spark.read.option("recursiveFileLookup", "true").parquet(curPaths: _*)
      .withColumn("__bucket", bucketOf(key, nb))
    val scoped = if (flat) cur else cur.filter(col("__bucket").isin(touched.toSeq: _*))
    // null-safe like merge: deleting a null key removes the null-key row
    val next = scoped.join(keyed.select(col(key).as("__dk")),
      scoped(key) <=> col("__dk"), "left_anti")
    val v = currentVersion(table).get + 1L
    bucketedWrite(next, key, versionDir(table, v),
      if (flat) nb else touched.size)
    val written = writtenBuckets(table, v)
    val base = if (flat) Map.empty[Int, Long] else m
    // touched buckets that became empty simply vanish from the map
    val next2 = base -- touched ++ written
    if (next2.isEmpty) {
      // every remaining row deleted: an empty table is a nonexistent
      // table (same invariant as the zero-row first merge) — a
      // committed empty bucket map would make exists() true while
      // read() throws
      drop(table)
    } else commit(table, v, next2, nb, m.values.toSet)
  }

  def drop(table: String): Unit = {
    val p = new Path(s"$root/$table")
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** GC snapshot dirs no bucket references. `prevReferenced` — the
    * versions the PREVIOUS bucket map pointed at — are retained for
    * one more commit cycle, so a reader that resolved its file
    * listing just before this commit still finds its data (the
    * standard one-commit grace; readers idle across multiple commits
    * need a longer retention policy, as with Delta VACUUM).
    */
  private def cleanOld(table: String, current: Long, bucketMap: Map[Int, Long],
      prevReferenced: Set[Long]): Unit = {
    val dir = new Path(s"$root/$table")
    if (!fs.exists(dir)) return
    val referenced = bucketMap.values.toSet ++ prevReferenced + current
    fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("v_")) {
        val v = name.stripPrefix("v_").toLong
        if (v < current - 1 && !referenced.contains(v)) fs.delete(st.getPath, true)
      }
    }
    // versioned _META sidecars: exact-version resolution (getMeta)
    // means only the current version's sidecar is live — keep it plus
    // one commit cycle of grace, mirroring the snapshot-dir policy,
    // so an in-flight consistent-pair reader still finds the sidecar
    // its pointer read implied
    metaVersions(table).filter(_ < current - 1)
      .foreach(w => fs.delete(metaVPath(table, w), false))
  }
}
