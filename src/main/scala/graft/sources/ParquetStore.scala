package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot-versioned Parquet table with upsert (MERGE) semantics.
  *
  * The reference upserts embeddings with
  * `INSERT ... ON CONFLICT (pkey) DO UPDATE` (worker/src/ops.rs:8-70)
  * and bulk update-joins (worker/src/ops.rs:95-160). Spark+Parquet has
  * no in-place upsert, so each merge writes a new immutable snapshot
  * directory `v_<n>` and atomically flips a `_CURRENT` pointer file —
  * readers never observe a partial write, and a failed merge leaves
  * the previous snapshot intact (idempotent-retry safe, which is what
  * makes the streaming path's at-least-once delivery correct,
  * SURVEY §7.4).
  *
  * Scale posture: the merge itself is `existing LEFT ANTI JOIN
  * updates` + union — one shuffle on the key, the same shape a Delta
  * Lake / Iceberg MERGE executes. On a production cluster this class
  * is swapped for Delta `MERGE INTO` (same call signature); the
  * engine's call sites depend only on `read`/`merge`/`overwrite`.
  */
final class ParquetStore(spark: SparkSession, root: String) extends Serializable {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def pointer(table: String) = new Path(s"$root/$table/_CURRENT")
  private def versionDir(table: String, v: Long) = s"$root/$table/v_$v"

  def currentVersion(table: String): Option[Long] = {
    val p = pointer(table)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  def exists(table: String): Boolean = currentVersion(table).isDefined

  def read(table: String): DataFrame =
    currentVersion(table) match {
      case Some(v) => spark.read.parquet(versionDir(table, v))
      case None => throw new IllegalStateException(s"no such table: $root/$table")
    }

  def readOrEmpty(table: String, like: DataFrame): DataFrame =
    if (exists(table)) read(table)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)

  private def flip(table: String, v: Long): Unit = {
    val tmp = new Path(s"$root/$table/_CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // Overwriting rename (posix/HDFS rename onto an existing file is
    // atomic): the pointer is NEVER absent once created — a crash or
    // concurrent reader at any point observes either the old or the
    // new version, unlike a delete-then-rename window.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(pointer(table)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Full overwrite (initial backfill / small dimension tables). */
  def overwrite(table: String, df: DataFrame): Unit = {
    val v = currentVersion(table).getOrElse(-1L) + 1L
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(table, v))
    flip(table, v)
    cleanOld(table, v)
  }

  /** MERGE: rows in `updates` replace same-key rows in the current
    * snapshot; new keys are appended. `updates` must contain at most
    * one row per key (enforce upstream), matching the reference's
    * ON CONFLICT upsert semantics.
    */
  def merge(table: String, updates: DataFrame, key: String): Unit = {
    if (!exists(table)) { overwrite(table, updates); return }
    val cur = read(table)
    val kept = cur.join(updates.select(key), Seq(key), "left_anti")
    val next = kept.unionByName(updates.select(cur.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*))
    val v = currentVersion(table).get + 1L
    next.write.mode(SaveMode.Overwrite).parquet(versionDir(table, v))
    flip(table, v)
    cleanOld(table, v)
  }

  /** Delete rows whose key appears in `keys`. */
  def delete(table: String, keys: DataFrame, key: String): Unit = {
    if (!exists(table)) return
    val cur = read(table)
    val next = cur.join(keys.select(key), Seq(key), "left_anti")
    val v = currentVersion(table).get + 1L
    next.write.mode(SaveMode.Overwrite).parquet(versionDir(table, v))
    flip(table, v)
    cleanOld(table, v)
  }

  def drop(table: String): Unit = {
    val p = new Path(s"$root/$table")
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Keep the latest 2 snapshots (previous one covers in-flight readers). */
  private def cleanOld(table: String, current: Long): Unit = {
    val dir = new Path(s"$root/$table")
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("v_")) {
        val v = name.stripPrefix("v_").toLong
        if (v < current - 1) fs.delete(st.getPath, true)
      }
    }
  }
}
