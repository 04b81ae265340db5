package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The testdata generator has shipped `events.ts` in two different
  * parquet encodings so far (TIMESTAMP(NANOS) → long under
  * nanosAsLong, then timestamp[us] NTZ), and a change of encoding
  * once silently broke every event-time query (r10). This spec stops
  * the dependence on the generator's choice: the SAME logical rows
  * are written as long-nanos, timestamp (instant), and timestamp_ntz
  * parquet, and all five event-time queries must return identical
  * results on each — [[Queries.eventTsMs]]/[[Queries.eventTsUs]] are
  * the single dispatch point under test.
  */
class EventTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cutoffUs = 1704240000000000L // 2024-01-03T00:00:00Z

  /** Deterministic fixture: ~37-min steps across ~7 days (straddles
    * the s2 cutoff, forces >30-min session gaps), sub-ms µs jitter,
    * plus two boundary rows — one exactly AT the cutoff (must be
    * excluded) and one 500 µs after it (same millisecond; must be
    * included — this is what forces the filter to µs resolution).
    */
  private lazy val baseRows: Seq[(Long, Long, String, Double, Long)] = {
    val gen = (0 until 300).map { i =>
      val us = 1704067200000000L + i.toLong * 37L * 60L * 1000000L + (i % 13) * 777L
      (i.toLong, (i % 7).toLong, Seq("click", "purchase", "error", "view")(i % 4),
        (i % 50) / 7.0, us)
    }
    gen :+ (1000L, 0L, "click", 1.0, cutoffUs) :+ (1001L, 0L, "click", 1.0, cutoffUs + 500L)
  }

  private def writeEncodings(): Map[String, String] = {
    val df = baseRows.toDF("event_id", "user_id", "event_type", "value", "ts_us")
    def out(name: String, ts: DataFrame => DataFrame): (String, String) = {
      val dir = TestSpark.tempDir(s"graft_evt_${name}_")
      ts(df).select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      name -> dir
    }
    Map(
      out("nanos", _.withColumn("ts", col("ts_us") * 1000L)),
      out("micros_tz", _.withColumn("ts", timestamp_micros(col("ts_us")))),
      // TS→NTZ cast is exact under the UTC session timezone TestSpark pins
      out("micros_ntz", _.withColumn("ts",
        timestamp_micros(col("ts_us")).cast("timestamp_ntz"))))
  }

  private val queries = Seq("s2_delta_scan_append", "r_windowed_counts",
    "r_sessionize", "r_asof_join", "r_interval_join")

  test("all five event-time queries agree across the three ts encodings") {
    val dirs = writeEncodings()
    // sanity: the three dirs really carry three distinct physical types
    val types = dirs.values.map(d =>
      spark.read.parquet(s"$d/events.parquet").schema("ts").dataType.typeName).toSet
    assert(types == Set("long", "timestamp", "timestamp_ntz"),
      s"fixture encodings collapsed: $types")
    for (q <- queries) {
      val results = dirs.map { case (enc, d) =>
        enc -> SparkEntry.queries(q)(spark, d).collect().toSeq
      }
      val (refEnc, ref) = results.head
      assert(ref.nonEmpty, s"$q returned no rows on $refEnc")
      for ((enc, got) <- results.tail)
        assert(got == ref, s"$q diverged between $refEnc and $enc")
    }
  }

  test("s2 watermark filter resolves at µs, not ms") {
    val dirs = writeEncodings()
    for ((enc, d) <- dirs) {
      val ids = Queries.s2DeltaScanAppend(spark, d)
        .select("event_id").as[Long].collect().toSet
      assert(!ids.contains(1000L), s"[$enc] event AT the cutoff must be excluded")
      assert(ids.contains(1001L),
        s"[$enc] event 500µs past the cutoff (same ms) must be included")
    }
  }

  test("s2 on long-nanos data resolves at ns: cutoff + 1ns is included") {
    // only the nanos encoding can represent sub-µs instants; flooring
    // to µs before the strict compare would wrongly exclude this row
    // (the DuckDB TIMESTAMP_NS oracle compares at ns and keeps it)
    val dir = TestSpark.tempDir("graft_evt_subus_")
    baseRows.toDF("event_id", "user_id", "event_type", "value", "ts_us")
      .withColumn("ts", col("ts_us") * 1000L)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .union(Seq((2000L, cutoffUs * 1000L + 1L, 0L, "click", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ids = Queries.s2DeltaScanAppend(spark, dir)
      .select("event_id").as[Long].collect().toSet
    assert(ids.contains(2000L), "event 1ns past the cutoff must be included")
    assert(!ids.contains(1000L), "event AT the cutoff stays excluded")
  }
}
