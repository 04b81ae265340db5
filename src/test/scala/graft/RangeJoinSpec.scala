package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned point-in-interval join: BETWEEN inclusivity at both ends,
  * bin-spanning intervals, key isolation, no duplicate matches — then
  * parity with the naive BETWEEN join on real events.
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("inclusive bounds, key isolation, and bin-spanning intervals") {
    import spark.implicits._
    val points = Seq(
      (1L, 1L, 100L),  // == start → match
      (2L, 1L, 250L),  // == end → match
      (3L, 1L, 99L),   // just before → no match
      (4L, 1L, 251L),  // just after → no match
      (5L, 2L, 150L),  // right ts, wrong key → no match
      (6L, 1L, 5000L)  // inside the wide interval (spans many bins)
    ).toDF("point_id", "k", "ts")
    val intervals = Seq(
      (1L, 10L, 100L, 250L),
      (1L, 11L, 4000L, 9000L) // spans 50 bins at width 100
    ).toDF("k", "interval_id", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "ts", "s", "e",
        keyCols = Seq("k"), binWidth = 100L)
      .select("point_id", "interval_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (6L, 11L)))
  }

  test("a pair matches exactly once even when the interval spans bins") {
    import spark.implicits._
    val points = Seq((1L, 1L, 500L)).toDF("point_id", "k", "ts")
    val intervals = Seq((1L, 10L, 0L, 1000L)).toDF("k", "interval_id", "s", "e")
    val rows = RangeJoin.pointInInterval(points, intervals, "ts", "s", "e",
      keyCols = Seq("k"), binWidth = 10L).collect()
    assert(rows.length == 1, "point hashes to one bin → one candidate row")
  }

  test("inverted intervals (start > end) match nothing") {
    import spark.implicits._
    val points = Seq((1L, 1L, 100L)).toDF("point_id", "k", "ts")
    val intervals = Seq((1L, 10L, 200L, 50L)).toDF("k", "interval_id", "s", "e")
    assert(RangeJoin.pointInInterval(points, intervals, "ts", "s", "e",
      keyCols = Seq("k"), binWidth = 100L).count() == 0)
  }

  test("randomized parity with an in-memory model (negative ts, odd widths)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 8).foreach { trial =>
      val points = (0 until 40).map(i =>
        (i.toLong, rnd.nextInt(3).toLong, (rnd.nextInt(400) - 200).toLong))
      val intervals = (0 until 15).map { i =>
        val s = (rnd.nextInt(400) - 200).toLong
        (rnd.nextInt(3).toLong, i.toLong, s, s + rnd.nextInt(120).toLong)
      }
      val binWidth = 1L + rnd.nextInt(97)
      val got = RangeJoin.pointInInterval(
          points.toDF("point_id", "k", "ts"),
          intervals.toDF("k", "interval_id", "s", "e"),
          "ts", "s", "e", keyCols = Seq("k"), binWidth = binWidth)
        .select("point_id", "interval_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val expected = (for {
        (pid, pk, ts) <- points
        (ik, iid, s, e) <- intervals
        if pk == ik && ts >= s && ts <= e
      } yield (pid, iid)).sorted
      assert(got == expected, s"trial $trial (binWidth=$binWidth) diverged")
    }
  }

  test("plans as an equi-join — no nested-loop/cartesian anywhere") {
    import spark.implicits._
    val points = (0 until 100).map(i => (i.toLong, (i % 5).toLong, i.toLong * 7))
      .toDF("point_id", "k", "ts")
    val intervals = (0 until 20).map(i => (i.toLong % 5, i.toLong, i * 30L, i * 30L + 100))
      .toDF("k", "interval_id", "s", "e")
    val plan = RangeJoin.pointInInterval(points, intervals, "ts", "s", "e",
      keyCols = Seq("k"), binWidth = 50L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join, plan was:\n$plan")
  }

  test("parity with the naive BETWEEN join on real events") {
    val got = Queries.rIntervalJoin(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    // naive: unbinned BETWEEN join over the same sessions
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val tagged = Queries.rSessionize(spark, "/root/testdata/sf0.001")
      .select(col("user_id").as("su"), col("sess_id"),
        col("start_ms"), col("end_ms"))
    val err = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), Queries.eventTsMs(events).as("ts_ms"))
    val naive = err.join(tagged, err("user_id") === tagged("su") &&
        err("ts_ms").between(col("start_ms"), col("end_ms")))
      .select("event_id", "sess_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty && got == naive)
    // every error event is a session member → total attribution
    assert(got.size == err.count())
  }
}
