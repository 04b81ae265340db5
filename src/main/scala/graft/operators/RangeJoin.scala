package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Range (interval) join: match each point row to the interval rows
  * containing its timestamp, optionally within equi-key groups —
  * point-in-session attribution, effective-dated dimension lookup,
  * genomic overlap. Spark executes a raw
  * `ON p.ts BETWEEN i.start AND i.end` as BroadcastNestedLoopJoin
  * (or a cartesian per key): O(|P|·|I|) compared rows. The binned
  * formulation makes it an equi-join: intervals are replicated to
  * every fixed-width time bin they overlap, points hash to their
  * single bin, and the join key is (keys…, bin) with an exact
  * containment filter after — candidate volume is |P| + Σ interval
  * spans/binWidth, never a cross product.
  *
  * A point lives in exactly ONE bin, so a matching (point, interval)
  * pair meets in exactly one bin copy — no post-join dedup shuffle.
  *
  * binWidth tunes the replication/selectivity trade: ≈ the typical
  * interval span keeps replication ≲2× while a bin only holds
  * intervals that could match its points. Long-tail intervals
  * replicate proportionally to their span (an interval spanning the
  * whole corpus appears in every bin — cap spans upstream if that
  * shape exists). Skewed bins stay AQE-splittable: everything after
  * the shuffle is a plain filter.
  */
object RangeJoin {

  /** Inclusive on both ends (`start <= ts <= end`, the SQL BETWEEN
    * contract the DuckDB oracle replays). Column names of `points`
    * and `intervals` must be disjoint apart from `keyCols` (rename
    * upstream); the result carries points.* then intervals.* minus
    * the duplicated keys. Inner-join semantics: unmatched points drop
    * out.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTs: String, startCol: String, endCol: String,
      keyCols: Seq[String] = Nil, binWidth: Long = 3600000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "column name __bin is reserved by RangeJoin — rename it upstream")
    def bin(c: Column): Column = floor(c / binWidth)
    val p = points.withColumn("__bin", bin(col(pointTs)))
    val i = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(pointTs).between(col(startCol), col(endCol)))
      .drop("__bin")
  }
}
