package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of (temporal) join: for each left row, the single most recent
  * right row at-or-before its timestamp within the same key — the
  * canonical event-enrichment operator (attribution, market-data
  * alignment, feature lookback at label time). Spark has no built-in,
  * and the naive formulation (`l JOIN r ON key AND r.ts <= l.ts`,
  * then max-per-left) explodes to O(|L|·|R|) rows per key before the
  * reduction — unusable at scale on active keys.
  *
  * Implemented with the union + running-last trick: tag both sides,
  * union them, shuffle ONCE on the key, sort each partition by
  * (ts, side), and carry the right payload forward with
  * `last(payload, ignoreNulls)` over an unbounded-preceding running
  * window; left rows then read the latest right values directly.
  * Cost is one shuffle + one sort over |L|+|R| rows regardless of
  * time-range density — the same shape Flink's temporal join and
  * kdb's `aj` compile to. Skewed keys split fine under AQE because
  * everything after the shuffle is a plain window scan.
  */
object AsOf {

  /** Left join semantics: every left row survives; payload columns are
    * null when the key has no right row at-or-before `ts`. Inclusive:
    * a right row at exactly left.ts matches (right sorts before left
    * on the tie). `rightPayload` names the right-side columns to carry
    * (they must not collide with left column names — rename on the
    * right first); rows of `right` must be unique per (key, ts) or
    * the carried value among equal-ts right rows is undefined, same
    * contract as DuckDB/QuestDB ASOF — pre-dedup with a max-agg when
    * the source can tie.
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val leftCols = left.columns.toSeq
    require(rightPayload.forall(!leftCols.contains(_)),
      s"right payload ${rightPayload.mkString(",")} collides with left columns")
    Seq("__side", "__pl").foreach(r =>
      require(!leftCols.contains(r) && !right.columns.contains(r),
        s"column name $r is reserved by AsOf.join — rename it upstream"))
    // common layout: key, ts, __side (0 = right so ties sort first),
    // __pl = the payload fields wrapped in ONE struct that is non-null
    // on every right row — carrying fields individually with
    // last(ignoreNulls) would skip a right row whose payload VALUE is
    // null and resurrect an older, stale value, where ASOF semantics
    // say the latest matching ROW wins even if its payload is null
    val rightTagged = right.select(
      col(keyCol), col(tsCol), lit(0).as("__side"),
      struct(rightPayload.map(col): _*).as("__pl"))
    val payloadType = rightTagged.schema("__pl").dataType
    val leftTagged = left.select(
      (col(keyCol) +: col(tsCol) +: lit(1).as("__side") +:
        lit(null).cast(payloadType).as("__pl") +:
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightTagged.unionByName(leftTagged, allowMissingColumns = true)
      .withColumn("__pl", last(col("__pl"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(p => col(s"__pl.$p").as(p))): _*)
  }
}
