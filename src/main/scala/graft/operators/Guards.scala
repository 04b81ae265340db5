package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Shared loud-failure guards for operator preconditions.
  *
  * Several operators hash `col(idCol).cast("long")` to drive
  * deterministic sampling / noise / partition routing (Hnsw partition
  * assignment, QualityFilter's negative sampler and Pareto keep rule,
  * Dsir's Gumbel keys, the mix_sample threshold). A null or
  * non-numeric id column makes that cast NULL, and a NULL predicate
  * silently drops every affected row — a degenerate result with no
  * error. These guards turn that failure class into an immediate,
  * named exception.
  */
private[graft] object Guards {

  /** Fail loudly if `idCol` contains nulls or non-numeric values.
    * Bounded probe: `limit(1)` after the try_cast filter, so the scan
    * stops at the first offending row (and reads only the id column).
    */
  def requireNumericIds(df: DataFrame, idCol: String, op: String,
      why: String = "the deterministic id-hash requires numeric ids"): Unit =
    require(df.filter(expr(s"try_cast(`$idCol` as bigint)").isNull)
        .limit(1).count() == 0,
      s"$op: null or non-numeric values in id column '$idCol' — $why")

  /** Reserved-output-name guard (ADVICE r16/r17): operators that ADD
    * columns must fail a clashing input at the call — duplicate
    * column names surface as ambiguous-reference errors far
    * downstream otherwise. One definition so the Dedup and
    * QualityCal guards cannot drift; `hint` appends a caller-specific
    * remedy (e.g. "or pass a different pctCol").
    */
  def requireNoReserved(columns: Seq[String], op: String, hint: String,
      reserved: String*): Unit = {
    val clash = reserved.filter(columns.contains)
    require(clash.isEmpty,
      s"$op: input frame already carries reserved column(s) " +
        s"${clash.mkString(", ")} — rename them upstream$hint; the " +
        "operator writes these names")
  }
}
