package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r17 single-pass keep-first family:
  * [[Dedup.exactKeepDecision]] (narrow localCheckpointed decision),
  * [[Dedup.exactKeepFirst]] (payload carried THROUGH the aggregate,
  * no join-back), [[Dedup.exactCanonical]] (full-row annotation via
  * one id-keyed join), and the reserved-output-name guards (ADVICE
  * r16: a clashing input must fail loudly at the call, not as an
  * ambiguous reference downstream).
  */
class KeepFirstSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs() = {
    import spark.implicits._
    Seq(
      (5L, "Alpha  Beta", "en", 0.9),
      (2L, "alpha beta ", "de", 0.7),
      (9L, " ALPHA BETA", "en", 0.1),
      (3L, "gamma", "fr", 0.5),
      (7L, null.asInstanceOf[String], "en", 0.2),
      (8L, null.asInstanceOf[String], "de", 0.4)
    ).toDF("doc_id", "text", "lang", "quality")
  }

  test("exactKeepDecision: canonical min id + group size, null texts one group") {
    val got = Dedup.exactKeepDecision(docs(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (5L, 2L, 3L), (2L, 2L, 3L), (9L, 2L, 3L), // whitespace/case fold
      (3L, 3L, 1L),
      (7L, 7L, 2L), (8L, 7L, 2L)))               // null-text group
  }

  test("exactKeepFirst: one survivor per group carrying ITS OWN payload") {
    val got = Dedup.exactKeepFirst(docs(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    // min-id row's lang/quality, never another member's
    assert(got == Set(
      (2L, "de", 0.7, 3L),
      (3L, "fr", 0.5, 1L),
      (7L, "en", 0.2, 2L)))
    // text is consumed by the group key and must not come back
    assert(!Dedup.exactKeepFirst(docs(), "doc_id", "text")
      .columns.contains("text"))
  }

  test("exactKeepFirst equals exactCanonical's survivor slice") {
    val viaCanonical = Dedup.exactCanonical(docs(), "doc_id", "text")
      .filter(col("doc_id") === col("canonical_id"))
      .select("doc_id", "lang", "quality", "group_size")
      .collect().map(_.toSeq).toSet
    val viaKeepFirst = Dedup.exactKeepFirst(docs(), "doc_id", "text")
      .select("doc_id", "lang", "quality", "group_size")
      .collect().map(_.toSeq).toSet
    assert(viaKeepFirst == viaCanonical)
  }

  test("exactCanonical: every row annotated, all input columns preserved") {
    val out = Dedup.exactCanonical(docs(), "doc_id", "text")
    assert(out.columns.toSeq ==
      Seq("doc_id", "text", "lang", "quality", "canonical_id", "group_size"))
    assert(out.count() == 6)
    val nine = out.filter(col("doc_id") === 9L).head()
    assert(nine.getAs[Long]("canonical_id") == 2L)
    assert(nine.getAs[String]("text") == " ALPHA BETA",
      "the row keeps its own raw text, not the canonical's")
  }

  test("null-id rows never carry through exactKeepFirst (review r17)") {
    // a bare min(struct(id, ...)) sorts a null id FIRST where min(id)
    // skips nulls — the family members would disagree on the
    // canonical row. The guarded carry must skip null-id rows (while
    // still counting them) and drop an all-null-id group entirely,
    // exactly like exactCanonical's survivor slice, where
    // null === canonical_id can never keep a row.
    import spark.implicits._
    val df = Seq(
      (Some(5L), "same text", "en", 0.9),
      (Option.empty[Long], "same  TEXT", "de", 0.1),
      (Option.empty[Long], "only null group", "fr", 0.2)
    ).toDF("doc_id", "text", "lang", "quality")
    val kf = Dedup.exactKeepFirst(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(kf == Set((5L, "en", 0.9, 2L)),
      "the null-id member must not win the group; the all-null group " +
        "must yield no survivor")
    val canonical = Dedup.exactCanonical(df, "doc_id", "text")
      .filter(col("doc_id") === col("canonical_id"))
      .select("doc_id", "lang", "quality", "group_size")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(kf == canonical, "family equivalence must hold under null ids")
  }

  test("exactCanonical: several null-id rows neither multiply nor cross-annotate") {
    // review r17: an id-keyed join-back against the per-ROW decision
    // matched every null-id row to every null-id decision row — 3
    // input rows became 5, and 'only null group' borrowed the other
    // group's canonical. The hash-keyed join against the per-HASH
    // groups frame is multiplication-free by key uniqueness.
    import spark.implicits._
    val df = Seq(
      (Some(5L), "same text", "en", 0.9),
      (Option.empty[Long], "same  TEXT", "de", 0.1),
      (Option.empty[Long], "only null group", "fr", 0.2)
    ).toDF("doc_id", "text", "lang", "quality")
    val out = Dedup.exactCanonical(df, "doc_id", "text")
    assert(out.count() == 3, "row count must be preserved")
    val got = out.select("lang", "canonical_id", "group_size")
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("en", Some(5L), 2L),
      ("de", Some(5L), 2L),          // null-id member of the 5L group
      ("fr", None, 1L)),             // its own group: no non-null min
      s"each row must carry ITS OWN group's annotation, got $got")
  }

  test("reserved output names fail loudly at the call (ADVICE r16)") {
    val clash = docs().withColumn("canonical_id", lit(0L))
    val e = intercept[IllegalArgumentException] {
      Dedup.exactCanonical(clash, "doc_id", "text")
    }
    assert(e.getMessage.contains("canonical_id"))
    val clash2 = docs().withColumn("group_size", lit(0L))
    intercept[IllegalArgumentException] {
      Dedup.exactKeepFirst(clash2, "doc_id", "text")
    }
    intercept[IllegalArgumentException] {
      Dedup.exactKeepDecision(clash2, "doc_id", "text")
    }
  }
}
