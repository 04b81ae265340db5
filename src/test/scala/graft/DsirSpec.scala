package graft

import graft.operators.Dsir
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance weighting (Dsir.importanceWeights): documents
  * resembling the target corpus must out-score documents that don't,
  * and more shared evidence must score higher. The exact arithmetic
  * is DuckDB-oracled (dsir_weights / dsir_sample); this spec pins the
  * semantic direction the oracle alone can't express.
  */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("target-resembling docs out-score disjoint docs, monotone in evidence") {
    import spark.implicits._
    val target = Seq(
      (100L, "distributed query engines optimize shuffle joins across partitioned storage"),
      (101L, "query engines push filters into partitioned storage for shuffle efficiency"))
      .toDF("doc_id", "text")
    val raw = Seq(
      // heavy overlap with target vocabulary
      (1L, "distributed query engines optimize shuffle joins across partitioned storage daily"),
      // partial overlap
      (2L, "partitioned storage helps gardeners catalog heirloom tomato seed varieties"),
      // disjoint vocabulary
      (3L, "heirloom tomato seedlings need morning sun gentle watering and patience"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text", n = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("logw")).toMap
    assert(w.keySet == Set(1L, 2L, 3L))
    assert(w(1L) > w(2L) && w(2L) > w(3L),
      s"weights must order by target resemblance: $w")
    // absolute sign is smoothing-dependent at fixture scale; the
    // separation BETWEEN the quoting and disjoint docs is the signal
    assert(w(1L) - w(3L) > 2.0,
      s"quoting vs disjoint separation must be decisive: $w")
  }

  test("gumbel keys are deterministic and strictly perturb the weight") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 0.5), (2L, 0.5), (3L, -1.0)).toDF("id", "logw")
      .select(col("id"), Dsir.gumbelKey(col("logw"), col("id")).as("g"))
    val a = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b, "same ids must draw the same noise")
    assert(a(1L) != a(2L), "equal weights, different ids must separate")
  }
}
