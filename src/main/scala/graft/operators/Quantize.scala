package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scalar int8 embedding quantization — the memory-bandwidth lever
  * for vector scans at 100 TB: a float32 corpus shrinks 4× (plus the
  * per-vector scale), so the brute-force ranking pass reads a quarter
  * of the bytes and the hot loop is integer MACs. The reference
  * ecosystem's analogue is pgvector's reduced-precision vector types;
  * the two-stage shape (quantized rank → exact rescore of a small
  * window) is the standard SQ recipe from the FAISS/ScaNN literature
  * (Johnson, Douze & Jégou 2017 describe the same coarse-then-refine
  * structure for IVF/PQ).
  *
  * Key property: quantization is per-vector symmetric (q_i =
  * round(v_i·127/maxAbs)), and a per-vector scalar CANCELS in cosine —
  * so the quantized rank order needs no dequantization at all: rank =
  * integer-dot / (√Σq² · √Σq²), all integer sums. That makes the
  * ranking stage bit-reproducible in DuckDB over the dumped int8
  * arrays (integer arithmetic has no summation-order issues), and the
  * rescore stage is the same exact CosineSimilarity every other ANN
  * oracle replays.
  */
object Quantize {

  /** Symmetric int8 quantization of one vector: values scaled so
    * maxAbs → ±127, round-half-up (matches `Math.round`), zero vector
    * → all zeros. Returns the codes; the scale is maxAbs/127 but is
    * deliberately NOT needed for cosine ranking.
    */
  def quantizeVec(v: Seq[Float]): Array[Byte] = {
    if (v == null || v.isEmpty) return Array.emptyByteArray
    var maxAbs = 0f
    v.foreach { x => val a = math.abs(x); if (a > maxAbs) maxAbs = a }
    if (maxAbs == 0f) return new Array[Byte](v.length)
    val out = new Array[Byte](v.length)
    var i = 0
    v.foreach { x =>
      out(i) = math.round(x * 127f / maxAbs).toByte
      i += 1
    }
    out
  }

  // Seq[Byte] (not Array[Byte]): the array form encodes as BINARY,
  // which the zip_with/aggregate HOFs reject — the Seq encodes as
  // array<tinyint>, the HOF-computable (and DuckDB TINYINT[]) shape.
  // A UDF, deliberately: the built-in equivalent needs maxAbs inside
  // the per-element transform lambda, and HOF lambdas re-evaluate
  // child expressions per element — array_max × d elements = O(d²)
  // arithmetic per vector vs this single pass. Encode runs at index
  // BUILD (and in the documented scan-form baseline query); the
  // indexed probes read persisted codes and stay UDF-free.
  val quantize = udf((v: Seq[Float]) => quantizeVec(v).toSeq)

  /** Integer cosine over two int8 code columns (array<tinyint>):
    * CAST-to-long element products, integer sums, one double division
    * — the exact expression the DuckDB oracle replays. Null/zero
    * norms → null (cosine undefined), like CosineSimilarity.
    */
  def int8Cosine(a: Column, b: Column): Column = {
    def dotL(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("long") * q.cast("long")),
      lit(0L), (acc, e) => acc + e)
    val dot = dotL(a, b)
    val na = dotL(a, a)
    val nb = dotL(b, b)
    val denom = sqrt(na.cast("double")) * sqrt(nb.cast("double"))
    when(denom === 0.0, lit(null).cast("double"))
      .otherwise(dot.cast("double") / denom)
  }

  /** Two-stage quantized top-k: rank the corpus on int8 cosine (4×
    * fewer bytes scanned), keep a `window` of candidates (exact
    * distributed top-k), then rescore ONLY those with exact float
    * cosine and return the true top `k`. `emb` needs (idCol, vecCol);
    * codes are computed in-line — a production table would persist
    * the code column next to the vectors and prune `vecCol` out of
    * the ranking scan entirely.
    */
  def quantizedTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, window: Int = 100): DataFrame = {
    val qCodes = quantizeVec(queryVec.toSeq).toSeq
    val ranked = emb
      .withColumn("__q8", quantize(col(vecCol)))
      .withColumn("__qcos", int8Cosine(col("__q8"), typedLit(qCodes)))
      .filter(col("__qcos").isNotNull)
      .orderBy(col("__qcos").desc, col(idCol).asc)
      .limit(window)
    ranked
      .select(col(idCol).as("id"),
        graft.functions.GraftFunctions.cosineSimilarity(col(vecCol), lit(queryVec))
          .as("cos"))
      .filter(col("cos").isNotNull)
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }
}
