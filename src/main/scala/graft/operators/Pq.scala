package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Product quantization (Jégou, Douze & Schmid 2011) with asymmetric
  * distance scoring — the aggressive-compression companion to the
  * int8 scalar path in [[Quantize]]: the vector is split into `m`
  * subvectors, each mapped to its nearest per-subspace centroid, so a
  * 64-float (256-byte) embedding becomes `m` one-byte codes (32× at
  * m=8). Ranking reads codes only; the query is never quantized
  * (asymmetric): per-subspace dot products against the `k` centroids
  * form an m×k lookup table on the driver, and a candidate's score is
  * Σ_m table(m)(code_m) — m array lookups and adds per vector, no
  * float-vector bytes touched until the exact rescore of the window.
  *
  * Determinism contract (what makes this hash-oracle-able): the
  * lookup-table terms are summed as DECIMAL(28,12) in a fixed
  * traversal, so the total is addition-order-independent and the
  * DuckDB replay over the dumped codes + dumped table reproduces the
  * ranking bit-exactly; the rescore is the same exact CosineSimilarity
  * every other ANN oracle replays.
  *
  * Training reuses [[Ann.ivfCentroids]] (L2 Lloyd's, deterministic
  * smallest-id init) once per subspace; codebooks are driver-small
  * (m·k·subDim floats) by construction.
  */
object Pq {

  /** Per-subspace codebooks: codebooks(s)(c) is centroid c of
    * subspace s, each of length subDim.
    */
  final case class Codebooks(subDim: Int, books: Array[Array[Array[Float]]]) {
    def m: Int = books.length
    def k: Int = books.headOption.map(_.length).getOrElse(0)
  }

  /** Train per-subspace codebooks over the corpus: subspace s covers
    * vector positions [s·subDim, (s+1)·subDim). dim must divide
    * evenly into m.
    */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iterations: Int = 3): Codebooks = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val books = (0 until m).map { s =>
      val sub = emb.select(col(idCol),
        slice(col(vecCol), s * subDim + 1, subDim).as("__sub"))
      Ann.ivfCentroids(sub, idCol, "__sub", k, iterations)
        .sortBy(_._1).map(_._2)
    }.toArray
    Codebooks(subDim, books)
  }

  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  /** Encode one vector: per-subspace argmin-L2 centroid id (ties →
    * lowest code, the same order as Ann.nearestCentroidUdf's
    * broadcast argmin). Null or wrong-dimension vectors encode to
    * null (excluded from ranking, like null cosine).
    */
  def encodeVec(v: Seq[Float], cb: Codebooks): Array[Byte] = {
    if (v == null || v.length != cb.m * cb.subDim) return null
    val arr = v.toArray
    val out = new Array[Byte](cb.m)
    var s = 0
    while (s < cb.m) {
      val sub = java.util.Arrays.copyOfRange(arr, s * cb.subDim, (s + 1) * cb.subDim)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.books(s).length) {
        val d = l2(sub, cb.books(s)(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** The m×k asymmetric-distance lookup table for one query: entry
    * (s, c) is the dot product of the query's subvector s with
    * centroid c of subspace s, in double. Driver-side — m·k dots over
    * a driver-small codebook.
    */
  def adcTable(queryVec: Array[Float], cb: Codebooks): Array[Array[Double]] =
    (0 until cb.m).map { s =>
      val sub = java.util.Arrays.copyOfRange(queryVec, s * cb.subDim, (s + 1) * cb.subDim)
      cb.books(s).map { c =>
        var d = 0.0; var i = 0
        while (i < sub.length) { d += sub(i).toDouble * c(i); i += 1 }
        d
      }
    }.toArray

  /** ADC score column over a code column (array<tinyint> of length m):
    * Σ_s table(s)(code_s), terms cast to DECIMAL(28,12) before the
    * fold so the sum is addition-order-independent (bit-reproducible
    * in the DuckDB replay). Null codes → null score.
    */
  def adcScore(codesCol: Column, table: Array[Array[Double]]): Column = {
    val tableLit = typedLit(table.map(_.toSeq).toSeq)
    val terms = transform(sequence(lit(0), lit(table.length - 1)), i =>
      element_at(element_at(tableLit, i + 1),
        element_at(codesCol, i + 1).cast("int") + 1).cast("decimal(28,12)"))
    aggregate(terms, lit(BigDecimal(0)).cast("decimal(28,12)"),
      (acc, x) => (acc + x).cast("decimal(28,12)")).cast("double")
  }

  // Seq[Byte] encodes as array<tinyint> (the HOF-addressable and
  // DuckDB TINYINT[] shape); Array[Byte] would encode as BINARY.
  // A UDF, deliberately: per-subspace argmin over m·k centroids is a
  // tight driver-closure loop with no built-in equivalent short of
  // m·k struct-least chains re-evaluating slices per comparison; it
  // runs only at index build, never at probe time.
  private def encodeUdf(cb: Codebooks) =
    udf((v: Seq[Float]) => Option(encodeVec(v, cb)).map(_.toSeq))

  /** Build and persist a PQ index:
    * `path/codes`     = (idCol, pq array<tinyint>) — m bytes/vector,
    * `path/codebooks` = (s, c, centroid) for probe-time table builds.
    */
  def buildPqIndex(emb: DataFrame, idCol: String, vecCol: String,
      path: String, m: Int, k: Int, iterations: Int = 3): Unit = {
    val spark = emb.sparkSession
    val cb = train(emb, idCol, vecCol, m, k, iterations)
    emb.select(col(idCol), encodeUdf(cb)(col(vecCol)).as("pq"))
      .write.mode("overwrite").parquet(s"$path/codes")
    import spark.implicits._
    (for { s <- 0 until cb.m; c <- 0 until cb.k }
      yield (s, c, cb.books(s)(c).toSeq))
      .toDF("s", "c", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    Seq(Tuple1(cb.subDim)).toDF("sub_dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load the driver-small codebooks of a persisted index. */
  def loadCodebooks(spark: SparkSession, path: String): Codebooks = {
    val subDim = spark.read.parquet(s"$path/meta").head().getInt(0)
    val rows = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val books = rows.groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))
    Codebooks(subDim, books)
  }

  // ---------------------------------------------------------------
  // IVF-PQ (IVFADC, Jégou et al. 2011 §IV): coarse cells prune the
  // scan, PQ codes encode the RESIDUAL v - coarseCentroid(v). For
  // dot-product scoring the two decompose exactly:
  //   dot(q, v) ≈ dot(q, c_cell) + Σ_m table(m)(code_m)
  // — a per-cell constant plus the same lookup-table sum as flat PQ,
  // so probing reads nProbe cells' m-byte codes and touches no float
  // vectors until the rescore. Residual encoding matters: residuals
  // are small and cell-centered, so the same k centroids quantize
  // them far better than raw vectors.
  // ---------------------------------------------------------------

  private def residUdf(coarse: Map[Int, Array[Float]]) =
    udf((v: Seq[Float], cell: Int) =>
      Option(v).map { vv =>
        val c = coarse(cell)
        vv.indices.map(i => vv(i) - c(i))
      })

  /** Build and persist an IVF-PQ index:
    * `path/codes`     = (idCol, pq) partitioned by cell,
    * `path/coarse`    = (cell, centroid),
    * `path/codebooks` + `path/meta` as in [[buildPqIndex]] (trained
    * on residuals). Training scans the corpus per subspace; at
    * production scale both k-means stages run on a sample — the
    * encode pass is the only full scan that matters.
    */
  def buildIvfPqIndex(emb: DataFrame, idCol: String, vecCol: String,
      path: String, nCells: Int, m: Int, k: Int, iterations: Int = 3): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val coarse = Ann.ivfCentroids(emb, idCol, vecCol, nCells, iterations)
    val resid = Ann.assignCells(emb, vecCol, coarse)
      .withColumnRenamed("__cell", "cell")
      .withColumn("__resid", residUdf(coarse.toMap)(col(vecCol), col("cell")))
      .select(col(idCol), col("cell"), col("__resid"))
      .persist()
    try {
      val cb = train(resid, idCol, "__resid", m, k, iterations)
      resid.select(col(idCol), col("cell"),
          encodeUdf(cb)(col("__resid")).as("pq"))
        .write.partitionBy("cell").mode("overwrite").parquet(s"$path/codes")
      coarse.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/coarse")
      (for { s <- 0 until cb.m; c <- 0 until cb.k }
        yield (s, c, cb.books(s)(c).toSeq))
        .toDF("s", "c", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
      Seq(Tuple1(cb.subDim)).toDF("sub_dim")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    } finally resid.unpersist()
  }

  /** dot(q, centroid) per probed cell — the constant term of the
    * IVFADC decomposition, driver-side over nProbe centroids.
    */
  def cellConstants(queryVec: Array[Float],
      coarse: Array[(Int, Array[Float])], cells: Array[Int]): Map[Int, Double] = {
    val byCell = coarse.toMap
    cells.map { c =>
      val v = byCell(c)
      var d = 0.0; var i = 0
      while (i < v.length) { d += queryVec(i).toDouble * v(i); i += 1 }
      c -> d
    }.toMap
  }

  /** IVF-PQ probe: nearest nProbe cells by coarse centroid
    * (driver-side argmin), ADC over ONLY those cells' codes
    * (PartitionFilters prune the rest; the scan reads m bytes per
    * vector), per-cell constant added, window cut, exact rescore via
    * broadcast join. The ranking score is a double sum of the
    * decimal-folded table term and the dumped cell constant — both
    * sides of the oracle compute the identical two doubles and add
    * them once, so the cut is bit-exact.
    */
  def ivfPqTopK(spark: SparkSession, path: String, emb: DataFrame,
      idCol: String, vecCol: String, queryVec: Array[Float],
      k: Int, nProbe: Int = 4, window: Int = 100): DataFrame = {
    val coarse = spark.read.parquet(s"$path/coarse").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val cb = loadCodebooks(spark, path)
    val probeCells = Ann.nearestCells(coarse, queryVec, nProbe)
    val table = adcTable(queryVec, cb)
    val consts = cellConstants(queryVec, coarse, probeCells)
    val ranked = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probeCells.toIndexedSeq: _*))
      .select(col(idCol), col("cell"), adcScore(col("pq"), table).as("__adc"))
      .filter(col("__adc").isNotNull)
      .withColumn("__score",
        col("__adc") + element_at(typedLit(consts), col("cell")))
      .orderBy(col("__score").desc, col(idCol).asc)
      .limit(window)
      .select(col(idCol))
    emb.join(broadcast(ranked), Seq(idCol))
      .select(col(idCol).as("id"),
        graft.functions.GraftFunctions.cosineSimilarity(col(vecCol), lit(queryVec))
          .as("cos"))
      .filter(col("cos").isNotNull)
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }

  /** Two-stage ADC top-k over a persisted PQ index: rank ALL codes by
    * table lookup (the scan reads m bytes per vector — 32× fewer than
    * float32 at m=8/dim=64), keep a `window` of candidates, rescore
    * exactly via a broadcast join back to the float vectors. `emb`
    * must be the corpus the index was built from.
    */
  def adcTopK(spark: SparkSession, path: String, emb: DataFrame,
      idCol: String, vecCol: String, queryVec: Array[Float],
      k: Int, window: Int = 100): DataFrame = {
    val cb = loadCodebooks(spark, path)
    val table = adcTable(queryVec, cb)
    val ranked = spark.read.parquet(s"$path/codes")
      .select(col(idCol), adcScore(col("pq"), table).as("__adc"))
      .filter(col("__adc").isNotNull)
      .orderBy(col("__adc").desc, col(idCol).asc)
      .limit(window)
      .select(col(idCol))
    emb.join(broadcast(ranked), Seq(idCol))
      .select(col(idCol).as("id"),
        graft.functions.GraftFunctions.cosineSimilarity(col(vecCol), lit(queryVec))
          .as("cos"))
      .filter(col("cos").isNotNull)
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }
}
