package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GPT-3-style learned quality filtering (Brown et al. 2020,
  * Appendix A): train a logistic-regression classifier to separate a
  * trusted target corpus (label 1) from raw web text (label 0) over
  * hashed-bigram presence features, score every raw document with
  * P(quality), and keep documents by the paper's Pareto-thresholded
  * rule `score > 1 − pareto(α=9)` — which admits most high-scoring
  * docs while letting a long tail of low-scoring docs through for
  * diversity.
  *
  * Feature space: the [[Dsir]] bucketing — distinct per-doc bigrams
  * ([[Dedup.ngramSet]]) hashed by md5 prefix into 16^hexLen binary
  * buckets. Training is the one genuinely-learned stage (MLlib
  * LBFGS); SCORING is deliberately relational — explode buckets,
  * broadcast-join the 4096-row coefficient table, sum, sigmoid — so
  * the DuckDB oracle replays it bit-for-bit from the dumped
  * coefficients, and so the serving path needs no MLlib model object
  * (the coefficient table IS the model artifact a pipeline persists).
  *
  * 100 TB posture: the coefficient table is bounded at 16^hexLen
  * rows forever — always a broadcast; scoring is one linear gram
  * scan + broadcast probe + map-side-combinable groupBy(doc), the
  * DSIR shape. Training cost is bounded by sampling the negatives
  * (`negativeFraction`), the paper's own construction — the
  * classifier needs a contrast, not the whole crawl.
  */
object QualityFilter {

  /** Learned artifact: intercept + dense bucket coefficients
    * (index = the bucket's 3-hex-digit md5 prefix parsed as an int).
    */
  case class Model(intercept: Double, weights: Array[Double], hexLen: Int)

  /** Distinct feature buckets per document: (id, bk) with bk the
    * md5-prefix STRING key (the oracle joins on substr(md5(g),1,L));
    * distinct because features are binary presence, so two grams
    * colliding in a bucket must not double-count.
    */
  private[graft] def featureBuckets(df: DataFrame, idCol: String,
      textCol: String, n: Int, hexLen: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(Dedup.ngramSet(col(textCol), n)).as("g"))
      .select(col("id"), substring(md5(col("g")), 1, hexLen).as("bk"))
      .distinct()

  /** The TRAINING half of the shared feature space (review r18 —
    * previously copy-pasted into [[LangId]]): the hexLen bound, the
    * bucket-count rule, and the hex-bucket-set → sparse-binary-vector
    * UDF. One definition, so a change to the bucket encoding can
    * never diverge the two learned operators.
    */
  private[operators] def requireHexLen(hexLen: Int): Unit =
    require(hexLen >= 1 && hexLen <= 4, s"hexLen must be in [1,4], got $hexLen")
  private[operators] def bucketDim(hexLen: Int): Int = 1 << (4 * hexLen)
  private[operators] def toVecUdf(dim: Int) = udf { (bks: Seq[String]) =>
    val idx = bks.map(b => Integer.parseInt(b, 16)).distinct.sorted.toArray
    org.apache.spark.ml.linalg.Vectors.sparse(dim, idx,
      Array.fill(idx.length)(1.0))
  }

  /** Train the classifier: target (label 1) vs a deterministic
    * `negativeFraction` sample of raw (label 0). Returns the
    * coefficient artifact; training runs on collected-to-vector
    * per-doc bucket sets via MLlib logistic regression with fixed
    * hyperparameters (L2, standardization off so coefficients live in
    * the raw feature space the relational scorer uses).
    */
  def train(raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      n: Int = 2, hexLen: Int = 3, negativeFraction: Double = 1.0,
      regParam: Double = 0.01, maxIter: Int = 30, tol: Double = 1e-6): Model = {
    requireHexLen(hexLen)
    val dim = bucketDim(hexLen)
    val negatives =
      if (negativeFraction >= 1.0) raw
      else {
        // the sampler below hashes cast(id as long); a null cast would
        // silently drop every negative → degenerate single-class fit
        Guards.requireNumericIds(raw, idCol, "QualityFilter.train")
        raw.filter(
          (col(idCol).cast("long") % 100003L) * 2654435761L % 10000L <
            lit((negativeFraction * 10000).toLong))
      }
    def vectors(df: DataFrame, label: Double) =
      featureBuckets(df, idCol, textCol, n, hexLen)
        .groupBy("id").agg(collect_set(col("bk")).as("bks"))
        .select(col("id"), lit(label).as("label"), col("bks"))
    val toVec = toVecUdf(dim)
    val training = vectors(target, 1.0).unionByName(vectors(negatives, 0.0))
      .select(col("label"), toVec(col("bks")).as("features"))
    // convergence precision is deliberately modest: the oracle
    // replays whatever coefficients emerge (dump-and-replay), and the
    // keep rule only needs calibrated separation, not the last digit
    // of the LBFGS optimum
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setTol(tol)
      .setStandardization(false)
    val fit = lr.fit(training)
    Model(fit.intercept, fit.coefficients.toArray, hexLen)
  }

  /** Coefficient table for dumping/serving: (bk, w), one row per
    * bucket, bk = zero-padded hex. Bounded at 16^hexLen rows.
    */
  def weightsTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.weights.zipWithIndex.map { case (w, i) =>
      (("%0" + model.hexLen + "x").format(i), w)
    }.toSeq.toDF("bk", "w")
  }

  /** Relational scoring: P(quality) per document from the coefficient
    * table — the exact arithmetic the oracle replays. Docs with no
    * n-grams produce no row (no evidence, same as [[Dsir]]).
    */
  def score(docs: DataFrame, model: Model, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val wt = weightsTable(docs.sparkSession, model)
    featureBuckets(docs, idCol, textCol, n, model.hexLen)
      .join(broadcast(wt), Seq("bk"))
      .groupBy("id")
      .agg((lit(1.0) /
        (lit(1.0) + exp(-(sum(col("w")) + lit(model.intercept)))))
        .as("qscore"))
  }

  /** The paper's keep rule with deterministic noise: keep iff
    * qscore > 1 − pareto(α), pareto drawn as (1−u)^(−1/α) − 1 from
    * the repo's pure-integer id-hash uniform — replayable in SQL,
    * stable across runs and corpus growth.
    */
  def paretoKeep(scored: DataFrame, idCol: String, scoreCol: String,
      alpha: Double = 9.0): DataFrame = {
    // same failure class as train's sampler: a null id-hash makes the
    // keep predicate NULL and silently drops the row
    Guards.requireNumericIds(scored, idCol, "QualityFilter.paretoKeep")
    val u = ((col(idCol).cast("long") % 100003L) * 2654435761L % 10000L
      + lit(0.5)) / lit(10000.0)
    scored.filter(col(scoreCol) >
      lit(1.0) - (pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)))
  }
}
