package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED language identification (r18 — the r17 verdict's #5):
  * a fastText-style supervised classifier served through the same
  * declared-scorer-swap slot as the heuristic
  * ([[graft.functions.GraftFunctions.withDetectedLanguage]]), closing
  * the loop the r17 routing pin left open — a scorer that is actually
  * LEARNED flowing through the routing surface end-to-end.
  *
  * Recipe mirrors [[QualityFilter]] (the repo's one other genuinely
  * learned artifact): training is the one MLlib stage (multinomial
  * logistic regression over hashed word-bigram presence buckets — the
  * [[QualityFilter.featureBuckets]] feature space, which for
  * language ID is a proxy for the stopword/function-word signal a
  * fastText model keys on); SERVING is deliberately relational —
  * explode buckets, broadcast-join the (lang, bk, w) coefficient
  * table, per-(doc, lang) sum + intercept, argmax — so the DuckDB
  * oracle replays routing bit-for-bit from the dumped coefficients
  * and the pipeline persists a table, not a model object.
  *
  * Determinism across engines: per-language scores are summed as
  * DECIMAL(28,12) (each coefficient rounded once at 12 dp — the
  * text_token_entropy strategy), so partition/row order can never
  * perturb low bits and flip an argmax between Spark and DuckDB; the
  * argmax tie-break is total ((score, lang) descending, matching the
  * heuristic's maxBy((score, lang))).
  *
  * 100 TB posture: the coefficient table is bounded at
  * |langs| × 16^hexLen rows forever (a broadcast); scoring is one
  * linear gram scan + broadcast probe + map-side-combinable
  * groupBy(doc, lang) — the DSIR/QualityFilter shape. Training cost
  * is bounded by sampling the labeled corpus; the classifier needs
  * calibrated contrast, not the whole crawl.
  */
object LangId {

  /** Learned artifact: per-language intercepts + dense bucket
    * coefficient rows (lang-major; bucket index = the hexLen-digit
    * md5 prefix parsed as an int). Languages sorted, so the
    * label↔index mapping is deterministic. The FULL feature geometry
    * rides with the model — `hexLen` AND the n-gram order `n` (review
    * r18: a scorer probing n=2 buckets against n=3-trained
    * coefficients is silently garbage, the batchSig-geometry-drift
    * failure class) — so [[detect]]/[[scorer]] can never featurize
    * differently than training did.
    */
  case class Model(langs: Array[String], intercepts: Array[Double],
      weights: Array[Array[Double]], hexLen: Int, n: Int)

  /** Train one multinomial LR over hashed-bigram presence features
    * from a LABELED corpus (langCol supervises — a trusted labeled
    * slice in production, the generator's stored column in tests).
    * Null-lang rows carry no supervision and are dropped.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, n: Int = 2, hexLen: Int = 3,
      regParam: Double = 0.01, maxIter: Int = 30,
      tol: Double = 1e-6): Model = {
    QualityFilter.requireHexLen(hexLen)
    val dim = QualityFilter.bucketDim(hexLen)
    val labeled = docs.filter(col(langCol).isNotNull)
    val langs = labeled.select(col(langCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    require(langs.length >= 2,
      s"LangId.train needs >= 2 labeled languages, got ${langs.mkString(", ")}")
    val langIdx = langs.zipWithIndex.toMap
    val idxUdf = udf((l: String) => langIdx(l).toDouble)
    val toVec = QualityFilter.toVecUdf(dim)
    val training = QualityFilter.featureBuckets(labeled, idCol, textCol, n, hexLen)
      .groupBy("id").agg(collect_set(col("bk")).as("bks"))
      .join(labeled.select(col(idCol).as("id"),
        col(langCol).cast("string").as("__lang")), Seq("id"))
      .select(idxUdf(col("__lang")).as("label"), toVec(col("bks")).as("features"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setTol(tol)
      .setFamily("multinomial").setStandardization(false)
    val fit = lr.fit(training)
    val m = fit.coefficientMatrix
    Model(langs, fit.interceptVector.toArray,
      Array.tabulate(langs.length)(r =>
        Array.tabulate(dim)(c => m(r, c))), hexLen, n)
  }

  /** Coefficient table for dumping/serving: (lang, bk, w) — one row
    * per (language, bucket), bk zero-padded hex. Bounded at
    * |langs| × 16^hexLen rows (a broadcast at any corpus size).
    */
  def weightsTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    (for {
      (lang, li) <- model.langs.zipWithIndex
      (w, bi) <- model.weights(li).zipWithIndex
    } yield (lang, ("%0" + model.hexLen + "x").format(bi), w))
      .toSeq.toDF("lang", "bk", "w")
  }

  /** Intercept table: (lang, icept). */
  def interceptsTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.langs.zip(model.intercepts).toSeq.toDF("lang", "icept")
  }

  /** Relational routing: (id, detected) per document — explode the
    * distinct n-gram buckets (the model's OWN n and hexLen — feature
    * geometry rides with the artifact), broadcast-join the
    * coefficient table, per-(doc, lang) DECIMAL sum + intercept,
    * argmax by (score, lang) descending. Documents with NO grams
    * produce no evidence and rout to 'und' (the heuristic's
    * convention).
    */
  def detect(docs: DataFrame, model: Model, idCol: String,
      textCol: String): DataFrame = {
    val wt = weightsTable(docs.sparkSession, model)
    val ic = interceptsTable(docs.sparkSession, model)
    val scored = QualityFilter.featureBuckets(docs, idCol, textCol,
      model.n, model.hexLen)
      .join(broadcast(wt), Seq("bk"))
      .groupBy(col("id"), col("lang"))
      .agg(sum(col("w").cast("decimal(28,12)")).as("__z"))
      .join(broadcast(ic), Seq("lang"))
      .select(col("id"), col("lang"),
        (col("__z") + col("icept").cast("decimal(28,12)")).as("score"))
    val best = scored
      .groupBy(col("id"))
      .agg(max(struct(col("score"), col("lang"))).as("__b"))
      .select(col("id"), col("__b.lang").as("detected"))
    docs.select(col(idCol).as("id"))
      .join(best, Seq("id"), "left")
      .select(col("id"), coalesce(col("detected"), lit("und")).as("detected"))
  }

  /** The model as a `Column => Column` scorer for
    * [[graft.functions.GraftFunctions.withDetectedLanguage]] — the
    * declared-scorer-swap slot. The coefficient table collapses into
    * the closure (|langs| × 16^hexLen doubles — broadcast-sized), and
    * the UDF reproduces [[detect]]'s arithmetic exactly (same
    * distinct-bucket features, same DECIMAL-rounded sums, same
    * (score, lang) tie-break), pinned by TextSpec. Per-row, so it
    * slots anywhere a column expression does; prefer [[detect]]'s
    * relational form when the plan can join instead.
    */
  def scorer(model: Model): Column => Column = {
    val langs = model.langs
    val weights = model.weights
    val icepts = model.intercepts
    val hexLen = model.hexLen
    val n = model.n
    val f = udf { (text: String) =>
      val grams = Dedup.ngramSetScala(text, n)
      if (grams.isEmpty) "und"
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val buckets = grams.map { g =>
          md.reset()
          val hex = md.digest(g.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          Integer.parseInt(hex.substring(0, hexLen), 16)
        }.toArray.distinct
        def dec(x: Double): BigDecimal =
          BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        var bestLang = ""
        var bestScore: BigDecimal = null
        for (li <- langs.indices) {
          var z = dec(icepts(li))
          buckets.foreach(b => z += dec(weights(li)(b)))
          val c = if (bestScore == null) 1 else z.compare(bestScore)
          if (c > 0 || (c == 0 && langs(li) > bestLang)) {
            bestScore = z; bestLang = langs(li)
          }
        }
        bestLang
      }
    }
    f(_)
  }
}
