package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style perplexity filtering (Wenzek et al. 2020,
  * arXiv:1911.00359): score every raw document by the perplexity of
  * a language model trained on a trusted target corpus, then bucket
  * per language into head / middle / tail by perplexity tertiles —
  * the CommonCrawl cleaning recipe where "reads like Wikipedia"
  * (low perplexity) is the keep signal.
  *
  * The LM here is an order-2 (bigram) model with Laplace smoothing —
  * the CCNet paper uses a KenLM 5-gram over SentencePiece tokens;
  * this implementation keeps the exact pipeline shape (train on
  * target → per-doc cross-entropy → per-language tertiles) with a
  * model simple enough to replay bit-exactly in the DuckDB oracle.
  * Swapping in a richer scorer changes only the model-fit and
  * per-pair-probability stages.
  *
  * 100 TB posture: the model is built from the TARGET corpus (small
  * and trusted by assumption — the whole point of the recipe), so
  * the bigram and context tables broadcast; scoring is one linear
  * pass over raw token pairs (explode → two broadcast probes → one
  * map-side-combinable groupBy(doc)), and the tertile window
  * partitions by language. If the target ever outgrows a broadcast,
  * hash bigrams into a bounded bucket space (the [[Dsir]] treatment)
  * or bucket-join the model — the scoring shape is unchanged.
  */
object Ccnet {

  /** Consecutive token pairs (id, prev, cur) — one row PER
    * OCCURRENCE, not distinct (an LM needs counts). Documents with
    * fewer than two tokens produce no pairs and are excluded from
    * scoring — they carry no bigram evidence.
    */
  private[graft] def tokenPairs(df: DataFrame, idCol: String, textCol: String,
      tokens: Column => Column): DataFrame =
    // evalOnce fence (r16): the >=2 gate below is a filter over this
    // computed column, and pushdown would inline the tokenizer into
    // the scan Filter — every row tokenized twice (the minHashSigOf
    // shingle trap). The fence also guarantees the slice/zip below
    // read the materialized column, not a re-inlined expression.
    df.withColumn("__t",
        graft.functions.GraftFunctions.evalOnce(tokens(col(textCol))))
      .filter(size(col("__t")) >= 2)
      .withColumn("__z", arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("prev"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("cur")))
      // outer + null drop: the non-outer form's inferred size>0
      // filter inlines the arrays_zip/slice chain into the Filter
      // (the dedup_spans r16 trap); size(__t) >= 2 above already
      // guarantees a non-empty zip, so only a defensive no-op filter
      // on the generated column remains
      .select(col(idCol).as("id"), explode_outer(col("__z")).as("__p"))
      .filter(col("__p").isNotNull)
      .select(col("id"), col("__p.prev").as("prev"), col("__p.cur").as("cur"))

  /** Per-document perplexity of `raw` under a Laplace-smoothed bigram
    * LM fit on `target`. Returns (id, n_pairs, ppl).
    *
    * p(c|p) = (count(p,c) + α) / (count(p) + α·(V+1)) with V = the
    * target's distinct continuation vocabulary; an unseen context
    * backs off to the uniform 1/(V+1) — every probability is strictly
    * positive, so ln never sees zero.
    */
  def perplexity(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, tokens: Column => Column,
      alpha: Double = 1.0): DataFrame = {
    val tPairs = tokenPairs(target, idCol, textCol, tokens)
    val big = tPairs.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    // ctx and vocab derive from the bigram counts — one explode over
    // the target instead of three (cp = Σ_cur cb; V = distinct cur)
    val ctx = big.groupBy("prev").agg(sum("cb").as("cp"))
    val vocab = big.agg(countDistinct(col("cur")).as("v"))
    tokenPairs(raw, idCol, textCol, tokens)
      .join(broadcast(big), Seq("prev", "cur"), "left_outer")
      .join(broadcast(ctx), Seq("prev"), "left_outer")
      .na.fill(0L, Seq("cb", "cp"))
      .crossJoin(broadcast(vocab))
      .withColumn("__logp",
        log((col("cb") + lit(alpha)) /
          (col("cp") + lit(alpha) * (col("v") + lit(1)))))
      .groupBy("id")
      .agg(count(lit(1)).as("n_pairs"), exp(-avg(col("__logp"))).as("ppl"))
  }
}
