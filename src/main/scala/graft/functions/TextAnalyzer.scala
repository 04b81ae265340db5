package graft.functions

/** English text analyzer approximating Postgres
  * `to_tsvector('english', ...)` / `plainto_tsquery` semantics
  * (reference: core/src/query.rs:233,276,768-773):
  * tokenize on non-word chars, lowercase, drop stopwords, Porter-stem.
  *
  * Pure Scala (no Spark types) so it runs identically on driver and
  * executors; exposed to DataFrames via GraftFunctions.
  */
object TextAnalyzer {

  /** Snowball English stopword list (public domain), as used by
    * Postgres's english text-search config.
    */
  val stopwords: Set[String] = Set(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "should", "now"
  )

  private val tokenPattern = "[a-z0-9]+".r

  /** Raw word tokens: lowercase alphanumeric runs. */
  def tokenize(text: String): Seq[String] =
    if (text == null) Seq.empty
    // Locale.ROOT: default-locale lowercasing is per-JVM (Turkish 'I'
    // → dotless ı breaks [a-z0-9]+), which would make tokens — and
    // every downstream lexeme/signature — differ across executors
    else tokenPattern.findAllIn(
      text.toLowerCase(java.util.Locale.ROOT)).toSeq

  /** tsvector-equivalent lexemes: tokenized, stopword-filtered,
    * stemmed, de-duplicated, sorted (Postgres tsvector is a sorted
    * set of lexemes; we drop positions in v1 — see SURVEY §7.4).
    */
  def lexemes(text: String): Seq[String] =
    tokenize(text)
      .filterNot(stopwords.contains)
      .map(PorterStemmer.stem)
      .distinct
      .sorted

  /** Lexemes with positions retained (1-based, like tsvector), for
    * cover-density ranking. Returns (lexeme, positions).
    */
  def lexemesWithPositions(text: String): Map[String, Seq[Int]] = {
    val toks = tokenize(text).zipWithIndex
    toks
      .filterNot { case (t, _) => stopwords.contains(t) }
      .map { case (t, i) => (PorterStemmer.stem(t), i + 1) }
      .groupBy(_._1)
      .map { case (lex, ps) => lex -> ps.map(_._2).sorted }
  }

  /** OR-semantics query lexemes, matching the reference's
    * `plainto_tsquery` + `replace(' & ', ' | ')` rewrite
    * (core/src/query.rs:768-773): each query term independently
    * matchable.
    */
  def queryLexemes(query: String): Seq[String] = lexemes(query)

  /** `search_tokens @@ query` with OR semantics → any overlap. */
  def matches(docLexemes: Seq[String], queryLexemes: Seq[String]): Boolean =
    queryLexemes.exists(docLexemes.contains)

  /** Lexical rank proxy for `ts_rank_cd`: fraction of query lexemes
    * present in the doc, weighted by term frequency. Exact
    * cover-density needs positions; this preserves rank ORDER for
    * OR-queries over short docs, which is what the reference's tests
    * assert (SURVEY §5). Deterministic, in [0, inf).
    *
    * NOTE: when the doc side comes from [[lexemes]] (the engine's
    * tsvector path) the input is deduplicated, so every count is 1
    * and the tf term adds a constant — rank order then reduces to
    * match-fraction, mirroring the positions-dropped tsvector
    * simplification (SURVEY §7.4). The tf weighting is live only for
    * callers passing raw (non-dedup'd) token sequences.
    */
  def rank(docLexemes: Seq[String], queryLex: Seq[String]): Double = {
    if (docLexemes.isEmpty || queryLex.isEmpty) 0.0
    else {
      val counts = docLexemes.groupBy(identity).map { case (k, v) => k -> v.size }
      val hits = queryLex.map(q => counts.getOrElse(q, 0))
      val matched = hits.count(_ > 0).toDouble
      val tf = hits.sum.toDouble / docLexemes.size
      matched / queryLex.size * (1.0 + tf)
    }
  }
}
