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

  /** Postgres tsvector position limits (ts_type.h): position values
    * clamp at MAXENTRYPOS-1 = 16383 (LIMITPOS), and each lexeme keeps
    * at most MAXNUMPOS = 256 positions. Mirrored so cover-density
    * ranks match Postgres on pathological documents too.
    */
  private val MaxEntryPos = 16383
  private val MaxNumPos = 256

  /** Lexemes with positions retained (1-based over ALL tokens
    * including stopwords, exactly like to_tsvector — stopwords occupy
    * positions but emit no lexeme), for cover-density ranking.
    * Positions are clamped/capped per the tsvector limits above.
    * Returns (lexeme, sorted distinct positions).
    */
  def lexemesWithPositions(text: String): Map[String, Seq[Int]] = {
    val toks = tokenize(text).zipWithIndex
    toks
      .filterNot { case (t, _) => stopwords.contains(t) }
      .map { case (t, i) => (PorterStemmer.stem(t), math.min(i + 1, MaxEntryPos)) }
      .groupBy(_._1)
      .map { case (lex, ps) =>
        lex -> ps.map(_._2).distinct.sorted.take(MaxNumPos)
      }
  }

  // ---------------------------------------------------------------
  // Exact ts_rank_cd (cover density: Clarke, Cormack & Tudhope 1999;
  // Postgres tsrank.c calc_rank_cd with default normalization 0 and
  // default position weight D = 0.1 — to_tsvector emits D unless
  // setweight was applied, which the reference never does). Each
  // minimal cover (smallest position window whose entries satisfy the
  // query) contributes Cpos / (1 + nNoise), where for all-D entries
  // Cpos = nEntries / (nEntries · 1/0.1) = 0.1 and
  // nNoise = (q − p) − (nEntries − 1). Reference call site:
  // core/src/query.rs:766 (`ts_rank_cd(search_tokens, query)`).
  // ---------------------------------------------------------------

  private val WeightD = 0.1

  /** ts_rank_cd for the OR-rewritten queries the reference emits
    * (core/src/query.rs:768-773: `plainto_tsquery` then `&` → `|`).
    * With OR semantics every matching position is its own minimal
    * cover (width 0, nNoise 0), so the cover walk degenerates to
    * 0.1 · Σ (position count of each matched query lexeme) — which is
    * why the indexed form needs only per-(doc, lexeme) position
    * COUNTS, not the arrays (TextIndex.searchPostingsRankCd).
    *
    * Computed as ONE multiply over the summed count (not a running
    * `acc + n·0.1`) so the double result is bit-identical to the
    * DuckDB oracle's `0.1 * sum(npos)` and to the postings-index
    * plan's `lit(0.1) * sum(npos)`.
    */
  def rankCdOr(positions: Map[String, Seq[Int]], queryLex: Seq[String]): Double =
    WeightD * queryLex.distinct.foldLeft(0L) { (acc, q) =>
      acc + positions.getOrElse(q, Seq.empty).size
    }

  /** [[rankCdOr]] over per-lexeme position counts (the postings-index
    * representation; see [[lexemesWithPositions]] for how positions
    * are clamped before counting).
    */
  def rankCdOrCounts(counts: Map[String, Int], queryLex: Seq[String]): Double =
    WeightD * queryLex.distinct.foldLeft(0L) { (acc, q) =>
      acc + counts.getOrElse(q, 0)
    }

  /** Per-lexeme position COUNTS — the compact form [[rankCdOr]] needs
    * (OR covers never look at the position values, only how many
    * there are after tsvector clamping).
    */
  def positionCounts(text: String): Map[String, Int] =
    lexemesWithPositions(text).map { case (l, ps) => l -> ps.size }

  /** ts_rank_cd for AND queries (plainto_tsquery's natural output,
    * kept for parity beyond the reference's OR rewrite): walks the
    * document's minimal covers exactly like tsrank.c Cover() — scan
    * forward from the start index until every term is seen (upper
    * bound q), then backward from there until every term is seen
    * again (lower bound p), emit, restart one entry past p.
    */
  def rankCdAnd(positions: Map[String, Seq[Int]], queryLex: Seq[String]): Double = {
    val terms = queryLex.distinct
    if (terms.isEmpty ||
        terms.exists(t => positions.getOrElse(t, Seq.empty).isEmpty)) return 0.0
    // doc representation: only query-term entries, position-sorted
    val entries = terms.flatMap(t => positions(t).map(p => (p, t)))
      .sortBy(_._1).toIndexedSeq
    val nTerms = terms.size
    var start = 0
    var wdoc = 0.0
    var more = true
    while (more && start < entries.length) {
      val seenFwd = scala.collection.mutable.Set.empty[String]
      var end = start
      var found = false
      while (!found && end < entries.length) {
        seenFwd += entries(end)._2
        if (seenFwd.size == nTerms) found = true else end += 1
      }
      if (!found) more = false
      else {
        val seenBwd = scala.collection.mutable.Set.empty[String]
        var begin = end
        while (seenBwd.size < nTerms) {
          seenBwd += entries(begin)._2
          if (seenBwd.size < nTerms) begin -= 1
        }
        val nEntries = end - begin + 1
        val width = entries(end)._1 - entries(begin)._1
        val nNoise = {
          val n = width - (nEntries - 1)
          if (n < 0) (nEntries - 1) / 2 else n
        }
        wdoc += WeightD / (1 + nNoise)
        start = begin + 1
      }
    }
    wdoc
  }

  /** `phraseto_tsquery('english', q)` shape: stemmed non-stopword
    * terms with their token offsets RELATIVE to the first kept term.
    * Stopwords keep their position slots, which is where the `<N>`
    * distances come from — 'cats and rats' → (cat,0),(rat,2), i.e.
    * 'cat <2> rat'. Empty when the query has no indexable term.
    */
  def phraseLexemes(query: String): Seq[(String, Int)] = {
    val kept = tokenize(query).zipWithIndex
      .filterNot { case (t, _) => stopwords.contains(t) }
    kept.headOption.fold(Seq.empty[(String, Int)]) { case (_, base) =>
      kept.map { case (t, i) => (PorterStemmer.stem(t), i - base) }
    }
  }

  /** `search_tokens @@ phraseto_tsquery(...)`: true iff some anchor
    * position b has EVERY phrase term at exactly b + its offset
    * (Postgres TS_phrase_execute over position lists). Positions are
    * the clamped tsvector positions, so phrases straddling the
    * 16383 clamp behave like Postgres's (degenerately, both ways).
    */
  def phraseMatch(positions: Map[String, Seq[Int]],
      phrase: Seq[(String, Int)]): Boolean =
    phrase.headOption.exists { case (first, _) =>
      val sets = phrase.map { case (l, o) => (positions.getOrElse(l, Seq.empty).toSet, o) }
      sets.forall(_._1.nonEmpty) &&
        positions(first).exists(b => sets.forall { case (s, o) => s.contains(b + o) })
    }

  // ---------------------------------------------------------------
  // websearch_to_tsquery('english', q): the user-facing web-search
  // grammar — bare words AND'd, "quoted text" becomes a phrase,
  // -item negates, the bare word `or` separates OR groups. Built
  // entirely from the primitives above (lexemes + phraseLexemes +
  // position lists).
  // ---------------------------------------------------------------

  sealed trait WsItem extends Serializable {
    def negated: Boolean
  }
  final case class WsTerm(lexeme: String, negated: Boolean) extends WsItem
  final case class WsPhrase(terms: Seq[(String, Int)], negated: Boolean) extends WsItem

  /** Parse to OR-of-AND groups. Stopword bare terms drop (like
    * websearch_to_tsquery); a group whose every item dropped matches
    * nothing (Postgres's empty tsquery), and an overall empty parse
    * matches nothing.
    */
  def webSearchQuery(query: String): Seq[Seq[WsItem]] = {
    if (query == null) return Seq.empty
    // raw tokens: quoted segments (with optional leading -) or words
    val raw = "-?\"[^\"]*\"|\\S+".r.findAllIn(query).toSeq
    val groups = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[WsItem])
    raw.foreach { tok =>
      if (tok.equalsIgnoreCase("or")) {
        if (groups.last.nonEmpty)
          groups += scala.collection.mutable.ArrayBuffer.empty[WsItem]
      } else {
        val negated = tok.startsWith("-")
        val body = if (negated) tok.drop(1) else tok
        if (body.startsWith("\"")) {
          val phrase = phraseLexemes(body.stripPrefix("\"").stripSuffix("\""))
          if (phrase.nonEmpty) groups.last += WsPhrase(phrase, negated)
        } else {
          // bare word: analyze like a query term (lowercase, stopword
          // drop, stem). A token that tokenizes to SEVERAL words
          // ('mid-word' punctuation) becomes a phrase, exactly like
          // websearch_to_tsquery ('mid-word' → mid<->word), and the
          // negation applies to the phrase as a UNIT — '-mid-word' is
          // NOT(mid<->word), not the De Morgan'd (!mid AND !word)
          val pieces = tokenize(body)
          if (pieces.size > 1) {
            val phrase = phraseLexemes(body)
            if (phrase.nonEmpty) groups.last += WsPhrase(phrase, negated)
          } else pieces.filterNot(stopwords.contains).foreach(t =>
            groups.last += WsTerm(PorterStemmer.stem(t), negated))
        }
      }
    }
    groups.map(_.toSeq).filter(_.nonEmpty).toSeq
  }

  /** `@@ websearch_to_tsquery(...)`: some OR group has every positive
    * item present (term membership / phrase anchor-walk) and every
    * negated item absent.
    */
  def webSearchMatch(positions: Map[String, Seq[Int]],
      query: Seq[Seq[WsItem]]): Boolean =
    query.exists(_.forall {
      case WsTerm(l, neg) => positions.contains(l) != neg
      case WsPhrase(ts, neg) => phraseMatch(positions, ts) != neg
    })

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
