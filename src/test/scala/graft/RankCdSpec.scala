package graft

import graft.functions.{GraftFunctions, TextAnalyzer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact ts_rank_cd (cover density, tsrank.c calc_rank_cd with
  * default weight D = 0.1 and normalization 0) — pure math against
  * hand-computed Postgres values, plus the position bookkeeping
  * (stopwords occupy positions; ts_type.h clamp/cap limits) and the
  * Spark-side parity of the scan UDF.
  */
class RankCdSpec extends AnyFunSuite {

  private val eps = 1e-9

  // --- lexemesWithPositions: to_tsvector position semantics ---

  test("stopwords occupy positions but emit no lexeme") {
    // to_tsvector('english','the cat sat on the mat') =
    //   'cat':2 'mat':6 'sat':3
    val got = TextAnalyzer.lexemesWithPositions("the cat sat on the mat")
    assert(got == Map("cat" -> Seq(2), "sat" -> Seq(3), "mat" -> Seq(6)))
  }

  test("repeated lexemes accumulate sorted distinct positions") {
    // to_tsvector('english','cat dog cat') = 'cat':1,3 'dog':2
    val got = TextAnalyzer.lexemesWithPositions("cat dog cat")
    assert(got == Map("cat" -> Seq(1, 3), "dog" -> Seq(2)))
  }

  test("positions clamp at 16383 (LIMITPOS) and collapse when clamped") {
    // 16385 tokens of which the last three are 'cat': positions
    // 16383, 16384, 16385 all clamp to 16383 → one distinct position.
    val text = (Seq.fill(16382)("filler") ++ Seq("cat", "cat", "cat")).mkString(" ")
    val got = TextAnalyzer.lexemesWithPositions(text)
    assert(got("cat") == Seq(16383))
  }

  test("per-lexeme positions cap at 256 (MAXNUMPOS)") {
    val text = Seq.fill(300)("cat").mkString(" ")
    val got = TextAnalyzer.lexemesWithPositions(text)
    assert(got("cat").size == 256)
    assert(got("cat") == (1 to 256))
  }

  // --- rankCdOr: OR queries (the reference's rewrite) ---

  test("OR rank = 0.1 * total matched positions (Postgres 0.3)") {
    // SELECT ts_rank_cd(to_tsvector('english','cat dog cat'),
    //                   to_tsquery('cat | dog')) → 0.3
    val pos = TextAnalyzer.lexemesWithPositions("cat dog cat")
    assert(math.abs(TextAnalyzer.rankCdOr(pos, Seq("cat", "dog")) - 0.3) < eps)
  }

  test("OR rank counts only matched terms; missing terms add nothing") {
    val pos = TextAnalyzer.lexemesWithPositions("cat dog cat")
    assert(math.abs(TextAnalyzer.rankCdOr(pos, Seq("cat", "zzz")) - 0.2) < eps)
    assert(TextAnalyzer.rankCdOr(pos, Seq("zzz")) == 0.0)
    assert(TextAnalyzer.rankCdOr(Map.empty[String, Seq[Int]], Seq("cat")) == 0.0)
  }

  test("OR rank dedups query terms (tsquery 'a | a' ≡ 'a')") {
    val pos = TextAnalyzer.lexemesWithPositions("cat dog cat")
    assert(math.abs(TextAnalyzer.rankCdOr(pos, Seq("cat", "cat")) - 0.2) < eps)
  }

  test("rankCdOrCounts agrees with rankCdOr via positionCounts") {
    val text = "cat dog cat mat dog cat"
    val q = Seq("cat", "dog", "zzz")
    assert(TextAnalyzer.rankCdOr(TextAnalyzer.lexemesWithPositions(text), q)
      == TextAnalyzer.rankCdOrCounts(TextAnalyzer.positionCounts(text), q))
  }

  // --- rankCdAnd: cover walk against hand-computed tsrank.c values ---

  test("AND rank: two zero-noise covers (Postgres 0.2)") {
    // ts_rank_cd(to_tsvector('english','cat dog cat'),
    //            to_tsquery('cat & dog')) → 0.2:
    // covers [1,2] and [2,3], each nNoise=0 → 0.1 + 0.1
    val pos = TextAnalyzer.lexemesWithPositions("cat dog cat")
    assert(math.abs(TextAnalyzer.rankCdAnd(pos, Seq("cat", "dog")) - 0.2) < eps)
  }

  test("AND rank: noise from stopword gaps (Postgres 0.0333333)") {
    // ts_rank_cd(to_tsvector('english','the cat sat on the mat'),
    //            to_tsquery('sat & mat')) → 0.1/(1+2) = 0.033333335
    // (sat:3, mat:6 — width 3, entries 2, noise 2)
    val pos = TextAnalyzer.lexemesWithPositions("the cat sat on the mat")
    assert(math.abs(TextAnalyzer.rankCdAnd(pos, Seq("sat", "mat")) - 0.1 / 3) < eps)
  }

  test("AND rank: adjacent terms, one cover (Postgres 0.1)") {
    // ts_rank_cd(to_tsvector('english','cat dog'), 'cat & dog') → 0.1
    val pos = TextAnalyzer.lexemesWithPositions("cat dog")
    assert(math.abs(TextAnalyzer.rankCdAnd(pos, Seq("cat", "dog")) - 0.1) < eps)
  }

  test("AND rank: any missing term → 0") {
    val pos = TextAnalyzer.lexemesWithPositions("cat dog cat")
    assert(TextAnalyzer.rankCdAnd(pos, Seq("cat", "zzz")) == 0.0)
    assert(TextAnalyzer.rankCdAnd(pos, Nil) == 0.0)
  }

  test("AND rank: single-term query = 0.1 per position (like OR)") {
    // ts_rank_cd(to_tsvector('english','cat dog cat'), 'cat') → 0.2
    val pos = TextAnalyzer.lexemesWithPositions("cat dog cat")
    assert(math.abs(TextAnalyzer.rankCdAnd(pos, Seq("cat")) - 0.2) < eps)
    assert(TextAnalyzer.rankCdAnd(pos, Seq("cat"))
      == TextAnalyzer.rankCdOr(pos, Seq("cat")))
  }

  // --- phrase match (phraseto_tsquery semantics) ---

  test("phraseLexemes: stopwords keep their slots ('cats and rats' → cat <2> rat)") {
    assert(TextAnalyzer.phraseLexemes("cats and rats") == Seq(("cat", 0), ("rat", 2)))
    assert(TextAnalyzer.phraseLexemes("the quick fox") == Seq(("quick", 0), ("fox", 1)))
    assert(TextAnalyzer.phraseLexemes("the and of") == Nil)
  }

  test("phraseMatch: exact distance required, order-sensitive, stem-aware") {
    def m(text: String, q: String) = TextAnalyzer.phraseMatch(
      TextAnalyzer.lexemesWithPositions(text), TextAnalyzer.phraseLexemes(q))
    assert(m("cats and rats", "cats and rats"))   // cat@1, rat@3: gap 2 ✓
    assert(!m("cats rats", "cats and rats"))      // gap 1 ≠ 2
    assert(!m("rats and cats", "cats and rats"))  // order matters
    assert(m("a table hash join", "tables hashes")) // through stemming
    assert(!m("hash using a table", "tables hashes"))
    assert(!m("table hash", "the and of"))        // degenerate query
    assert(m("x table hash y table hash", "table hash"), "any anchor suffices")
  }

  // --- websearch_to_tsquery grammar + evaluation ---

  test("webSearchQuery: terms AND'd, quotes → phrase, - negates, or splits") {
    import TextAnalyzer.{WsPhrase, WsTerm}
    val q = TextAnalyzer.webSearchQuery("""merge "tables hash" -customer or streams part""")
    assert(q == Seq(
      Seq(WsTerm("merg", negated = false),
        WsPhrase(Seq(("tabl", 0), ("hash", 1)), negated = false),
        WsTerm("custom", negated = true)),
      Seq(WsTerm("stream", negated = false), WsTerm("part", negated = false))))
  }

  test("webSearchQuery: stopwords drop; degenerate queries parse empty") {
    import TextAnalyzer.WsTerm
    assert(TextAnalyzer.webSearchQuery("the cats") == Seq(Seq(WsTerm("cat", false))))
    assert(TextAnalyzer.webSearchQuery("the and of") == Nil)
    assert(TextAnalyzer.webSearchQuery("") == Nil)
    assert(TextAnalyzer.webSearchQuery(null) == Nil)
    // leading 'or' doesn't create an empty group
    assert(TextAnalyzer.webSearchQuery("or cats") == Seq(Seq(WsTerm("cat", false))))
  }

  test("webSearchQuery: multi-piece bare token is a phrase, negated as a unit") {
    import TextAnalyzer.WsPhrase
    // websearch_to_tsquery('mid-word') → mid<->word, one phrase item
    assert(TextAnalyzer.webSearchQuery("mid-word") ==
      Seq(Seq(WsPhrase(Seq(("mid", 0), ("word", 1)), negated = false))))
    // '-mid-word' negates the PHRASE, not each piece (no De Morgan split)
    assert(TextAnalyzer.webSearchQuery("-mid-word") ==
      Seq(Seq(WsPhrase(Seq(("mid", 0), ("word", 1)), negated = true))))
    def m(text: String, q: String) = TextAnalyzer.webSearchMatch(
      TextAnalyzer.lexemesWithPositions(text), TextAnalyzer.webSearchQuery(q))
    // doc has both words but NOT adjacent: phrase misses, so the
    // negated phrase matches — the old AND'd-terms parse got this wrong
    assert(!m("mid of the word", "mid-word"))
    assert(m("mid of the word", "-mid-word"))
    assert(m("a mid-word break", "mid-word"))
    assert(!m("a mid-word break", "-mid-word"))
  }

  test("webSearchMatch: group AND, cross-group OR, negation, phrase") {
    def m(text: String, q: String) = TextAnalyzer.webSearchMatch(
      TextAnalyzer.lexemesWithPositions(text), TextAnalyzer.webSearchQuery(q))
    val doc = "merging the table hash join for customers"
    assert(m(doc, """merge "tables hash""""))         // both AND'd items hit
    assert(!m(doc, """merge "tables hash" -customer""")) // negation kills it
    assert(m(doc, """merge "tables hash" -customer or table""")) // OR rescues
    assert(!m(doc, """merge "hash tables""""))        // phrase order enforced
    assert(!m(doc, "nonexistentzzz"))
    assert(!m(doc, "the and of"))                     // empty parse → false
    assert(m(doc, "-nonexistentzzz"), "pure negation matches absent term")
  }

  // --- Spark parity: the scan UDF is the same math ---

  test("tsRankCd UDF matches driver-side rankCdOr on real documents") {
    val spark = TestSpark.spark
    val qLex = TextAnalyzer.queryLexemes(Queries.f2QueryText)
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .select(col("doc_id"), col("text"),
        GraftFunctions.tsRankCd(col("text"), lit(qLex.toArray)).as("rank"))
      .collect()
    assert(rows.nonEmpty)
    var matched = 0
    rows.foreach { r =>
      val want = TextAnalyzer.rankCdOr(
        TextAnalyzer.lexemesWithPositions(r.getAs[String]("text")), qLex)
      assert(r.getAs[Double]("rank") == want, s"doc ${r.get(0)}")
      if (want > 0) matched += 1
    }
    assert(matched > 0, "fixture must contain at least one matching doc")
  }
}
