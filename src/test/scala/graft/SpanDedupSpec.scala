package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C4-style span dedup: keep-first semantics at corpus and
  * within-document grain, ordered reassembly, and survival of
  * token-less documents.
  */
class SpanDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(Long, String)], spanTokens: Int = 3) = {
    import spark.implicits._
    Dedup.spanDedup(rows.toDF("doc_id", "text"), "doc_id", "text", spanTokens)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
  }

  test("duplicate span keeps only its first (doc, position) occurrence") {
    val out = run(Seq(
      (1L, "a b c x y z"), // spans: "a b c", "x y z"
      (2L, "a b c q r s"), // "a b c" duplicates doc 1 span 0
      (3L, "q r s a b c"))) // both spans already seen
    assert(out(0) == (1L, "a b c x y z", 2L, 0L))
    assert(out(1) == (2L, "q r s", 1L, 1L))
    assert(out(2) == (3L, "", 0L, 2L))
  }

  test("within-document duplicate spans are removed after the first") {
    val out = run(Seq((7L, "a b c a b c a b c")))
    assert(out(0) == (7L, "a b c", 1L, 2L))
  }

  test("partial tail span dedups like any other span") {
    val out = run(Seq(
      (1L, "a b c d"), // spans "a b c", "d"
      (2L, "d"))) // tail span of doc 1 already used "d"
    assert(out(0) == (1L, "a b c d", 2L, 0L))
    assert(out(1) == (2L, "", 0L, 1L))
  }

  test("token-less and null documents survive with empty clean text") {
    val out = run(Seq((1L, ""), (2L, "!!! ???"), (3L, null), (4L, "k l m")))
    assert(out.length == 4)
    assert(out(0) == (1L, "", 0L, 0L))
    assert(out(1) == (2L, "", 0L, 0L))
    assert(out(2) == (3L, "", 0L, 0L))
    assert(out(3) == (4L, "k l m", 1L, 0L))
  }

  test("reassembly preserves original span order") {
    // doc 2's duplicate sits in the MIDDLE; survivors re-join in
    // position order around the hole
    val out = run(Seq(
      (1L, "m n o"),
      (2L, "x y z m n o p q r")))
    assert(out(1) == (2L, "x y z p q r", 2L, 1L))
  }

  test("random corpus: matches a plain-Scala reference implementation") {
    val rng = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0L until 200L).map { id =>
      id -> Seq.fill(rng.nextInt(30))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    // reference: first (doc, position) occurrence of each 3-token
    // span survives, docs reassemble in position order
    val seen = scala.collection.mutable.Set[String]()
    val expect = docs.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val spans = toks.grouped(3).map(_.mkString(" ")).toSeq
      val kept = spans.filter(s => seen.add(s))
      (id, kept.mkString(" "), kept.size.toLong, (spans.size - kept.size).toLong)
    }
    assert(run(docs) sameElements expect)
  }

  private def runWithin(rows: Seq[(Long, String)], spanTokens: Int = 3) = {
    import spark.implicits._
    Dedup.withinDocSpanDedup(rows.toDF("doc_id", "text"), "doc_id", "text",
        spanTokens)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
  }

  test("withinDoc: removes repeats inside a doc, never across docs") {
    val out = runWithin(Seq(
      (1L, "a b c a b c x y z"), // intra-doc repeat drops
      (2L, "a b c q r s"))) // same span as doc 1 — must SURVIVE here
    assert(out(0) == (1L, "a b c x y z", 2L, 1L))
    assert(out(1) == (2L, "a b c q r s", 2L, 0L))
  }

  test("withinDoc: keeps first occurrence and original order") {
    val out = runWithin(Seq(
      (5L, "x y z a b c x y z a b c x y z"), // 5 full spans: xyz abc ×2 + xyz
      (6L, "x y z a b c x y z a"))) // tail span "a" is distinct
    assert(out(0) == (5L, "x y z a b c", 2L, 3L))
    assert(out(1) == (6L, "x y z a b c a", 3L, 1L))
  }

  test("withinDoc: token-less and null docs survive with empty text") {
    val out = runWithin(Seq((1L, ""), (2L, null.asInstanceOf[String]),
      (3L, "  ,, ")))
    assert(out.toSeq == Seq((1L, "", 0L, 0L), (2L, "", 0L, 0L),
      (3L, "", 0L, 0L)))
  }

  test("withinDoc: agrees with a plain-Scala reference on random docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    val rows = (0L until 40L).map { i =>
      i -> Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    def ref(s: String): (String, Long, Long) = {
      val toks = s.split("[^a-z0-9]+").filter(_.nonEmpty)
      val spans = toks.grouped(3).map(_.mkString(" ")).toVector
      val kept = spans.zipWithIndex.collect {
        case (sp, i) if spans.indexOf(sp) == i => sp
      }
      (kept.mkString(" "), kept.size.toLong, (spans.size - kept.size).toLong)
    }
    val got = runWithin(rows)
    rows.zip(got).foreach { case ((id, text), (gid, ct, nk, nr)) =>
      assert(gid == id)
      val (ect, enk, enr) = ref(text)
      assert((ct, nk, nr) == (ect, enk, enr), s"doc $id text='$text'")
    }
  }

  test("exactSubstr: shifted duplicate caught, maximal run removed, first kept") {
    import spark.implicits._
    val a = (1 to 15).map(i => s"t$i").mkString(" ")
    // B embeds A's tokens t1..t12 SHIFTED one position right — a
    // fixed-span hasher (spanDedup) misses this alignment entirely;
    // the sliding window catches duplicated 10-grams at starts 2,3,4
    // whose covered positions union into one maximal 12-token run
    val b = "x " + (1 to 12).map(i => s"t$i").mkString(" ") + " y z"
    val clean = "entirely different vocabulary with no shared ten token run at all"
    val got = Dedup.exactSubstrDedup(
        Seq((1L, a), (2L, b), (3L, clean)).toDF("doc_id", "text"),
        "doc_id", "text", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_removed"))).toMap
    assert(got(1L) == (a, 0L), s"first occurrence must be untouched: ${got(1L)}")
    assert(got(2L) == ("x y z", 12L),
      s"the embedded run must vanish as ONE maximal 12-token removal: ${got(2L)}")
    assert(got(3L)._2 == 0L, s"clean doc must be untouched: ${got(3L)}")
  }

  test("exactSubstr: within-doc repetition removes the second copy only") {
    import spark.implicits._
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val doc = s"$run mid $run"
    val got = Dedup.exactSubstrDedup(
        Seq((7L, doc)).toDF("doc_id", "text"), "doc_id", "text", k = 10)
      .collect().head
    assert(got.getAs[String]("clean_text") == s"$run mid" &&
      got.getAs[Long]("n_removed") == 10L,
      s"second copy must be removed, first + separator kept: $got")
  }

  test("two narrow hash exchanges + rebuild join; span text off the shuffles") {
    import spark.implicits._
    val df = Dedup.spanDedup(
      Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text"),
      "doc_id", "text", 3)
    val plan = df.queryExecution.executedPlan.toString
    // keep-set computes on (id, idx, md5(span)): the window exchange
    // keys on the projected hash column and the kept-index agg on the
    // doc id — both narrow; span text reaches only the rebuild join
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n == 2, s"expected 2 hash exchanges, got $n:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(__sh"),
      s"keep-first window must exchange on the md5 column:\n$plan")
    assert(!plan.contains("hashpartitioning(md5("),
      s"no exchange may key on inline md5 of span text:\n$plan")
    assert("Join".r.findAllIn(plan).size >= 1,
      s"the doc-side rebuild join must be present:\n$plan")
  }

  // ---- boilerplateRemove: frequency-rule drop-all (RefinedWeb) ----

  private def runBoilOpt(rows: Seq[(Option[Long], String)], minDocs: Int = 2,
      spanTokens: Int = 3) = {
    import spark.implicits._
    Dedup.boilerplateRemove(rows.toDF("doc_id", "text"), "doc_id", "text",
        spanTokens, minDocs)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.get(0).asInstanceOf[java.lang.Long], r.getString(1),
        r.getLong(2), r.getLong(3)))
  }
  private def runBoil(rows: Seq[(Long, String)], minDocs: Int = 2,
      spanTokens: Int = 3) =
    runBoilOpt(rows.map { case (i, t) => (Some(i), t) }, minDocs, spanTokens)

  test("boilerplate: frequent span removed EVERYWHERE, first occurrence too") {
    val out = runBoil(Seq(
      (1L, "a b c x y z"), // "a b c" in docs 1,2,3 -> boilerplate
      (2L, "a b c q r s"),
      (3L, "a b c"),
      (4L, "k l m")), minDocs = 3)
    assert(out(0) == (1L, "x y z", 1L, 1L), s"first occurrence must drop: ${out(0)}")
    assert(out(1) == (2L, "q r s", 1L, 1L))
    assert(out(2) == (3L, "", 0L, 1L))
    assert(out(3) == (4L, "k l m", 1L, 0L))
  }

  test("boilerplate: below-threshold duplicate survives in ALL docs (vs keep-first)") {
    // the same corpus under spanDedup would drop doc 2's copy; the
    // frequency rule at minDocs=3 keeps both
    val out = runBoil(Seq(
      (1L, "a b c"),
      (2L, "a b c")), minDocs = 3)
    assert(out(0) == (1L, "a b c", 1L, 0L))
    assert(out(1) == (2L, "a b c", 1L, 0L))
  }

  test("boilerplate: within-doc repeats count as ONE document vote") {
    // "a b c" occurs 3x but only in doc 1 -> df=1 < minDocs=2, kept
    val out = runBoil(Seq(
      (1L, "a b c a b c a b c"),
      (2L, "q r s")), minDocs = 2)
    assert(out(0) == (1L, "a b c a b c a b c", 3L, 0L))
    // and when a second doc votes, ALL THREE within-doc copies drop
    val out2 = runBoil(Seq(
      (1L, "a b c a b c a b c"),
      (2L, "a b c")), minDocs = 2)
    assert(out2(0) == (1L, "", 0L, 3L))
    assert(out2(1) == (2L, "", 0L, 1L))
  }

  test("boilerplate: null-id docs cast NO df vote (SQL count-distinct), still round-trip") {
    // "a b c" is in the null-id doc and doc 4: one VOTE (count skips
    // nulls, exactly the oracle's count(DISTINCT doc_id)) -> below
    // minDocs=2, kept in BOTH docs; token-less/null-text docs survive
    val out = runBoilOpt(Seq(
      (Some(1L), ""), (Some(2L), null), (None, "a b c"), (Some(4L), "a b c")),
      minDocs = 2)
    assert(out.length == 4)
    // orderBy puts the null id first
    assert(out(0) == (null, "a b c", 1L, 0L))
    assert(out(1) == (1L, "", 0L, 0L))
    assert(out(2) == (2L, "", 0L, 0L))
    assert(out(3) == (4L, "a b c", 1L, 0L))
    // and when two NON-null docs vote, the null-id doc's copy is
    // removal-eligible like any other occurrence
    val out2 = runBoilOpt(Seq(
      (Some(4L), "a b c"), (Some(5L), "a b c"), (None, "a b c")),
      minDocs = 2)
    assert(out2.map(t => (t._1, t._2)) sameElements
      Array((null, ""), (4L: java.lang.Long, ""), (5L: java.lang.Long, "")))
  }

  test("boilerplate: reassembly preserves original span order around holes") {
    val out = runBoil(Seq(
      (1L, "x y z a b c p q r"),
      (2L, "a b c")), minDocs = 2)
    assert(out(0) == (1L, "x y z p q r", 2L, 1L))
  }

  test("boilerplate random corpus: matches a plain-Scala reference") {
    val rng = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 200L).map { id =>
      id -> Seq.fill(rng.nextInt(24))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val minDocs = 3
    val spansOf = (text: String) =>
      text.split(" ").filter(_.nonEmpty).grouped(3).map(_.mkString(" ")).toSeq
    val df = docs.flatMap { case (id, t) => spansOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, v) => s -> v.size }
    val expect = docs.map { case (id, text) =>
      val spans = spansOf(text)
      val kept = spans.filter(s => df.getOrElse(s, 0) < minDocs)
      (id: java.lang.Long, kept.mkString(" "), kept.size.toLong,
        (spans.size - kept.size).toLong)
    }
    assert(runBoil(docs, minDocs) sameElements expect)
  }

  test("boilerplate: no Window; narrow aggs; text off every agg exchange") {
    import spark.implicits._
    val df = Dedup.boilerplateRemove(
      Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", 3, 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"frequency rule must be aggregates, never a window:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(__sh"),
      s"df/kept-set aggs must exchange on the md5 column:\n$plan")
    assert(!plan.contains("hashpartitioning(md5("),
      s"no exchange may key on inline md5 of span text:\n$plan")
  }

  test("boilerplate stored ≡ storeless on the same corpus; delta probes " +
      "use the STORE's statistics; geometry guards are loud") {
    import spark.implicits._
    val corpus = (0L until 60L).map { id =>
      val tail = if (id % 3 == 0) "shared boiler plate" else s"unique tail $id"
      (id, s"alpha beta gamma $tail")
    }
    val df = corpus.toDF("doc_id", "text")
    val store = new graft.sources.ParquetStore(
      spark, TestSpark.tempDir("graft_spandf_"), nBuckets = 4)
    Dedup.buildSpanDfStore(store, "t", df, "doc_id", "text", spanTokens = 3)
    // stored ≡ storeless, byte for byte
    val storeless = Dedup.boilerplateRemove(df, "doc_id", "text", 3, 3)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    val stored = Dedup.boilerplateRemoveStored(store, "t", df,
        "doc_id", "text", 3, 3)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(stored sameElements storeless)
    // a DELTA probe reads the STORE's df: the batch's own brand-new
    // span is not boilerplate (no votes in the store), while the
    // store-frequent span drops even though the batch alone could
    // never reach the threshold
    val delta = Seq((100L, "alpha beta gamma brand new content")).toDF("doc_id", "text")
    val out = Dedup.boilerplateRemoveStored(store, "t", delta,
      "doc_id", "text", 3, 3).collect().head
    assert(out.getAs[String]("clean_text") == "brand new content",
      s"store-frequent prefix must drop, fresh tail must stay: $out")
    // the threshold is a PROBE knob, not frozen: minDocs above the
    // store's max df removes nothing
    val loose = Dedup.boilerplateRemoveStored(store, "t", delta,
      "doc_id", "text", 3, minDocs = 1000).collect().head
    assert(loose.getAs[Long]("n_removed") == 0L)
    // grain drift is a loud rebuild; unknown provenance refuses probes
    intercept[IllegalArgumentException] {
      Dedup.boilerplateRemoveStored(store, "t", delta, "doc_id", "text",
        spanTokens = 5, minDocs = 2)
    }
    val bare = new graft.sources.ParquetStore(
      spark, TestSpark.tempDir("graft_spandf_bare_"), nBuckets = 4)
    bare.overwrite("t", store.read("t"))
    val e = intercept[IllegalStateException] {
      Dedup.boilerplateRemoveStored(bare, "t", delta, "doc_id", "text", 3, 2)
    }
    assert(e.getMessage.contains("span grain"))
  }

  test("spanDocFrequency: distinct-doc and occurrence counts at span grain") {
    import spark.implicits._
    val out = Dedup.spanDocFrequency(Seq(
        (1L, "a b c a b c x y z"),
        (2L, "a b c"),
        (3L, "")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .orderBy(col("span")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out sameElements Array(("a b c", 2L, 3L), ("x y z", 1L, 1L)))
    // null-id docs count in n_occurrences but not n_docs (the
    // oracle's count(DISTINCT doc_id) / count(*) split)
    val outN = Dedup.spanDocFrequency(Seq(
        (Some(1L), "a b c"), (None, "a b c"), (None, "a b c"))
        .toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(outN sameElements Array(("a b c", 1L, 3L)))
  }
}
