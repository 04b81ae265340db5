package graft

import graft.functions.{GraftFunctions, TextAnalyzer}
import graft.operators.{Dedup, Pipeline}
import graft.types.EmbedInput
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the pure-Scala kernels every
  * distributed operator is built on. These run no Spark — they pin
  * the per-row semantics that the oracle checks then verify at the
  * DataFrame level.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus
    * bridge in the offline dependency set).
    */
  private def check(prop: Prop): Unit = {
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("BPE: applied tokens always reassemble the word; counts are monotone") {
    val wordCounts = Gen.listOf(Gen.zip(word, Gen.chooseNum(1L, 50L)))
    check(forAll(wordCounts, word, Gen.chooseNum(0, 64)) { (wc, w, n) =>
      val ranks = graft.functions.Bpe.ranksOf(graft.functions.Bpe.train(wc, n))
      val toks = graft.functions.Bpe.applyWord(w, ranks)
      // lossless: merges never drop or reorder characters
      toks.mkString == w &&
        // more merges never increase a word's token count
        toks.size <= graft.functions.Bpe.applyWord(w,
          graft.functions.Bpe.ranksOf(graft.functions.Bpe.train(wc, n / 2))).size
    })
  }

  test("HNSW: search returns known ids with valid sims, k-bounded, sorted") {
    val vec = Gen.listOfN(4, Gen.chooseNum(-100, 100).map(_ / 100.0f))
    val data = Gen.nonEmptyListOf(vec).map(_.zipWithIndex.map {
      case (v, i) => (i.toLong, v.toArray)
    })
    check(forAll(data, Gen.chooseNum(1, 10)) { (items, k) =>
      val g = graft.operators.Hnsw.buildGraph(items, m = 4,
        efConstruction = 16, seed = 9L)
      val q = items.head._2
      val res = g.search(q, k, ef = 16)
      val idSet = items.map(_._1).toSet
      res.size <= k &&
        res.forall { case (id, s) =>
          idSet.contains(id) && (s.isNegInfinity || (s >= -1.0000001 && s <= 1.0000001))
        } &&
        res.map(_._2).sliding(2).forall {
          case Seq(a, b) => a >= b
          case _ => true
        }
    })
  }

  test("directedProbeKeys: equals brute-force cheapest-subsets enumeration") {
    // small bits so the 2^bits space is brute-forceable; margins with
    // distinct |values| so the cost order is unambiguous
    val margins = Gen.chooseNum(3, 8).flatMap(b =>
      Gen.listOfN(b, Gen.chooseNum(-1000, 1000).map(_ / 1000.0 + 1e-4))
        .retryUntil(ms => ms.map(math.abs).distinct.size == ms.size, 100))
    check(forAll(margins, Gen.chooseNum(1, 40)) { (ms, t) =>
      val bits = ms.size
      val got = graft.operators.Ann.directedProbeKeys(ms.toArray, bits, t)
      val qKey = ms.zipWithIndex.collect { case (m, i) if m > 0 => 1L << i }.sum
      val all = (0L until (1L << bits)).sortBy { k =>
        (0 until bits).collect {
          case i if ((k ^ qKey) & (1L << i)) != 0 => math.abs(ms(i))
        }.sum
      }
      val want = all.take(math.min(t, 1 << bits))
      // same cost means interchangeable order; compare cost sequences
      def costOf(k: Long) = (0 until bits).collect {
        case i if ((k ^ qKey) & (1L << i)) != 0 => math.abs(ms(i))
      }.sum
      got.size == want.size && got.distinct.size == got.size &&
        got.map(costOf).zip(want.map(costOf)).forall {
          case (a, b) => math.abs(a - b) < 1e-9 }
    })
  }

  test("createBatches: concatenation preserves input order exactly") {
    val inputs = Gen.listOf(Gen.chooseNum(1, 50).map(t =>
      EmbedInput(t.toString, s"text$t", t)))
    check(forAll(inputs, Gen.chooseNum(1, 100)) { (ins, budget) =>
      Pipeline.createBatches(ins, budget).flatten == ins
    })
  }

  test("createBatches: no batch except a single oversized input exceeds the budget") {
    val inputs = Gen.listOf(Gen.chooseNum(1, 50).map(t =>
      EmbedInput(t.toString, s"text$t", t)))
    check(forAll(inputs, Gen.chooseNum(10, 100)) { (ins, budget) =>
      Pipeline.createBatches(ins, budget).forall { b =>
        b.map(_.tokenEstimate).sum <= budget || b.size == 1
      }
    })
  }

  test("ngramSet: distinct, first-occurrence order, correct shape") {
    check(forAll(text, Gen.chooseNum(1, 4)) { (t, n) =>
      val grams = Dedup.ngramSetScala(t, n)
      val toks = TextAnalyzer.tokenize(t)
      val naive =
        if (toks.size < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      grams == naive
    })
  }

  test("chunkText: every chunk fits maxChars; no character lost or reordered") {
    val sentenceText = Gen.listOf(word).map(_.mkString(" "))
    check(forAll(sentenceText, Gen.chooseNum(5, 60)) { (t, maxChars) =>
      val chunks = GraftFunctions.chunkTextScala(t, maxChars)
      val fits = chunks.forall(_.length <= maxChars)
      // compare at the character level: oversized words are hard-split
      // across chunks by design, so token identity is not preserved,
      // but the character stream (modulo whitespace) always is
      val charsPreserved =
        chunks.mkString.replaceAll("\\s", "") == t.replaceAll("\\s", "")
      fits && charsPreserved
    })
  }

  test("simHash: bag semantics — token order never changes the signature") {
    val tokens = Gen.nonEmptyListOf(word)
    check(forAll(tokens, Gen.long) { (toks, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(toks)
      GraftFunctions.simHashScala(toks) == GraftFunctions.simHashScala(shuffled)
    })
  }

  test("minHash: deterministic, k-length, and equal sets hash equally") {
    val shingles = Gen.listOf(word).map(_.distinct)
    check(forAll(shingles, Gen.chooseNum(4, 64)) { (sh, k) =>
      val a = GraftFunctions.minHashScala(sh, k, 42L)
      val b = GraftFunctions.minHashScala(scala.util.Random.shuffle(sh), k, 42L)
      a.length == k && a.sameElements(b)
    })
  }

  test("minHash: signature agreement tracks set overlap direction") {
    // a superset shares at least as many signature slots with the
    // base as a disjoint set does (sanity, not a statistical bound)
    val base = (1 to 30).map(i => s"s$i")
    val overlap = base ++ Seq("x1", "x2")
    val disjoint = (1 to 30).map(i => s"t$i")
    val sigB = GraftFunctions.minHashScala(base, 64, 42L)
    val sigO = GraftFunctions.minHashScala(overlap, 64, 42L)
    val sigD = GraftFunctions.minHashScala(disjoint, 64, 42L)
    def agree(a: Array[Long], b: Array[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigB, sigO) > agree(sigB, sigD))
  }

  test("fingerprint: whitespace/case noise invariant, content sensitive") {
    check(forAll(text) { t =>
      GraftFunctions.fingerprintScala(t) ==
        GraftFunctions.fingerprintScala(
        "  " + t.toUpperCase(java.util.Locale.ROOT).replace(" ", "   ") + " ")
    })
    assert(GraftFunctions.fingerprintScala("a b c") !=
      GraftFunctions.fingerprintScala("a c b"), "order-sensitive by design")
  }

  test("rankCdOr: position-array and count forms agree on any text/query") {
    check(forAll(text, Gen.listOf(word)) { (t, q) =>
      TextAnalyzer.rankCdOr(TextAnalyzer.lexemesWithPositions(t), q) ==
        TextAnalyzer.rankCdOrCounts(TextAnalyzer.positionCounts(t), q)
    })
  }

  test("rankCdAnd never exceeds rankCdOr; zero exactly when OR/AND miss") {
    // every AND cover contributes 0.1/(1+noise) <= 0.1 and there are
    // at most (total matched positions) covers, so AND <= OR always
    // rankCd* take already-stemmed query lexemes, so membership is
    // plain map lookup (a stopword query term is simply never present)
    check(forAll(text, Gen.listOf(word)) { (t, q) =>
      val pos = TextAnalyzer.lexemesWithPositions(t)
      val or = TextAnalyzer.rankCdOr(pos, q)
      val and = TextAnalyzer.rankCdAnd(pos, q)
      val qd = q.distinct
      and <= or + 1e-12 &&
        ((or == 0.0) == qd.forall(w => !pos.contains(w))) &&
        ((and > 0.0) == (qd.nonEmpty && qd.forall(pos.contains)))
    })
  }

  test("lexemesWithPositions: sorted clamped positions; keys = lexemes set") {
    check(forAll(text) { t =>
      val pos = TextAnalyzer.lexemesWithPositions(t)
      pos.values.forall(ps => ps.nonEmpty && ps.size <= 256 &&
        ps.forall(p => p >= 1 && p <= 16383) &&
        ps.sliding(2).forall(w => w.size < 2 || w(0) < w(1))) &&
        pos.keySet == TextAnalyzer.lexemes(t).toSet
    })
  }
}
