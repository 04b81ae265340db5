package graft

import graft.functions.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** BPE training + application against the hand-computed classic
  * example (Sennrich et al. 2016 §3.2's corpus, without the
  * end-of-word marker — GPT-2 word-level form), plus determinism and
  * edge behavior.
  */
class BpeSpec extends AnyFunSuite {

  private val corpus = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("learns the classic merges in frequency-then-lex order") {
    val merges = Bpe.train(corpus, numMerges = 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, ...
    // tie at 9 → lexicographic → ('e','s'); then ('es','t')=9; then
    // the 7s: ('l','o'), then ('lo','w')
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("applyWord merges lowest-rank-first; counts follow") {
    val ranks = Bpe.ranksOf(Bpe.train(corpus, numMerges = 4))
    assert(Bpe.applyWord("newest", ranks) == Seq("n", "e", "w", "est"))
    assert(Bpe.applyWord("lowest", ranks) == Seq("low", "est"))
    assert(Bpe.applyWord("low", ranks) == Seq("low"))
    assert(Bpe.applyWord("xyz", ranks) == Seq("x", "y", "z"), "unseen chars split")
    assert(Bpe.applyWord("", ranks).isEmpty)
    assert(Bpe.tokenCount("the lowest", ranks) ==
      Bpe.applyWord("the", ranks).size + Bpe.applyWord(" lowest", ranks).size)
  }

  test("training is input-order independent and stops when nothing repeats") {
    assert(Bpe.train(corpus.reverse, 4) == Bpe.train(corpus, 4))
    // every pair unique → no merge is learnable
    assert(Bpe.train(Seq("ab" -> 1L, "cd" -> 1L), 10).isEmpty)
    assert(Bpe.train(Seq.empty, 10).isEmpty)
    // requesting more merges than exist stops early, deterministically
    val all = Bpe.train(corpus, 1000)
    assert(all.size < 1000 && all.take(4) == Bpe.train(corpus, 4))
  }

  test("preTokenize matches the codegen'd pre-tokenizer column") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq("Hello, world! It's 42 degrees.",
      "a--b  c\nd're", "", "   ", "übermäßig 3.14")
    val fromCol = texts.toDF("t")
      .select(graft.functions.GraftFunctions.tokenCountBpe(col("t")))
      .collect().map(_.getInt(0))
    texts.zip(fromCol).foreach { case (t, n) =>
      assert(Bpe.preTokenize(t).size == n, s"pre-token count diverged on '$t'")
    }
  }
}
