package graft.functions

import scala.collection.mutable

/** Corpus-trained byte-pair encoding — true BPE merges, closing the
  * gap the pre-tokenizer count (`GraftFunctions.tokenCountBpe`) left
  * open (the reference counts cl100k tokens, `core/src/query.rs:
  * 606-615`; cl100k's merge table isn't redistributable, so the
  * honest equivalent is to TRAIN the merges on the corpus — which is
  * itself a first-class training-data-pipeline operator: tokenizer
  * training). Algorithm: Sennrich, Haddow & Birch 2016 ("Neural
  * Machine Translation of Rare Words with Subword Units") in its
  * GPT-2 word-level form — pre-tokenize, learn merges over the
  * word-frequency table, apply merges lowest-rank-first per word.
  *
  * Scale shape: training consumes a WORD-FREQUENCY table, not the
  * corpus — at 100 TB that is one distributed pre-tokenize +
  * groupBy(word).count() whose result is vocabulary-sized; the
  * sequential merge loop then runs driver-side over the (capped)
  * frequency table exactly like the reference tokenizer trainers.
  * Application is embarrassingly parallel (broadcast rank map, one
  * UDF pass).
  *
  * Determinism: merge ties break lexicographically; the learn loop
  * is sequential; no randomness anywhere.
  */
object Bpe {

  /** The same GPT-style pre-tokenizer the codegen'd
    * `tokenCountBpe` column uses, as a JVM function (leading spaces
    * are part of the token, GPT-2 style).
    */
  private val preTokenPattern = java.util.regex.Pattern.compile(
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+")

  def preTokenize(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val m = preTokenPattern.matcher(text)
    val out = mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  /** Learn up to `numMerges` merges from a word-frequency table.
    * Words are symbol sequences (initially single characters); each
    * round merges the globally most frequent adjacent pair
    * (lexicographic tie-break), stopping early when no pair repeats.
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    // working set: symbol arrays with their frequencies
    var words: Array[(Array[String], Long)] = wordCounts
      .filter { case (w, c) => w.nonEmpty && c > 0 }
      .sortBy(_._1) // deterministic iteration, input-order independent
      .map { case (w, c) => (w.map(_.toString).toArray, c) }
      .toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2)
      if (best.isEmpty) continue = false
      else {
        val (pair, _) = best.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        val merged = pair._1 + pair._2
        words = words.map { case (syms, c) =>
          val out = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
      }
    }
    merges.toSeq
  }

  /** Apply learned merges to one word (GPT-2 bpe(): repeatedly merge
    * the LOWEST-RANK adjacent pair present until none applies).
    */
  def applyWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms: Vector[String] = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else syms = syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1)) :++
        syms.drop(bestIdx + 2)
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** Token count of a text under the learned merges. */
  def tokenCount(text: String, ranks: Map[(String, String), Int]): Int =
    preTokenize(text).iterator.map(w => applyWord(w, ranks).size).sum

  def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap
}
