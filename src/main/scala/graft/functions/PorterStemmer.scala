package graft.functions

/** Classic Porter stemming algorithm (M.F. Porter, 1980, public
  * domain algorithm description). Used to approximate Postgres
  * `to_tsvector('english', ...)` lexeme normalization — Postgres uses
  * Snowball "english" which is Porter2; divergences are minor
  * (documented in SURVEY §7.4) and our FTS tests assert rank
  * ordering, not exact lexemes.
  *
  * Pure function, thread-safe, allocation-light: suitable for use
  * inside Spark UDFs on the hot path.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5a(w)
    w = step5b(w)
    w
  }

  private def isConsonant(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isConsonant(w, i - 1)
    case _ => true
  }

  /** Measure: number of VC sequences in the stem. */
  private[graft] def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isConsonant(w, i)) i += 1
    while (i < n) {
      while (i < n && !isConsonant(w, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isConsonant(w, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(i => !isConsonant(w, i))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isConsonant(w, w.length - 1)

  /** *o: stem ends cvc where final c is not w, x, or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isConsonant(w, n - 3) && !isConsonant(w, n - 2) &&
    isConsonant(w, n - 1) && !"wxy".contains(w.charAt(n - 1))
  }

  private def replaceSuffix(w: String, suffix: String, repl: String, minMeasure: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.substring(0, w.length - suffix.length)
      if (measure(stem) > minMeasure) Some(stem + repl) else Some(w)
    } else None

  private[graft] def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private[graft] def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 0) w.dropRight(1) else w
    } else {
      val stemOpt =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stemOpt match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleConsonant(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private[graft] def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i"
    else w

  private val step2Pairs = List(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"
  )

  private[graft] def step2(w: String): String =
    step2Pairs.collectFirst(Function.unlift { case (suf, rep) =>
      replaceSuffix(w, suf, rep, 0)
    }).getOrElse(w)

  private val step3Pairs = List(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> ""
  )

  private[graft] def step3(w: String): String =
    step3Pairs.collectFirst(Function.unlift { case (suf, rep) =>
      replaceSuffix(w, suf, rep, 0)
    }).getOrElse(w)

  private val step4Suffixes = List(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize"
  )

  private[graft] def step4(w: String): String = {
    // "ion" only valid after s or t
    if (w.endsWith("ion") && w.length > 3 &&
        "st".contains(w.charAt(w.length - 4))) {
      val stem = w.dropRight(3)
      return if (measure(stem) > 1) stem else w
    }
    step4Suffixes.collectFirst(Function.unlift { suf =>
      if (w.endsWith(suf)) {
        val stem = w.substring(0, w.length - suf.length)
        Some(if (measure(stem) > 1) stem else w)
      } else None
    }).getOrElse(w)
  }

  private[graft] def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w

  private[graft] def step5b(w: String): String =
    if (w.endsWith("ll") && measure(w) > 1) w.dropRight(1) else w
}
