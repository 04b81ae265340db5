package graft.api

/** Minimal recursive-descent JSON parser for the HTTP facade's
  * request bodies (build.sbt is intentionally dependency-closed, so
  * no jackson/circe; the response side reuses
  * [[graft.providers.Json.str]] for encoding). Full JSON value
  * grammar, standard escapes incl. \uXXXX; numbers surface as Double
  * (the facade's numeric fields are small ints and floats, the same
  * domain serde_json covers for the reference's request structs,
  * server/src/routes/search.rs:16-49).
  */
object MiniJson {

  sealed trait JValue {
    def asString: Option[String] = this match {
      case JStr(s) => Some(s); case _ => None
    }
    def asDouble: Option[Double] = this match {
      case JNum(d) => Some(d); case _ => None
    }
    def asObj: Option[Map[String, JValue]] = this match {
      case JObj(f) => Some(f); case _ => None
    }
    def asArr: Option[Seq[JValue]] = this match {
      case JArr(a) => Some(a); case _ => None
    }
  }
  final case class JObj(fields: Map[String, JValue]) extends JValue
  final case class JArr(items: Seq[JValue]) extends JValue
  final case class JStr(s: String) extends JValue
  final case class JNum(d: Double) extends JValue
  final case class JBool(b: Boolean) extends JValue
  case object JNull extends JValue

  def parse(input: String): Either[String, JValue] = {
    val p = new Parser(input)
    try {
      val v = p.value()
      p.skipWs()
      if (p.pos < input.length) Left(s"trailing content at ${p.pos}")
      else Right(v)
    } catch {
      case e: ParseError => Left(e.getMessage)
    }
  }

  private final class ParseError(msg: String) extends RuntimeException(msg)

  private final class Parser(s: String) {
    var pos = 0
    private var depth = 0
    private def fail(msg: String) = throw new ParseError(s"$msg at offset $pos")
    def skipWs(): Unit =
      while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): JValue = {
      skipWs()
      if (pos >= s.length) fail("unexpected end of input")
      s.charAt(pos) match {
        // bounded recursion: a pathological deeply-nested body must
        // yield Left, not a StackOverflowError (fatal, so it would
        // escape every NonFatal handler and hang the HTTP exchange)
        case '{' | '[' if depth >= 64 => fail("nesting too deep")
        case '{' => depth += 1; val r = obj(); depth -= 1; r
        case '[' => depth += 1; val r = arr(); depth -= 1; r
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => num()
      }
    }

    private def lit(word: String): Unit =
      if (s.regionMatches(pos, word, 0, word.length)) pos += word.length
      else fail(s"expected '$word'")

    private def obj(): JObj = {
      expect('{'); skipWs()
      val fields = Map.newBuilder[String, JValue]
      if (pos < s.length && s.charAt(pos) == '}') { pos += 1; return JObj(Map.empty) }
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs(); expect(':')
        fields += (k -> value())
        skipWs()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(fields.result())
    }

    private def arr(): JArr = {
      expect('['); skipWs()
      if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return JArr(Nil) }
      val items = Seq.newBuilder[JValue]
      var done = false
      while (!done) {
        items += value()
        skipWs()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(items.result())
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (pos < s.length && s.charAt(pos) != '"') {
        s.charAt(pos) match {
          case '\\' if pos + 1 < s.length =>
            s.charAt(pos + 1) match {
              case 'n' => sb += '\n'; pos += 1
              case 'r' => sb += '\r'; pos += 1
              case 't' => sb += '\t'; pos += 1
              case 'b' => sb += '\b'; pos += 1
              case 'f' => sb += '\f'; pos += 1
              case 'u' if pos + 5 < s.length =>
                val hex = s.substring(pos + 2, pos + 6)
                try sb += Integer.parseInt(hex, 16).toChar
                catch { case _: NumberFormatException =>
                  fail(s"bad unicode escape '\\u$hex'") }
                pos += 5
              case c => sb += c; pos += 1
            }
          case c => sb += c
        }
        pos += 1
      }
      expect('"')
      sb.toString
    }

    private def num(): JNum = {
      val start = pos
      while (pos < s.length &&
          "+-0123456789.eE".indexOf(s.charAt(pos).toInt) >= 0) pos += 1
      if (pos == start) fail("expected a JSON value")
      try JNum(s.substring(start, pos).toDouble)
      catch { case _: NumberFormatException => fail(s"bad number '${s.substring(start, pos)}'") }
    }
  }
}
