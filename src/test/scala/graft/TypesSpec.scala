package graft

import graft.types._
import org.scalatest.funsuite.AnyFunSuite

/** Filter/model parser vectors ported from the reference test suite
  * (core/src/query.rs:786-1433, core/src/types.rs:332-424; see
  * FIXTURES.md §7).
  */
class TypesSpec extends AnyFunSuite {

  import FilterOperator._
  import FilterScalar._

  private def parsed(s: String): FilterValue =
    FilterValue.parse(s).fold(e => fail(s"'$s' failed: $e"), identity)

  test("filter: eq string") {
    assert(parsed("eq.hello") == FilterValue(Eq, S("hello")))
  }
  test("filter: gt integer") {
    assert(parsed("gt.100") == FilterValue(Gt, I(100)))
  }
  test("filter: gte float") {
    assert(parsed("gte.50.5") == FilterValue(Gte, F(50.5)))
  }
  test("filter: lt / lte") {
    assert(parsed("lt.25") == FilterValue(Lt, I(25)))
    assert(parsed("lte.10.0") == FilterValue(Lte, F(10.0)))
  }
  test("filter: bare value defaults to eq with sniffing") {
    assert(parsed("42") == FilterValue(Eq, I(42)))
    assert(parsed("hello") == FilterValue(Eq, S("hello")))
  }
  test("filter: ANY dotted input needs a known operator (ref tests)") {
    // Reference deserializer vectors (core/src/query.rs:104-120 +
    // its own test suite): a dot always splits operator.value, so
    // bare floats and stray dots are errors, not equality filters.
    assert(FilterValue.parse("42.5").isLeft)
    assert(FilterValue.parse("+3.14").isLeft)
    assert(FilterValue.parse(".").isLeft)
  }
  test("env interpolation: placeholders found, resolved, missing errors (F11)") {
    import graft.types.EnvInterpolation._
    assert(findPlaceholders("no vars here").isEmpty)
    assert(findPlaceholders("${API_KEY}").contains(Seq("API_KEY")))
    assert(findPlaceholders("${A} and ${B} and ${A}").contains(Seq("A", "B")))
    val env = Map("API_KEY" -> "sk-123", "HOST" -> "example.com")
    assert(interpolate("key=${API_KEY} url=https://${HOST}/v1", env.get) ==
      Right("key=sk-123 url=https://example.com/v1"))
    assert(interpolate("plain", env.get) == Right("plain"))
    assert(interpolate("${MISSING}", env.get) == Left("failed to get env var: MISSING"))
  }

  test("batch_texts: reference edge cases (R3, executor.rs:190-251)") {
    import graft.operators.Pipeline.batchTexts
    val ids = (1 to 10).map(_.toString)
    assert(batchTexts(ids, 0) == Seq(ids))           // batch_size <= 0 → one batch
    assert(batchTexts(ids, 20) == Seq(ids))          // total <= batch_size → one batch
    assert(batchTexts(ids, 10) == Seq(ids))          // exact fit → one batch
    assert(batchTexts(ids, 4).map(_.size) == Seq(4, 4, 2)) // remainder batch
    assert(batchTexts(ids, 4).flatten == ids)        // order preserved, nothing lost
    assert(batchTexts(Seq.empty, 5) == Seq(Seq.empty))
  }

  test("filter: booleans") {
    assert(parsed("eq.true") == FilterValue(Eq, B(true)))
    assert(parsed("eq.false") == FilterValue(Eq, B(false)))
  }
  test("filter: invalid operator errors") {
    assert(FilterValue.parse("invalid.42").isLeft)
    assert(FilterValue.parse("EQ.42").isLeft)
    assert(FilterValue.parse("GT.42").isLeft)
  }
  test("filter: comparison ops require numeric") {
    assert(FilterValue.parse("gt.hello").isLeft)
    assert(FilterValue.parse("lte.true").isLeft)
  }
  test("filter: numeric edge cases match Rust parse semantics") {
    assert(parsed("007") == FilterValue(Eq, I(7)))
    assert(parsed("eq.1e5") == FilterValue(Eq, F(100000.0)))
    // hex is NOT numeric in Rust's i64/f64 parser → string
    assert(parsed("eq.0xFF") == FilterValue(Eq, S("0xFF")))
    // multi-dot is a string
    assert(parsed("eq.1.2.3") == FilterValue(Eq, S("1.2.3")))
    assert(parsed(Long.MaxValue.toString) == FilterValue(Eq, I(Long.MaxValue)))
    // beyond i64 → f64
    assert(parsed("9223372036854775808").value.isInstanceOf[F])
  }
  test("filter: NaN / infinity parse as floats") {
    parsed("eq.NaN").value match {
      case F(v) => assert(v.isNaN)
      case other => fail(s"expected float NaN, got $other")
    }
    assert(parsed("eq.inf") == FilterValue(Eq, F(Double.PositiveInfinity)))
    assert(parsed("eq.-infinity") == FilterValue(Eq, F(Double.NegativeInfinity)))
  }

  test("model: namespace/name parses") {
    val m = Model.parseUnsafe("openai/text-embedding-ada-002")
    assert(m.source == ModelSource.OpenAI)
    assert(m.name == "text-embedding-ada-002")
    assert(m.fullname == "openai/text-embedding-ada-002")
  }
  test("model: legacy aliases") {
    assert(Model.parseUnsafe("text-embedding-ada-002").source == ModelSource.OpenAI)
    assert(Model.parseUnsafe("all-MiniLM-L12-v2").fullname ==
      "sentence-transformers/all-MiniLM-L12-v2")
    assert(Model.parseUnsafe("all_MiniLM_L12_v2").fullname ==
      "sentence-transformers/all-MiniLM-L12-v2")
  }
  test("filters: double-signed floats rejected like Rust f64::from_str") {
    assert(FilterValue.parse("gte.+-inf").isLeft)
    assert(FilterValue.parse("lt.+-nan").isLeft)
    assert(FilterValue.parse("gte.+inf").isRight)
    assert(FilterValue.parse("lt.-infinity").isRight)
  }
  test("model: trailing slash or empty namespace is an error, not a bare model") {
    assert(Model.parse("openai/").isLeft)
    assert(Model.parse("/x").isLeft)
    assert(Model.parse("").isLeft)
  }
  test("model: apiName strips the namespace except sentence-transformers (types.rs:206-215)") {
    assert(Model.parseUnsafe("openai/text-embedding-ada-002").apiName ==
      "text-embedding-ada-002")
    assert(Model.parseUnsafe("cohere/embed-english-v3.0").apiName ==
      "embed-english-v3.0")
    assert(Model.parseUnsafe("ollama/nomic-embed-text").apiName == "nomic-embed-text")
    assert(Model.parseUnsafe("sentence-transformers/all-MiniLM-L6-v2").apiName ==
      "sentence-transformers/all-MiniLM-L6-v2")
  }
  test("model: unknown namespace defaults to sentence-transformers") {
    assert(Model.parseUnsafe("whatever/some-model").source ==
      ModelSource.SentenceTransformers)
  }
  test("model: bare name gets sentence-transformers namespace") {
    val m = Model.parseUnsafe("all-MiniLM-L6-v2")
    assert(m.fullname == "sentence-transformers/all-MiniLM-L6-v2")
  }

  test("identifiers: validation guards injection") {
    assert(Identifiers.isValid("product_id"))
    assert(!Identifiers.isValid("product id"))
    assert(!Identifiers.isValid("x; DROP TABLE"))
    assert(!Identifiers.isValid(""))
    intercept[IllegalArgumentException](Identifiers.validate("a-b"))
  }

  test("schedule: modes, 5-field cron parsing, and field syntax") {
    assert(Schedule.parse("realtime") == Right(Schedule.Realtime))
    assert(Schedule.parse("manual") == Right(Schedule.Manual))
    val c = Schedule.parseUnsafe("*/15 2-4 1,15 * 1-5").asInstanceOf[Schedule.Cron]
    assert(c.minute == Set(0, 15, 30, 45))
    assert(c.hour == Set(2, 3, 4))
    assert(c.dom == Set(1, 15))
    assert(c.month == (1 to 12).toSet)
    assert(c.dow == Set(1, 2, 3, 4, 5))
    // steps over ranges, and dow 7 == 0 == Sunday
    assert(Schedule.parseUnsafe("0 0 * * 7").asInstanceOf[Schedule.Cron].dow == Set(0))
    assert(Schedule.parseUnsafe("10-20/5 * * * *").asInstanceOf[Schedule.Cron]
      .minute == Set(10, 15, 20))
    // vixie: a bare number with a step means n-to-max by step, not {n}
    assert(Schedule.parseUnsafe("5/10 * * * *").asInstanceOf[Schedule.Cron]
      .minute == Set(5, 15, 25, 35, 45, 55))
    assert(Schedule.parseUnsafe("* * * 10/1 *").asInstanceOf[Schedule.Cron]
      .month == Set(10, 11, 12))
    for (bad <- Seq("every 5 minutes", "61 * * * *", "* * * *", "* * * * * *",
        "*/0 * * * *", "5-1 * * * *", "* 24 * * *", "a * * * *"))
      assert(Schedule.parse(bad).isLeft, s"'$bad' must be rejected")
  }

  test("schedule: cron matching incl. the vixie dom/dow OR rule") {
    import java.time.{ZonedDateTime, ZoneOffset}
    def at(y: Int, mo: Int, d: Int, h: Int, mi: Int) =
      ZonedDateTime.of(y, mo, d, h, mi, 0, 0, ZoneOffset.UTC)
    val everyMin = Schedule.parseUnsafe("* * * * *").asInstanceOf[Schedule.Cron]
    assert(everyMin.matches(at(2026, 8, 12, 13, 59)))
    val daily = Schedule.parseUnsafe("30 2 * * *").asInstanceOf[Schedule.Cron]
    assert(daily.matches(at(2026, 8, 12, 2, 30)))
    assert(!daily.matches(at(2026, 8, 12, 2, 31)))
    assert(!daily.matches(at(2026, 8, 12, 3, 30)))
    // 2026-08-12 is a Wednesday (dow 3)
    val wed = Schedule.parseUnsafe("0 0 * * 3").asInstanceOf[Schedule.Cron]
    assert(wed.matches(at(2026, 8, 12, 0, 0)))
    assert(!wed.matches(at(2026, 8, 13, 0, 0)))
    // both dom and dow restricted → EITHER matches (vixie rule):
    // the 15th (any weekday) OR a Wednesday
    val both = Schedule.parseUnsafe("0 0 15 * 3").asInstanceOf[Schedule.Cron]
    assert(both.matches(at(2026, 8, 15, 0, 0)), "dom side must fire")
    assert(both.matches(at(2026, 8, 12, 0, 0)), "dow side must fire")
    assert(!both.matches(at(2026, 8, 13, 0, 0)))
    // sunday as 0 and as 7 (2026-08-16 is a Sunday)
    assert(Schedule.parseUnsafe("0 0 * * 0").asInstanceOf[Schedule.Cron]
      .matches(at(2026, 8, 16, 0, 0)))
  }
}
