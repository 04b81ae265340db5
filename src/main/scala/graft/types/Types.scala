package graft.types

/** Core domain types for the graft vectorize engine.
  *
  * Re-expresses the reference's job/model/filter data model
  * (pg_vectorize `core/src/types.rs`, `core/src/query.rs:14-203`) as
  * plain Scala ADTs. Pure JVM — no Spark imports — so the module is
  * usable from the driver, executors, and unit tests alike.
  */

/** Where an embedding/chat model is served from.
  * Reference: `ModelSource` enum, core/src/types.rs:277-284.
  */
sealed abstract class ModelSource(val name: String)
object ModelSource {
  case object OpenAI extends ModelSource("openai")
  case object SentenceTransformers extends ModelSource("sentence-transformers")
  case object Ollama extends ModelSource("ollama")
  case object Cohere extends ModelSource("cohere")
  case object Portkey extends ModelSource("portkey")
  case object Voyage extends ModelSource("voyage")
  /** Deterministic local provider for tests/CI (no network). */
  case object Deterministic extends ModelSource("deterministic")

  val all: Seq[ModelSource] =
    Seq(OpenAI, SentenceTransformers, Ollama, Cohere, Portkey, Voyage, Deterministic)

  /** Unknown namespaces default to SentenceTransformers, matching
    * core/src/types.rs:297,326.
    */
  def parse(s: String): ModelSource =
    all.find(_.name == s.toLowerCase).getOrElse(SentenceTransformers)
}

/** A parsed `namespace/model-name` identifier.
  * Reference: `Model` + parser, core/src/types.rs:160-266.
  */
final case class Model(source: ModelSource, fullname: String, name: String) {
  /** The id sent to the provider API: bare model name for hosted
    * providers, namespaced fullname for SentenceTransformers (the
    * model server expects the HF repo path). Mirrors
    * core/src/types.rs:206-215 `api_name()`.
    */
  def apiName: String = source match {
    case ModelSource.SentenceTransformers => fullname
    case _ => name
  }
}
object Model {
  /** Legacy aliases accepted by the reference parser
    * (core/src/types.rs:242-248).
    */
  private val legacyAliases: Map[String, String] = Map(
    "text-embedding-ada-002" -> "openai/text-embedding-ada-002",
    "all-MiniLM-L12-v2"      -> "sentence-transformers/all-MiniLM-L12-v2",
    "all_MiniLM_L12_v2"      -> "sentence-transformers/all-MiniLM-L12-v2"
  )

  def parse(input: String): Either[String, Model] = {
    val canonical = legacyAliases.getOrElse(input, input)
    // split with limit -1 keeps trailing empty segments: "openai/"
    // must be an error, not a bare sentence-transformers model named
    // "openai" (String.split's default drops the trailing empty and
    // would silently misroute the typo)
    canonical.split("/", -1).toList match {
      case ns :: rest if rest.nonEmpty =>
        val name = rest.mkString("/")
        if (name.isEmpty || ns.isEmpty) Left(s"invalid model name: $input")
        else Right(Model(ModelSource.parse(ns), s"$ns/$name", name))
      case single :: Nil if single.nonEmpty =>
        // Bare names default to the sentence-transformers namespace.
        Right(
          Model(
            ModelSource.SentenceTransformers,
            s"sentence-transformers/$single",
            single
          )
        )
      case _ => Left(s"invalid model name: $input")
    }
  }

  def parseUnsafe(input: String): Model =
    parse(input).fold(err => throw new IllegalArgumentException(err), identity)
}

/** Comparison operator for typed metadata filters.
  * Reference: `FilterOperator`, core/src/query.rs:14-55.
  */
sealed abstract class FilterOperator(val token: String, val sql: String)
object FilterOperator {
  case object Eq  extends FilterOperator("eq", "=")
  case object Gt  extends FilterOperator("gt", ">")
  case object Gte extends FilterOperator("gte", ">=")
  case object Lt  extends FilterOperator("lt", "<")
  case object Lte extends FilterOperator("lte", "<=")
  val all: Seq[FilterOperator] = Seq(Eq, Gt, Gte, Lt, Lte)
  def parse(s: String): Option[FilterOperator] = all.find(_.token == s)
}

/** Typed filter value; type sniffed at parse time with the reference's
  * precedence bool -> i64 -> f64 -> string
  * (core/src/query.rs:82-182). Comparison (non-eq) operators are
  * numeric-only (core/src/query.rs:136-151).
  */
sealed trait FilterScalar
object FilterScalar {
  final case class B(v: Boolean) extends FilterScalar
  final case class I(v: Long) extends FilterScalar
  final case class F(v: Double) extends FilterScalar
  final case class S(v: String) extends FilterScalar

  /** bool -> i64 -> f64 -> string precedence, matching
    * core/src/query.rs:96-134. Note the reference uses Rust
    * `str::parse`, which rejects hex (`0xFF`), accepts `007` as 7 and
    * `1e5` as float 100000.0, and accepts NaN/inf as floats.
    */
  def sniff(raw: String): FilterScalar = {
    if (raw == "true") B(true)
    else if (raw == "false") B(false)
    else
      parseRustI64(raw)
        .map(I)
        .orElse(parseRustF64(raw).map(F))
        .getOrElse(S(raw))
  }

  /** Rust i64::from_str semantics: optional sign, decimal digits only. */
  private[types] def parseRustI64(s: String): Option[Long] =
    if (s.nonEmpty && s.matches("[+-]?[0-9]+"))
      try Some(java.lang.Long.parseLong(s))
      catch { case _: NumberFormatException => None }
    else None

  /** Rust f64::from_str semantics: standard float forms plus
    * nan/inf/infinity (case-insensitive), no hex, no trailing 'd'/'f'.
    */
  private[types] def parseRustF64(s: String): Option[Double] = {
    val t = s.trim
    if (t.isEmpty || t != s) return None
    val lower = t.toLowerCase
    // strip AT MOST ONE sign: Rust rejects "+-inf"; sequential
    // stripPrefix("+").stripPrefix("-") would accept it as +inf
    val unsigned =
      if (lower.startsWith("+") || lower.startsWith("-")) lower.substring(1) else lower
    val neg = lower.startsWith("-")
    unsigned match {
      case "nan"              => Some(Double.NaN)
      case "inf" | "infinity" =>
        Some(if (neg) Double.NegativeInfinity else Double.PositiveInfinity)
      case u if u.matches("""(\d+\.?\d*|\.\d+)(e[+-]?\d+)?""") =>
        try Some(java.lang.Double.parseDouble(t))
        catch { case _: NumberFormatException => None }
      case _ => None
    }
  }
}

/** A parsed `"op.value"` filter (e.g. `"eq.electronics"`, `"gte.25"`).
  * Reference: `FilterValue` deserializer, core/src/query.rs:82-182.
  */
final case class FilterValue(operator: FilterOperator, value: FilterScalar)
object FilterValue {
  /** Parse `"op.value"`. Exactly the reference deserializer's shape
    * (core/src/query.rs:104-120): ANY input containing a dot is
    * treated as `operator.value` and an unknown operator is an error
    * — so `"42.5"`, `"+3.14"`, `"."`, and `"invalid.42"` all fail
    * (the reference's own tests assert this). Only dot-free input
    * falls back to an equality filter on the sniffed value
    * (core/src/query.rs:161-173). Comparison operators require
    * numeric values (core/src/query.rs:136-151).
    */
  def parse(raw: String): Either[String, FilterValue] = {
    val dot = raw.indexOf('.')
    if (dot < 0)
      Right(FilterValue(FilterOperator.Eq, FilterScalar.sniff(raw)))
    else {
      val opTok = raw.substring(0, dot)
      val rest = raw.substring(dot + 1)
      FilterOperator.parse(opTok) match {
        case None => Left(s"unknown operator: '$opTok'")
        case Some(FilterOperator.Eq) =>
          Right(FilterValue(FilterOperator.Eq, FilterScalar.sniff(rest)))
        case Some(op) =>
          FilterScalar.sniff(rest) match {
            case s @ (_: FilterScalar.I | _: FilterScalar.F) =>
              Right(FilterValue(op, s))
            case _ =>
              Left(
                s"comparison operator '${op.token}' requires a numeric value, got: '$rest'"
              )
          }
      }
    }
  }
}

/** How embeddings are stored relative to the source table.
  * Reference: `TableMethod`, core/src/types.rs:107-115 (default join).
  */
sealed abstract class TableMethod(val name: String)
object TableMethod {
  case object Append extends TableMethod("append")
  case object Join   extends TableMethod("join")
  def parse(s: String): TableMethod =
    if (s.equalsIgnoreCase("append")) Append else Join
}

/** Distance/index flavor. The default search path stays exact
  * brute-force cosine (exact ⊇ ANN recall); the hint selects which
  * persisted ANN index `VectorizeEngine.buildVectorIndex` constructs —
  * `pgv_hnsw_*` → per-partition HNSW graphs (operators/Hnsw.scala),
  * `vsc_diskann_cosine` → IVF (the documented Spark-native
  * substitution for a disk-resident graph, SURVEY §4).
  * Reference: `IndexDist`, core/src/types.rs:61-68.
  */
sealed abstract class IndexDist(val name: String)
object IndexDist {
  case object PgvHnswL2     extends IndexDist("pgv_hnsw_l2")
  case object PgvHnswIp     extends IndexDist("pgv_hnsw_ip")
  case object PgvHnswCosine extends IndexDist("pgv_hnsw_cosine")
  case object VscDiskannCos extends IndexDist("vsc_diskann_cosine")
  val all: Seq[IndexDist] = Seq(PgvHnswL2, PgvHnswIp, PgvHnswCosine, VscDiskannCos)
  def parse(s: String): IndexDist =
    all.find(_.name == s.toLowerCase).getOrElse(PgvHnswCosine)
}

/** One vectorize job: a named binding of a source table + text columns
  * to an embeddings store and a model.
  * Reference: `VectorizeJob`, core/src/types.rs:12-24 + vectorize.job
  * catalog row, core/src/query.rs:205-220.
  */
final case class VectorizeJob(
    jobName: String,
    srcTable: String,
    srcColumns: Seq[String],
    primaryKey: String,
    updateTimeCol: Option[String],
    model: Model,
    tableMethod: TableMethod = TableMethod.Join,
    indexDist: IndexDist = IndexDist.PgvHnswCosine,
    schedule: String = "realtime",
    params: Map[String, String] = Map.empty
)

/** Interpreted form of `VectorizeJob.schedule` (reference:
  * extension/src/api.rs:90-105 treats 'realtime' as the trigger-based
  * mode switch, extension/src/init.rs:37-53 skips 'manual' and hands
  * any other string to pg_cron's `cron.schedule(...job_execute...)`).
  * Spark mapping: Realtime → Structured Streaming
  * (graft.streaming.Realtime.start); Manual → caller-invoked
  * refreshJob only; Cron → graft.streaming.JobScheduler firing
  * refreshJob (= job_execute) at matching minutes.
  */
sealed trait Schedule
object Schedule {
  case object Realtime extends Schedule
  case object Manual extends Schedule

  /** Standard 5-field cron (minute hour day-of-month month
    * day-of-week), with `*`, lists, ranges, and steps. Matching
    * follows the classic vixie-cron day rule: when BOTH dom and dow
    * are restricted, a time matches if EITHER field matches;
    * otherwise both must match.
    */
  final case class Cron(minute: Set[Int], hour: Set[Int], dom: Set[Int],
      month: Set[Int], dow: Set[Int], domStar: Boolean, dowStar: Boolean)
      extends Schedule {
    def matches(t: java.time.ZonedDateTime): Boolean = {
      val dayOk =
        if (domStar && dowStar) true
        else if (domStar) dow(t.getDayOfWeek.getValue % 7)
        else if (dowStar) dom(t.getDayOfMonth)
        else dom(t.getDayOfMonth) || dow(t.getDayOfWeek.getValue % 7)
      minute(t.getMinute) && hour(t.getHour) && month(t.getMonthValue) && dayOk
    }
  }

  private def parseField(f: String, min: Int, max: Int): Either[String, Set[Int]] = {
    def one(part: String): Either[String, Seq[Int]] = {
      val (rangePart, stepOpt) = part.split("/", 2) match {
        case Array(r) => (r, None)
        case Array(r, s) => (r, Some(s.toIntOption.getOrElse(-1)))
      }
      val step = stepOpt.getOrElse(1)
      if (step < 1) Left(s"bad step in '$part'")
      else {
        val bounds = rangePart match {
          case "*" => Right((min, max))
          case r if r.contains("-") => r.split("-", 2) match {
            case Array(a, b) => (a.toIntOption, b.toIntOption) match {
              case (Some(x), Some(y)) => Right((x, y))
              case _ => Left(s"bad range '$r'")
            }
          }
          // vixie cron: a bare number WITH a step means "from n to max
          // by step" (`5/2` ≡ `5-59/2` in the minute field), not the
          // single value {n} — treating it as {n} would make such
          // schedules fire far less often than users expect
          case n => n.toIntOption.toRight(s"bad number '$n'")
            .map(x => if (stepOpt.isDefined) (x, max) else (x, x))
        }
        bounds.flatMap { case (a, b) =>
          if (a < min || b > max || a > b) Left(s"'$part' out of range $min-$max")
          else Right(a.to(b, step))
        }
      }
    }
    f.split(",").foldLeft(Right(Set.empty[Int]): Either[String, Set[Int]]) {
      (acc, part) => acc.flatMap(s => one(part).map(s ++ _))
    }
  }

  /** Parse a schedule string; Left(reason) on garbage so createJob
    * rejects it up front (the reference fails at cron.schedule time).
    */
  def parse(s: String): Either[String, Schedule] = s.trim.toLowerCase match {
    case "realtime" => Right(Realtime)
    case "manual" => Right(Manual)
    case cron =>
      cron.split("\\s+") match {
        case Array(mi, h, dm, mo, dw) =>
          // dow accepts 0-7 with both 0 and 7 meaning Sunday (vixie)
          for {
            minute <- parseField(mi, 0, 59)
            hour <- parseField(h, 0, 23)
            dom <- parseField(dm, 1, 31)
            month <- parseField(mo, 1, 12)
            dowRaw <- parseField(dw, 0, 7)
          } yield Cron(minute, hour, dom, month,
            dowRaw.map(_ % 7), domStar = dm == "*", dowStar = dw == "*")
        case _ => Left(
          s"invalid schedule '$s': expected 'realtime', 'manual', or 5-field cron")
      }
  }

  def parseUnsafe(s: String): Schedule = parse(s).fold(
    err => throw new IllegalArgumentException(err), identity)
}

/** A row ready for embedding: pkey (as text), rendered input text, and
  * its token estimate. Reference: `Inputs`,
  * core/src/transformers/types.rs:28-33.
  */
final case class EmbedInput(recordId: String, text: String, tokenEstimate: Int)

/** One embedded row keyed back to its source primary key.
  * Reference: `PairedEmbeddings`, core/src/transformers/types.rs:35-39.
  */
final case class PairedEmbedding(recordId: String, embedding: Array[Float])

/** Queue message: a micro-batch of record ids for one job.
  * Reference: `JobMessage`, core/src/types.rs:138-142.
  */
final case class JobMessage(jobName: String, recordIds: Seq[String])

/** F11 — `${VAR}` environment interpolation in config strings
  * (API keys, base URLs). Reference:
  * core/src/transformers/generic.rs:14-40 + the GUC helper
  * extension/src/api.rs:225-230: every distinct placeholder must
  * resolve or the whole interpolation errors.
  */
object EnvInterpolation {
  private val placeholderRe = """\$\{([^}]+)\}""".r

  /** All distinct placeholder names, or None if the string has none
    * (find_placeholders, generic.rs:19-30).
    */
  def findPlaceholders(s: String): Option[Seq[String]] = {
    val names = placeholderRe.findAllMatchIn(s).map(_.group(1)).toSeq.distinct
    if (names.isEmpty) None else Some(names)
  }

  /** Replace every `${NAME}` with its value from `env`; a missing
    * variable is an error (interpolate, generic.rs:32-41).
    */
  def interpolate(s: String,
      env: String => Option[String] = sys.env.get): Either[String, String] =
    findPlaceholders(s) match {
      case None => Right(s)
      case Some(names) =>
        names.foldLeft(Right(s): Either[String, String]) { (acc, name) =>
          acc.flatMap { cur =>
            env(name) match {
              case Some(v) => Right(cur.replace(s"$${$name}", v))
              case None => Left(s"failed to get env var: $name")
            }
          }
        }
    }
}

/** Identifier validation — alphanumeric + underscore only. Required
  * before splicing any user-supplied identifier into `expr()` /
  * `col()` strings. Reference: `check_input`,
  * core/src/query.rs:194-203.
  */
object Identifiers {
  def isValid(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_')
  def validate(s: String): String =
    if (isValid(s)) s
    else throw new IllegalArgumentException(s"invalid identifier: '$s'")
}
