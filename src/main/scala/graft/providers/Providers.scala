package graft.providers

import graft.functions.TextAnalyzer

/** Embedding / chat provider abstraction.
  *
  * Mirrors the reference's provider trait
  * (`core/src/transformers/providers/mod.rs:30-50`): batch text →
  * vectors, plus a model-dimension probe used at job init
  * (`core/src/init.rs:149-151`). Implementations must be
  * `Serializable` — they are shipped to executors inside
  * `mapPartitions` closures (SURVEY §3.1 Spark shape).
  */
trait EmbeddingProvider extends Serializable {

  /** Embedding dimension for `model` (job-init probe). */
  def modelDim(model: String): Int

  /** Embed a batch of inputs. Implementations handle their own
    * request chunking (the reference caps at 2048 inputs per HTTP
    * call, openai.rs:90-100).
    */
  def generateEmbeddings(model: String, inputs: Seq[String]): Seq[Array[Float]]
}

trait ChatProvider extends Serializable {
  def generateResponse(model: String, sysPrompt: String, userPrompt: String): String
}

/** Deterministic, network-free embedding provider for tests and CI.
  *
  * Token-hash embeddings: each token maps (via FNV-1a) to a fixed
  * pseudo-random direction; a document's vector is the L2-normalized
  * sum of its token directions. Identical texts → identical vectors;
  * high token overlap → high cosine. A small synonym-cluster table
  * canonicalizes related words so the reference's semantic-ordering
  * test assertions (FIXTURES.md §2: "food"→pizza, "apples"→apple
  * trees, "astronauts"→space shuttle) are reproducible without a
  * model server.
  */
final class DeterministicHashProvider(dim: Int = 64) extends EmbeddingProvider {

  private val clusters: Map[String, String] = {
    val groups = Seq(
      Seq("food", "pizza", "eat", "meal", "cuisine", "apple", "apples", "fruit"),
      Seq("space", "astronaut", "astronauts", "shuttle", "rocket", "orbit", "nasa"),
      Seq("write", "writing", "pencil", "pen", "paper", "notebook"),
      Seq("travel", "airplane", "flight", "luggage", "backpack", "camping", "tent"),
      Seq("computer", "laptop", "electronics", "mouse", "keyboard", "monitor", "wireless")
    )
    groups.flatMap(g => g.map(w => w -> g.head)).toMap
  }

  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  private def tokenDirection(tok: String): Array[Float] = {
    val out = new Array[Float](dim)
    var h = fnv(tok)
    var i = 0
    while (i < dim) {
      // xorshift64* chain → reproducible pseudo-random components
      h ^= h >>> 12; h ^= h << 25; h ^= h >>> 27
      out(i) = ((h * 0x2545F4914F6CDD1DL) >> 40).toFloat / (1 << 23).toFloat
      i += 1
    }
    out
  }

  def embedOne(text: String): Array[Float] = {
    val acc = new Array[Float](dim)
    val toks = TextAnalyzer.tokenize(text).map(t => clusters.getOrElse(t, t))
    toks.foreach { t =>
      val d = tokenDirection(t)
      var i = 0
      while (i < dim) { acc(i) += d(i); i += 1 }
    }
    var norm = 0.0
    acc.foreach(v => norm += v.toDouble * v)
    val n = math.sqrt(norm)
    if (n > 0) { var i = 0; while (i < dim) { acc(i) = (acc(i) / n).toFloat; i += 1 } }
    acc
  }

  override def modelDim(model: String): Int = dim

  override def generateEmbeddings(model: String, inputs: Seq[String]): Seq[Array[Float]] =
    inputs.map(embedOne)
}

/** Deterministic chat provider: echoes a digest of the prompt —
  * enough to test the RAG pipeline's plumbing (retrieve → render →
  * trim → respond) without a network model.
  */
final class DeterministicChatProvider extends ChatProvider {
  override def generateResponse(model: String, sysPrompt: String, userPrompt: String): String = {
    val ctx = userPrompt.linesIterator.take(3).mkString(" ").take(200)
    s"[$model] $ctx"
  }
}

/** Minimal JSON helpers for provider payloads (no external deps —
  * build.sbt is intentionally closed).
  */
private[graft] object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Extract the first JSON string value whose KEY is `key` (used for
    * chat response bodies: OpenAI `choices[].message.content`, Ollama
    * `response`). Handles standard escapes incl. \uXXXX.
    *
    * The scan tokenizes every string it passes (escape-aware), so a
    * VALUE that happens to contain the text `"key"` can never match —
    * a token only counts as a key when the next non-space character is
    * ':' (in valid JSON a value string is followed by ',', '}' or ']',
    * never ':'). Key occurrences whose value is not a string are
    * skipped and the scan continues (e.g. an object-valued field of
    * the same name earlier in the body).
    */
  def extractString(body: String, key: String): Option[String] = {
    val n = body.length
    // decode the string token starting at the opening quote `start`;
    // returns (decoded value, index just past the closing quote)
    def readString(start: Int): Option[(String, Int)] = {
      val sb = new StringBuilder
      var j = start + 1
      while (j < n) {
        body.charAt(j) match {
          case '"' => return Some((sb.toString, j + 1))
          case '\\' if j + 1 < n =>
            body.charAt(j + 1) match {
              case 'n' => sb += '\n'; j += 1
              case 'r' => sb += '\r'; j += 1
              case 't' => sb += '\t'; j += 1
              case 'b' => sb += '\b'; j += 1
              case 'f' => sb += '\f'; j += 1
              case 'u' if j + 5 < n =>
                sb += Integer.parseInt(body.substring(j + 2, j + 6), 16).toChar
                j += 5
              case c => sb += c; j += 1
            }
          case c => sb += c
        }
        j += 1
      }
      None
    }
    var i = 0
    while (i < n) {
      if (body.charAt(i) == '"') {
        readString(i) match {
          case Some((tok, after)) =>
            var k = after
            while (k < n && body.charAt(k).isWhitespace) k += 1
            if (k < n && body.charAt(k) == ':' && tok == key) {
              k += 1
              while (k < n && body.charAt(k).isWhitespace) k += 1
              if (k < n && body.charAt(k) == '"')
                return readString(k).map(_._1)
              // non-string value under this key: keep scanning
            }
            i = after
          case None => return None // unterminated string
        }
      } else i += 1
    }
    None
  }

  /** Extract all float arrays under `"embedding": [...]`-style keys.
    * Tolerant line-oriented scan good enough for the fixed provider
    * response shapes (OpenAI `data[].embedding`, Ollama `embeddings`,
    * Cohere `embeddings.float`).
    */
  def extractFloatArrays(body: String, key: String): Seq[Array[Float]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val marker = "\"" + key + "\""
    var idx = body.indexOf(marker)
    while (idx >= 0) {
      val open = body.indexOf('[', idx)
      if (open >= 0) {
        var depth = 0
        var i = open
        var close = -1
        while (close < 0 && i < body.length) {
          body.charAt(i) match {
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        if (close > open) {
          val inner = body.substring(open + 1, close)
          // either a flat array or an array of arrays
          if (inner.contains('[')) {
            inner.split("\\]").foreach { piece =>
              val nums = piece.dropWhile(c => c != '[').drop(1)
              if (nums.exists(c => c.isDigit))
                out += nums.split(',').filter(_.trim.nonEmpty).map(_.trim.toFloat)
            }
          } else if (inner.trim.nonEmpty) {
            out += inner.split(',').filter(_.trim.nonEmpty).map(_.trim.toFloat)
          }
          idx = body.indexOf(marker, close)
        } else idx = -1
      } else idx = -1
    }
    out.toSeq
  }
}

/** OpenAI-compatible HTTP embedding provider (`POST {base}/embeddings`
  * with `{"input": [...], "model": "..."}`), covering the reference's
  * openai / vector-serve / portkey request shapes
  * (core/src/transformers/providers/{openai,vector_serve,portkey}.rs).
  *
  * Chunks requests at `maxInputsPerRequest` = 2048 (openai.rs:90-100)
  * and applies the reference's 120 s timeout (openai.rs:109). NOTE:
  * the build/test environment is zero-egress, so this class is
  * exercised only through its request-shaping logic in unit tests;
  * live use requires a reachable endpoint.
  */
final class OpenAICompatProvider(
    baseUrl: String,
    apiKey: Option[String] = None,
    val maxInputsPerRequest: Int = 2048,
    timeoutSec: Int = 120,
    dims: Map[String, Int] = OpenAICompatProvider.knownDims
) extends EmbeddingProvider {

  override def modelDim(model: String): Int =
    dims.getOrElse(model, dims.getOrElse(model.split('/').last, 1536))

  def requestBody(model: String, inputs: Seq[String]): String =
    s"""{"model":${Json.str(model)},"input":[${inputs.map(Json.str).mkString(",")}]}"""

  /** `data[].embedding` arrays, in request order. */
  def parseEmbeddings(body: String): Seq[Array[Float]] =
    Json.extractFloatArrays(body, "embedding")

  override def generateEmbeddings(model: String, inputs: Seq[String]): Seq[Array[Float]] =
    inputs.grouped(maxInputsPerRequest).toSeq.flatMap { chunk =>
      val vecs = parseEmbeddings(post(requestBody(model, chunk)))
      require(vecs.size == chunk.size,
        s"provider returned ${vecs.size} embeddings for ${chunk.size} inputs")
      vecs
    }

  private def post(body: String): String =
    Http.postJson(s"$baseUrl/embeddings", body, apiKey, timeoutSec)
}

object OpenAICompatProvider {
  /** Known model dims (reference static map, openai.rs:126-138 +
    * cohere.rs:16-26).
    */
  val knownDims: Map[String, Int] = Map(
    "text-embedding-ada-002" -> 1536,
    "text-embedding-3-small" -> 1536,
    "text-embedding-3-large" -> 3072,
    "all-MiniLM-L6-v2" -> 384,
    "all-MiniLM-L12-v2" -> 384,
    "embed-english-v3.0" -> 1024
  )
}

/** Shared HTTP POST used by the concrete providers (JDK client, no
  * external deps; reference uses reqwest with the same 120 s timeout,
  * cohere.rs:88, openai.rs:109).
  */
private[providers] object Http {
  // One shared client: the JDK HttpClient is thread-safe and pools
  // connections; per-request construction would pay a TCP/TLS
  // handshake on every embedding batch of a large backfill.
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(30)).build()

  def postJson(url: String, body: String, apiKey: Option[String],
      timeoutSec: Int = 120,
      extraHeaders: Map[String, String] = Map.empty): String = {
    val b = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(timeoutSec.toLong))
      .header("Accept", "application/json")
      .header("Content-Type", "application/json")
    apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
    extraHeaders.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(
      b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"provider request failed: HTTP ${resp.statusCode()} at $url")
    resp.body()
  }
}

/** Ollama provider (core/src/transformers/providers/ollama.rs:23-66):
  * `POST {base}/api/embed` with `{"model":..., "input":[...]}` →
  * `{"embeddings": [[...], ...]}`. model_dim is probed by embedding
  * "hello world" and measuring the vector (ollama.rs:57-66) — there
  * is no static dim table for arbitrary local models.
  */
final class OllamaProvider(
    baseUrl: String = OllamaProvider.defaultBaseUrl,
    timeoutSec: Int = 120
) extends EmbeddingProvider with ChatProvider {

  def requestBody(model: String, inputs: Seq[String]): String =
    s"""{"model":${Json.str(model)},"input":[${inputs.map(Json.str).mkString(",")}]}"""

  def parseEmbeddings(body: String): Seq[Array[Float]] =
    Json.extractFloatArrays(body, "embeddings")

  override def generateEmbeddings(model: String, inputs: Seq[String]): Seq[Array[Float]] = {
    val vecs = parseEmbeddings(
      Http.postJson(s"$baseUrl/api/embed", requestBody(model, inputs), None, timeoutSec))
    require(vecs.size == inputs.size,
      s"ollama returned ${vecs.size} embeddings for ${inputs.size} inputs")
    vecs
  }

  override def modelDim(model: String): Int =
    generateEmbeddings(model, Seq("hello world")).head.length

  /** Chat: the reference joins all messages into one prompt and calls
    * `/api/generate` (ollama.rs:69-85); response field `response`.
    */
  def chatRequestBody(model: String, prompt: String): String =
    s"""{"model":${Json.str(model)},"prompt":${Json.str(prompt)},"stream":false}"""

  def parseChatResponse(body: String): String =
    Json.extractString(body, "response")
      .getOrElse(throw new RuntimeException("ollama response missing 'response' field"))

  override def generateResponse(model: String, sysPrompt: String, userPrompt: String): String = {
    val prompt = Seq(sysPrompt, userPrompt).filter(_.nonEmpty).mkString("\n\n")
    parseChatResponse(
      Http.postJson(s"$baseUrl/api/generate", chatRequestBody(model, prompt), None, timeoutSec))
  }
}
object OllamaProvider {
  /** ollama.rs:13 */
  val defaultBaseUrl = "http://localhost:3001"
}

/** Cohere provider (core/src/transformers/providers/cohere.rs:16-100):
  * `POST {base}/embed` with
  * `{"model","texts","input_type":"search_document","truncate":"END"}`;
  * dims come from a static model table and an UNKNOWN model is an
  * error (cohere.rs:101-107), unlike the OpenAI-compat default.
  */
final class CohereProvider(
    apiKey: String,
    baseUrl: String = CohereProvider.defaultBaseUrl,
    timeoutSec: Int = 120
) extends EmbeddingProvider {

  def requestBody(model: String, inputs: Seq[String]): String =
    s"""{"model":${Json.str(model)},"texts":[${inputs.map(Json.str).mkString(",")}],""" +
      s""""input_type":"search_document","truncate":"END"}"""

  def parseEmbeddings(body: String): Seq[Array[Float]] =
    Json.extractFloatArrays(body, "embeddings")

  override def generateEmbeddings(model: String, inputs: Seq[String]): Seq[Array[Float]] = {
    val vecs = parseEmbeddings(
      Http.postJson(s"$baseUrl/embed", requestBody(model, inputs), Some(apiKey), timeoutSec))
    require(vecs.size == inputs.size,
      s"cohere returned ${vecs.size} embeddings for ${inputs.size} inputs")
    vecs
  }

  override def modelDim(model: String): Int =
    CohereProvider.modelDimensions.getOrElse(model.split('/').last,
      throw new IllegalArgumentException(s"model not found: $model"))
}
object CohereProvider {
  /** cohere.rs:12 */
  val defaultBaseUrl = "https://api.cohere.com/v1"
  /** cohere.rs:16-26 */
  val modelDimensions: Map[String, Int] = Map(
    "embed-english-v3.0" -> 1024,
    "embed-multilingual-v3.0" -> 1024,
    "embed-english-light-v3.0" -> 384,
    "embed-multilingual-light-v3.0" -> 384,
    "embed-english-v2.0" -> 4096,
    "embed-english-light-v2.0" -> 1024,
    "embed-multilingual-v2.0" -> 768)
}

/** Voyage provider (core/src/transformers/providers/voyage.rs:10-104):
  * `POST {base}/embeddings` with
  * `{"input":[...],"model":...,"input_type":"document"}`, Bearer
  * auth; OpenAI-shaped `data[].embedding` response. Dim is probed by
  * embedding "hello world" (voyage.rs:105-114) — no static table.
  */
final class VoyageProvider(
    apiKey: String,
    baseUrl: String = VoyageProvider.defaultBaseUrl,
    timeoutSec: Int = 120
) extends EmbeddingProvider {

  def requestBody(model: String, inputs: Seq[String]): String =
    s"""{"input":[${inputs.map(Json.str).mkString(",")}],""" +
      s""""model":${Json.str(model.split('/').last)},"input_type":"document"}"""

  def parseEmbeddings(body: String): Seq[Array[Float]] =
    Json.extractFloatArrays(body, "embedding")

  override def generateEmbeddings(model: String, inputs: Seq[String]): Seq[Array[Float]] = {
    val vecs = parseEmbeddings(
      Http.postJson(s"$baseUrl/embeddings", requestBody(model, inputs),
        Some(apiKey), timeoutSec))
    require(vecs.size == inputs.size,
      s"voyage returned ${vecs.size} embeddings for ${inputs.size} inputs")
    vecs
  }

  override def modelDim(model: String): Int =
    generateEmbeddings(model, Seq("hello world")).head.length
}
object VoyageProvider {
  /** voyage.rs:10 */
  val defaultBaseUrl = "https://api.voyageai.com/v1"
}

/** Portkey provider (core/src/transformers/providers/portkey.rs:15-141):
  * OpenAI-shaped body and `data[].embedding` response at
  * `POST {base}/embeddings`, but authenticated with the
  * `x-portkey-api-key` + `x-portkey-virtual-key` headers instead of
  * Bearer; inputs are split into chunks of 2048 (portkey.rs:55-66).
  * Chat goes through `POST {base}/chat/completions` with the same
  * headers (portkey.rs:103-141).
  */
final class PortkeyProvider(
    apiKey: String,
    virtualKey: String,
    baseUrl: String = PortkeyProvider.defaultBaseUrl,
    val maxInputsPerRequest: Int = 2048,
    timeoutSec: Int = 120
) extends EmbeddingProvider with ChatProvider {

  def headers: Map[String, String] = Map(
    "x-portkey-api-key" -> apiKey,
    "x-portkey-virtual-key" -> virtualKey)

  def requestBody(model: String, inputs: Seq[String]): String =
    s"""{"model":${Json.str(model.split('/').last)},"input":[${inputs.map(Json.str).mkString(",")}]}"""

  def parseEmbeddings(body: String): Seq[Array[Float]] =
    Json.extractFloatArrays(body, "embedding")

  override def generateEmbeddings(model: String, inputs: Seq[String]): Seq[Array[Float]] =
    inputs.grouped(maxInputsPerRequest).toSeq.flatMap { chunk =>
      val vecs = parseEmbeddings(
        Http.postJson(s"$baseUrl/embeddings", requestBody(model, chunk),
          None, timeoutSec, headers))
      require(vecs.size == chunk.size,
        s"portkey returned ${vecs.size} embeddings for ${chunk.size} inputs")
      vecs
    }

  override def modelDim(model: String): Int =
    generateEmbeddings(model, Seq("hello world")).head.length

  def chatRequestBody(model: String, sysPrompt: String, userPrompt: String): String =
    OpenAIChatCodec.requestBody(model, sysPrompt, userPrompt)

  def parseChatResponse(body: String): String = OpenAIChatCodec.parseResponse(body)

  override def generateResponse(model: String, sysPrompt: String, userPrompt: String): String =
    parseChatResponse(Http.postJson(s"$baseUrl/chat/completions",
      chatRequestBody(model, sysPrompt, userPrompt), None, timeoutSec, headers))
}
object PortkeyProvider {
  /** portkey.rs:14 */
  val defaultBaseUrl = "https://api.portkey.ai/v1"
}

/** OpenAI chat-completions wire shape, shared by the OpenAI-compat
  * and Portkey chat paths (system+user messages →
  * `choices[0].message.content`).
  */
private[providers] object OpenAIChatCodec {
  def requestBody(model: String, sysPrompt: String, userPrompt: String): String =
    s"""{"model":${Json.str(model.split('/').last)},"messages":[""" +
      s"""{"role":"system","content":${Json.str(sysPrompt)}},""" +
      s"""{"role":"user","content":${Json.str(userPrompt)}}]}"""

  def parseResponse(body: String): String = {
    val msgAt = body.indexOf("\"message\"")
    val tail = if (msgAt >= 0) body.substring(msgAt) else body
    Json.extractString(tail, "content")
      .getOrElse(throw new RuntimeException("chat response missing message content"))
  }
}

/** OpenAI-compatible chat-completions provider for `rag`/`generate`
  * (core/src/transformers/providers/openai.rs chat path).
  */
final class OpenAIChatProvider(
    baseUrl: String,
    apiKey: Option[String] = None,
    timeoutSec: Int = 120
) extends ChatProvider {

  def requestBody(model: String, sysPrompt: String, userPrompt: String): String =
    OpenAIChatCodec.requestBody(model, sysPrompt, userPrompt)

  def parseResponse(body: String): String = OpenAIChatCodec.parseResponse(body)

  override def generateResponse(model: String, sysPrompt: String, userPrompt: String): String =
    parseResponse(Http.postJson(s"$baseUrl/chat/completions",
      requestBody(model, sysPrompt, userPrompt), apiKey, timeoutSec))
}

object Providers {
  /** Resolve an embedding provider for a model source, with the
    * per-source request shapes of the reference
    * (core/src/transformers/providers/mod.rs): distinct Ollama and
    * Cohere codecs; openai/portkey/voyage/sentence-transformers all
    * speak the OpenAI-compatible shape; the deterministic provider
    * backs tests and the "deterministic" namespace.
    */
  def forModel(model: graft.types.Model, baseUrl: Option[String] = None,
      apiKey: Option[String] = None): EmbeddingProvider =
    model.source match {
      case graft.types.ModelSource.Deterministic => new DeterministicHashProvider()
      case graft.types.ModelSource.Ollama =>
        new OllamaProvider(baseUrl.getOrElse(OllamaProvider.defaultBaseUrl))
      case graft.types.ModelSource.Cohere =>
        new CohereProvider(
          apiKey.orElse(sys.env.get("CO_API_KEY")).getOrElse(
            throw new IllegalArgumentException("CO_API_KEY not set")),
          baseUrl.getOrElse(CohereProvider.defaultBaseUrl))
      case graft.types.ModelSource.Voyage =>
        new VoyageProvider(
          apiKey.orElse(sys.env.get("VOYAGE_API_KEY")).getOrElse(
            throw new IllegalArgumentException("VOYAGE_API_KEY not set")),
          baseUrl.getOrElse(VoyageProvider.defaultBaseUrl))
      case graft.types.ModelSource.Portkey =>
        new PortkeyProvider(
          apiKey.orElse(sys.env.get("PORTKEY_API_KEY")).getOrElse(
            throw new IllegalArgumentException("PORTKEY_API_KEY not set")),
          sys.env.getOrElse("PORTKEY_VIRTUAL_KEY",
            throw new IllegalArgumentException("PORTKEY_VIRTUAL_KEY not set")),
          baseUrl.getOrElse(PortkeyProvider.defaultBaseUrl))
      case graft.types.ModelSource.OpenAI =>
        new OpenAICompatProvider(
          baseUrl.getOrElse(Providers.openAiBaseUrl),
          apiKey.orElse(sys.env.get("OPENAI_API_KEY")))
      case _ =>
        // SentenceTransformers and unknown namespaces route to the
        // local model server, reference vector-serve default
        // (core/src/transformers/mod.rs EMBEDDING_SVC_URL).
        new OpenAICompatProvider(
          baseUrl.getOrElse("http://localhost:3000/v1"), apiKey)
    }

  /** Resolve a chat provider for `rag`/`generate` model strings. */
  def chatForModel(model: graft.types.Model, baseUrl: Option[String] = None,
      apiKey: Option[String] = None): ChatProvider =
    model.source match {
      case graft.types.ModelSource.Deterministic => new DeterministicChatProvider()
      case graft.types.ModelSource.Ollama =>
        new OllamaProvider(baseUrl.getOrElse(OllamaProvider.defaultBaseUrl))
      case graft.types.ModelSource.Portkey =>
        new PortkeyProvider(
          apiKey.orElse(sys.env.get("PORTKEY_API_KEY")).getOrElse(
            throw new IllegalArgumentException("PORTKEY_API_KEY not set")),
          sys.env.getOrElse("PORTKEY_VIRTUAL_KEY",
            throw new IllegalArgumentException("PORTKEY_VIRTUAL_KEY not set")),
          baseUrl.getOrElse(PortkeyProvider.defaultBaseUrl))
      case graft.types.ModelSource.OpenAI =>
        new OpenAIChatProvider(baseUrl.getOrElse(Providers.openAiBaseUrl),
          apiKey.orElse(sys.env.get("OPENAI_API_KEY")))
      case _ =>
        new OpenAIChatProvider(baseUrl.getOrElse("http://localhost:3000/v1"), apiKey)
    }

  /** openai.rs:15 */
  val openAiBaseUrl = "https://api.openai.com/v1"
}
