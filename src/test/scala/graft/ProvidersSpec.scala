package graft

import graft.providers._
import graft.types.{Model, ModelSource}
import org.scalatest.funsuite.AnyFunSuite

/** Request/response codec parity with the reference's per-provider
  * shapes (core/src/transformers/providers/{openai,ollama,cohere}.rs).
  * Zero-egress: only request bodies and canned response parsing are
  * exercised — exactly the layer the reference unit-tests.
  */
class ProvidersSpec extends AnyFunSuite {

  test("openai-compatible request: {model, input[]} with JSON escaping") {
    val p = new OpenAICompatProvider("http://x/v1")
    val body = p.requestBody("text-embedding-ada-002", Seq("""say "hi"""", "line\nbreak"))
    assert(body ==
      """{"model":"text-embedding-ada-002","input":["say \"hi\"","line\nbreak"]}""")
  }

  test("openai-compatible response: data[].embedding arrays in order") {
    val resp =
      """{"object":"list","data":[
        |{"object":"embedding","index":0,"embedding":[0.1,0.2,0.3]},
        |{"object":"embedding","index":1,"embedding":[1.5,-2.0,4.25]}],
        |"model":"text-embedding-ada-002","usage":{"prompt_tokens":2}}""".stripMargin
    val vecs = new OpenAICompatProvider("http://x/v1").parseEmbeddings(resp)
    assert(vecs.length == 2)
    assert(vecs(0).toSeq == Seq(0.1f, 0.2f, 0.3f))
    assert(vecs(1).toSeq == Seq(1.5f, -2.0f, 4.25f))
  }

  test("ollama request/response shapes (ollama.rs:23-66)") {
    val p = new OllamaProvider()
    assert(p.requestBody("nomic-embed-text", Seq("a", "b")) ==
      """{"model":"nomic-embed-text","input":["a","b"]}""")
    val resp = """{"model":"nomic-embed-text","embeddings":[[0.5,0.25],[1.0,2.0]]}"""
    val vecs = p.parseEmbeddings(resp)
    assert(vecs.map(_.toSeq) == Seq(Seq(0.5f, 0.25f), Seq(1.0f, 2.0f)))
  }

  test("ollama chat: joined prompt, /api/generate body, 'response' field") {
    val p = new OllamaProvider()
    assert(p.chatRequestBody("llama2", "sys\n\nuser q") ==
      """{"model":"llama2","prompt":"sys\n\nuser q","stream":false}""")
    assert(p.parseChatResponse("""{"model":"llama2","response":"an answer","done":true}""")
      == "an answer")
  }

  test("chat response string unescaping covers \\b and \\f (not literal b/f)") {
    val p = new OllamaProvider()
    assert(p.parseChatResponse("""{"response":"a\bb\fc\nd"}""") == "a\bb\fc\nd")
    // round-trip: Json.str escapes control chars as \uXXXX, which the
    // extractor already decodes
    val encoded = p.chatRequestBody("m", "x\by\fz")
    assert(encoded.contains("\\u0008") && encoded.contains("\\u000c"))
  }

  test("content extraction anchors to a KEY, not the first text occurrence") {
    val p = new OllamaProvider()
    // an earlier string VALUE contains the literal "response" (quotes
    // and all) — the extractor must skip it and find the real field
    assert(p.parseChatResponse(
      """{"model":"the \"response\" machine","response":"real answer"}""")
      == "real answer")
    // same with the key text unescaped inside a value
    assert(p.parseChatResponse(
      """{"note":"set "response": field","response":"yes"}""".replace("\"response\": f",
        "\\\"response\\\": f")) == "yes")
    // an object-valued field of the same name is skipped, the later
    // string-valued one wins
    assert(Json.extractString(
      """{"content":{"nested":1},"wrap":{"content":"inner"}}""", "content")
      .contains("inner"))
    // value text that LOOKS like a key:value pair inside a string
    assert(Json.extractString(
      """{"a":"\"content\":\"fake\"","content":"true one"}""", "content")
      .contains("true one"))
  }

  test("cohere request carries input_type and truncate (cohere.rs:34-50)") {
    val p = new CohereProvider("key")
    assert(p.requestBody("embed-english-v3.0", Seq("doc one")) ==
      """{"model":"embed-english-v3.0","texts":["doc one"],""" +
        """"input_type":"search_document","truncate":"END"}""")
    val resp = """{"id":"x","embeddings":[[0.1,0.9],[0.2,0.8]],"meta":{}}"""
    assert(p.parseEmbeddings(resp).map(_.toSeq) == Seq(Seq(0.1f, 0.9f), Seq(0.2f, 0.8f)))
  }

  test("cohere dims: static table, unknown model errors (cohere.rs:101-107)") {
    val p = new CohereProvider("key")
    assert(p.modelDim("cohere/embed-english-v3.0") == 1024)
    assert(p.modelDim("embed-english-light-v3.0") == 384)
    assert(p.modelDim("embed-multilingual-v2.0") == 768)
    intercept[IllegalArgumentException](p.modelDim("not-a-model"))
  }

  test("openai chat request: system+user messages; content extraction") {
    val p = new OpenAIChatProvider("http://x/v1")
    assert(p.requestBody("openai/gpt-4o-mini", "be terse", "why?") ==
      """{"model":"gpt-4o-mini","messages":[{"role":"system","content":"be terse"},""" +
        """{"role":"user","content":"why?"}]}""")
    val resp =
      """{"id":"c1","choices":[{"index":0,"message":{"role":"assistant",
        |"content":"Because \"escaped\" text\nworks."},"finish_reason":"stop"}]}""".stripMargin
    assert(p.parseResponse(resp) == "Because \"escaped\" text\nworks.")
  }

  test("voyage request carries input_type document (voyage.rs:17-32)") {
    val p = new VoyageProvider("key")
    assert(p.requestBody("voyage/voyage-2", Seq("doc one", "doc two")) ==
      """{"input":["doc one","doc two"],"model":"voyage-2","input_type":"document"}""")
    val resp = """{"object":"list","data":[{"embedding":[0.5,-0.5]},{"embedding":[1.0,2.0]}]}"""
    assert(p.parseEmbeddings(resp).map(_.toSeq) == Seq(Seq(0.5f, -0.5f), Seq(1.0f, 2.0f)))
  }

  test("portkey: openai body, portkey auth headers, chat (portkey.rs:15-141)") {
    val p = new PortkeyProvider("pk", "vk")
    assert(p.requestBody("portkey/text-embedding-3-small", Seq("a")) ==
      """{"model":"text-embedding-3-small","input":["a"]}""")
    assert(p.headers == Map(
      "x-portkey-api-key" -> "pk", "x-portkey-virtual-key" -> "vk"))
    val resp = """{"data":[{"embedding":[0.25,0.75]}]}"""
    assert(p.parseEmbeddings(resp).map(_.toSeq) == Seq(Seq(0.25f, 0.75f)))
    assert(p.chatRequestBody("gpt-4o", "sys", "q") ==
      """{"model":"gpt-4o","messages":[{"role":"system","content":"sys"},""" +
        """{"role":"user","content":"q"}]}""")
    assert(p.parseChatResponse(
      """{"choices":[{"message":{"role":"assistant","content":"ok"}}]}""") == "ok")
  }

  test("provider routing matches model source") {
    assert(Providers.forModel(Model.parseUnsafe("deterministic/hash-64"))
      .isInstanceOf[DeterministicHashProvider])
    assert(Providers.forModel(Model.parseUnsafe("ollama/llama2"))
      .isInstanceOf[OllamaProvider])
    assert(Providers.forModel(Model.parseUnsafe("cohere/embed-english-v3.0"),
      apiKey = Some("k")).isInstanceOf[CohereProvider])
    assert(Providers.forModel(Model.parseUnsafe("openai/text-embedding-3-small"))
      .isInstanceOf[OpenAICompatProvider])
    assert(Providers.forModel(Model.parseUnsafe("voyage/voyage-2"),
      apiKey = Some("k")).isInstanceOf[VoyageProvider])
    // unknown namespaces → sentence-transformers → openai-compatible shape
    assert(Model.parseUnsafe("whatever").source == ModelSource.SentenceTransformers)
    assert(Providers.chatForModel(Model.parseUnsafe("ollama/llama2"))
      .isInstanceOf[OllamaProvider])
    assert(Providers.chatForModel(Model.parseUnsafe("openai/gpt-4o-mini"))
      .isInstanceOf[OpenAIChatProvider])
  }

  test("request chunking: provider input caps are 2048 (openai.rs:90-100, portkey.rs:55-66)") {
    // pins the ACTUAL provider constants generateEmbeddings chunks by
    assert(new OpenAICompatProvider("http://x/v1").maxInputsPerRequest == 2048)
    assert(new PortkeyProvider("pk", "vk").maxInputsPerRequest == 2048)
  }
}
