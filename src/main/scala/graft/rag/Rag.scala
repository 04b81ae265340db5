package graft.rag

/** Prompt templates + context-window enforcement for the RAG path.
  * Mirrors vectorize.prompts (extension/sql/meta.sql:9-13,48-57) and
  * the render/trim pipeline (extension/src/chat/ops.rs:106-276).
  */
final case class RenderedPrompt(sysPrompt: String, userPrompt: String)

object PromptTemplates {

  /** Seeded `question_answer` template
    * (extension/sql/meta.sql:48-57): `{{context_str}}` /
    * `{{query_str}}` placeholders, Handlebars in the reference — our
    * templates only use simple variable substitution, so a direct
    * replace is semantically identical.
    */
  private val builtin: Map[String, (String, String)] = Map(
    "question_answer" -> ((
      "You are an expert Q&A system.\nAlways answer the query using the provided context information, and not prior knowledge.",
      "Context information is below.\n---------------------\n{{context_str}}\n---------------------\nGiven the context information and not prior knowledge, answer the query.\nQuery: {{query_str}}\nAnswer: "
    ))
  )

  // Process-wide registrations for library users without a warehouse.
  // Engine-scoped templates PERSIST instead (VectorizeEngine.
  // registerPrompt → prompt_catalog table), like vectorize.prompts
  // rows survive a Postgres restart; an engine resolves its own
  // catalog first, then falls back here.
  private val custom = scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  def register(promptType: String, sysPrompt: String, userPrompt: String): Unit =
    custom.put(promptType, (sysPrompt, userPrompt))

  /** (sys_prompt, user_prompt) for a task from the process-wide maps
    * (custom overrides builtin, like an UPDATE on vectorize.prompts).
    */
  def resolve(task: String): Option[(String, String)] =
    custom.get(task).orElse(builtin.get(task))

  private val placeholderRe = """\{\{(\w+)\}\}""".r

  /** Single-pass substitution: substituted VALUES are never re-
    * scanned, so a retrieved document containing the literal
    * "{{query_str}}" cannot have the user query spliced into it
    * (sequential .replace chains have exactly that injection).
    */
  private def substitute(tpl: String, vars: Map[String, String]): String =
    placeholderRe.replaceAllIn(tpl, m =>
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(m.group(1), m.matched)))

  /** Render a resolved (sys, user) template pair. */
  def renderTemplate(tpl: (String, String), contextStr: String,
      queryStr: String): RenderedPrompt =
    RenderedPrompt(
      tpl._1,
      substitute(tpl._2, Map("context_str" -> contextStr, "query_str" -> queryStr)))

  def render(task: String, contextStr: String, queryStr: String): RenderedPrompt =
    renderTemplate(resolve(task).getOrElse(
      throw new IllegalArgumentException(s"unknown prompt task: $task")),
      contextStr, queryStr)
}

object ContextWindow {

  /** Model context sizes (extension/src/chat/ops.rs:96-106 resolves
    * via tiktoken model metadata; static map here).
    */
  val contextSize: Map[String, Int] = Map(
    "gpt-4o" -> 128000, "gpt-4o-mini" -> 128000, "gpt-4" -> 8192,
    "gpt-3.5-turbo" -> 16385
  ).withDefaultValue(8192)

  /** Whitespace token estimate (matches the engine's F9 policy). */
  def tokenEstimate(s: String): Int =
    if (s == null || s.trim.isEmpty) 0 else s.trim.split("\\s+").length

  /** Enforce the window (extension/src/chat/ops.rs:196-276): if over
    * budget and forceTrim, keep the head of the user prompt;
    * otherwise error — exactly the reference's behavior.
    */
  def enforce(model: String, p: RenderedPrompt, forceTrim: Boolean): RenderedPrompt = {
    val budget = contextSize(model.split('/').last)
    val total = tokenEstimate(p.sysPrompt) + tokenEstimate(p.userPrompt)
    if (total <= budget) p
    else if (!forceTrim)
      throw new IllegalArgumentException(
        s"prompt ($total tokens) exceeds model context window ($budget); set force_trim")
    else {
      val keep = (budget - tokenEstimate(p.sysPrompt)).max(0)
      val toks = p.userPrompt.trim.split("\\s+").take(keep)
      p.copy(userPrompt = toks.mkString(" "))
    }
  }
}
