package graft.plans

import graft.VectorizeEngine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** `vectorize_embed('query text', 'job_name')` — the SQL-inline
  * embedding call of the reference's wire-protocol proxy
  * (proxy/src/embeddings.rs:66-182): the proxy regex-parses
  * `vectorize.embed(...)` out of incoming SQL, embeds the text once,
  * and splices a `'[...]'::vector` literal back into the statement
  * before Postgres sees it.
  *
  * The Catalyst-native equivalent is an UNEVALUABLE placeholder
  * expression plus a plan rule that replaces it with a
  * `Literal(ArrayType(FloatType))` after embedding the text ON THE
  * DRIVER — one provider call per query, zero per row, exactly the
  * proxy's contract. The rewrite is a plan-to-plan transformation, so
  * no wire protocol, regex, or string splicing exists anywhere.
  */
case class VectorizeEmbed(query: Expression, job: Expression)
    extends Expression with Unevaluable {
  override def children: Seq[Expression] = Seq(query, job)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vectorize_embed"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(query = newChildren(0), job = newChildren(1))
}

/** `vectorize_generate('prompt'[, 'model'])` — the reference's chat
  * scalar (`vectorize.generate`, extension/src/api.rs:207-223) as the
  * same driver-folded placeholder shape as [[VectorizeEmbed]]: the
  * chat call is a provider boundary, so it happens exactly once on
  * the driver when the engine rule folds the expression into a string
  * literal — never per row on executors.
  */
case class VectorizeGenerate(input: Expression, model: Expression)
    extends Expression with Unevaluable {
  override def children: Seq[Expression] = Seq(input, model)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = false
  override def prettyName: String = "vectorize_generate"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(input = newChildren(0), model = newChildren(1))
}

/** `vectorize_encode('text'[, 'model_or_job'])` — the reference's
  * `vectorize.encode`/`transform_embeddings` scalars
  * (extension/src/api.rs:159-177) with the same driver-folding
  * contract; the second argument resolves a job name first, then a
  * raw model string, like [[VectorizeEngine.encode]].
  */
case class VectorizeEncode(input: Expression, model: Expression)
    extends Expression with Unevaluable {
  override def children: Seq[Expression] = Seq(input, model)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vectorize_encode"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(input = newChildren(0), model = newChildren(1))
}

/** Folds every [[VectorizeEmbed]] / [[VectorizeEncode]] /
  * [[VectorizeGenerate]] in a plan into a literal by calling the
  * provider once on the driver (the proxy resolves the job's model
  * the same way, proxy/src/embeddings.rs:126-167). Installed
  * per-engine via [[VectorizeEngine.enableSqlFunctions]] (runtime,
  * `spark.experimental.extraOptimizations`) or cluster-wide via
  * [[GraftExtensions]].
  */
final class ResolveVectorizeEmbed(engine: VectorizeEngine) extends Rule[LogicalPlan] {
  private def lit(e: Expression, fn: String, what: String): String =
    Option(e.eval()).map(_.toString).getOrElse(
      throw new IllegalArgumentException(s"$fn: $what is null"))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VectorizeEmbed(q, j) if q.foldable && j.foldable =>
        val vec = engine.encode(lit(j, "vectorize_embed", "job name"),
          lit(q, "vectorize_embed", "query text"))
        Literal.create(vec, ArrayType(FloatType, containsNull = false))
      case VectorizeEncode(in, m) if in.foldable && m.foldable =>
        val vec = engine.encode(lit(m, "vectorize_encode", "model"),
          lit(in, "vectorize_encode", "input text"))
        Literal.create(vec, ArrayType(FloatType, containsNull = false))
      case VectorizeGenerate(in, m) if in.foldable && m.foldable =>
        Literal.create(engine.generate(lit(in, "vectorize_generate", "input"),
          lit(m, "vectorize_generate", "model")),
          org.apache.spark.sql.types.StringType)
      case e @ (_: VectorizeEmbed | _: VectorizeEncode | _: VectorizeGenerate) =>
        throw new IllegalArgumentException(
          s"${e.prettyName} arguments must be literals (constant-folded on the driver), got: ${e.sql}")
    }
}

/** `SparkSessionExtensions` installer for cluster-wide use
  * (`spark.sql.extensions=graft.plans.GraftExtensions`): registers
  * the native vector expressions as SQL functions. The
  * vectorize_embed RULE is engine-scoped (it needs a job catalog +
  * provider), so it is installed per-engine by
  * [[VectorizeEngine.enableSqlFunctions]] instead.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    VectorExpressions.registrations.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

/** Runtime registration helpers for an already-running session (the
  * classic-session FunctionRegistry is private[sql]; the bridge in
  * org.apache.spark.sql makes registration legal from library code).
  */
object GraftSqlFunctions {
  def registerAll(spark: SparkSession): Unit = {
    VectorExpressions.registrations.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, ident, info, builder)
    }
    org.apache.spark.sql.GraftColumnBridge.registerFunction(
      spark,
      org.apache.spark.sql.catalyst.FunctionIdentifier("vectorize_embed"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorizeEmbed].getName, null, "vectorize_embed",
        "_FUNC_(query, job) - embed query text with the job's model (driver-folded)", ""),
      (es: Seq[Expression]) => VectorizeEmbed(es(0), es(1)))
    // the reference's scalar twins (extension/src/api.rs:159-223),
    // with its default models when the model argument is omitted
    org.apache.spark.sql.GraftColumnBridge.registerFunction(
      spark,
      org.apache.spark.sql.catalyst.FunctionIdentifier("vectorize_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorizeEncode].getName, null, "vectorize_encode",
        "_FUNC_(input[, model_or_job]) - embed input text (driver-folded)", ""),
      (es: Seq[Expression]) => VectorizeEncode(es(0),
        es.lift(1).getOrElse(
          Literal.create(VectorizeEngine.DefaultEmbedModel,
            org.apache.spark.sql.types.StringType))))
    org.apache.spark.sql.GraftColumnBridge.registerFunction(
      spark,
      org.apache.spark.sql.catalyst.FunctionIdentifier("vectorize_generate"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorizeGenerate].getName, null, "vectorize_generate",
        "_FUNC_(input[, chat_model]) - one chat completion (driver-folded)", ""),
      (es: Seq[Expression]) => VectorizeGenerate(es(0),
        es.lift(1).getOrElse(
          Literal.create(VectorizeEngine.DefaultChatModel,
            org.apache.spark.sql.types.StringType))))
  }
}
