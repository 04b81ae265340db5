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

/** Folds every [[VectorizeEmbed]] in a plan into a literal vector by
  * calling the job's provider once on the driver (the proxy resolves
  * the job's model the same way, proxy/src/embeddings.rs:126-167).
  * Installed per-engine via [[VectorizeEngine.enableSqlFunctions]]
  * (runtime, `spark.experimental.extraOptimizations`) or cluster-wide
  * via [[GraftExtensions]].
  */
final class ResolveVectorizeEmbed(engine: VectorizeEngine) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VectorizeEmbed(q, j) if q.foldable && j.foldable =>
        val queryText = Option(q.eval()).map(_.toString).getOrElse(
          throw new IllegalArgumentException("vectorize_embed: query text is null"))
        val jobName = Option(j.eval()).map(_.toString).getOrElse(
          throw new IllegalArgumentException("vectorize_embed: job name is null"))
        val vec = engine.encode(jobName, queryText)
        Literal.create(vec, ArrayType(FloatType, containsNull = false))
      case e: VectorizeEmbed =>
        throw new IllegalArgumentException(
          s"vectorize_embed arguments must be literals (constant-folded on the driver), got: ${e.sql}")
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
  }
}
