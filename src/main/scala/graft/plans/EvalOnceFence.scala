package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Type-preserving evaluate-ONCE optimizer fence: an identity
  * pass-through that is pure in fact but DECLARED nondeterministic,
  * so `PushDownPredicates` never substitutes the wrapped expression
  * into a filter that references its alias and `CollapseProject`
  * never duplicates it into multiple consumers — the measured
  * double-evaluation traps (sample_quality_weighted's quality chain
  * appeared in both FilterExec and ProjectExec without the fence).
  *
  * This replaces the earlier `udf((d: java.lang.Double) => d)` fence,
  * which silently CAST any non-double input to double (ADVICE r14 —
  * nulls/precision corruption that still "worked"). Here
  * `dataType`/`nullable` come from the child, so the fence preserves
  * any type exactly; and `doGenCode` delegates straight to the
  * child's generated code, so unlike the UDF the fenced expression
  * stays inside whole-stage codegen with zero per-row overhead.
  */
case class EvalOnceFence(child: Expression)
    extends UnaryExpression with Nondeterministic {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_once"
  // no state to initialize — the Nondeterministic mix-in exists only
  // to flip `deterministic`/`foldable` off (the optimizer fence)
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    child.eval(input)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): EvalOnceFence =
    copy(child = newChild)
}
