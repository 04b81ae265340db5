package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 moved the classic `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. Declaring this object inside the `org.apache.spark.sql`
  * package (legal in our own source tree — it adds no code to Spark's
  * jars) is the supported-shape escape hatch for libraries that define
  * native Catalyst expressions and want to expose them as `Column`s
  * without going through the string-based `expr()` parser.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a builder-based SQL function on a LIVE session (the
    * classic FunctionRegistry is private[sql]; SparkSessionExtensions
    * only applies at session construction).
    */
  def registerFunction(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** Register a TABLE function (`SELECT * FROM f(...)`) on a live
    * session — the TableFunctionRegistry is behind the same
    * `private[sql]` sessionState as the scalar registry above. The
    * builder maps the call-site argument expressions to the logical
    * plan the FROM clause resolves to.
    */
  def registerTableFunction(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)

  /** The analyzed logical plan of a DataFrame — what a table-function
    * builder returns so `FROM f(...)` resolves to the frame's plan.
    */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
