package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector-math hot path.
  *
  * The reference's `<=>` / `<#>` / `<->` pgvector operators
  * (core/src/query.rs:681) run as C loops inside Postgres. The
  * `functions.zip_with`/`aggregate` HOF composition is semantically
  * identical but allocates an intermediate array per row and walks
  * generic `ArrayData` lambdas; these expressions instead emit a
  * single fused Java loop via `doGenCode` — no allocation, stays
  * inside whole-stage codegen. On a 1000-executor scan of 100 TB of
  * embeddings this is the difference between memory-bandwidth-bound
  * and allocation-bound.
  *
  * All three accept `array<float>` (embedding storage type; doubles
  * arrive via implicit cast) and compute in double precision, matching
  * both the HOF versions and the DuckDB oracle.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  // Note: no explicit `Seq[AbstractDataType]` annotation — that type is
  // private[sql] in Spark 4; the inferred Seq[ArrayType] conforms covariantly.
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Per-element accumulation body + final combine, shared by eval and codegen. */
  protected def combine(dot: Double, na: Double, nb: Double): Any
  protected def combineJava(ctx: CodegenContext, dot: String, na: String, nb: String, ev: ExprCode): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Dimension mismatch is a data error, as in pgvector ("different
    // vector dimensions") — silently computing over the common prefix
    // would return a plausible but meaningless score.
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: different vector dimensions $n and ${y.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    combine(dot, na, nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: different vector dimensions " + $n + " and " + $b.numElements());
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${combineJava(ctx, dot, na, nb, ev)}
         |""".stripMargin
    })
}

/** Cosine similarity (= 1 − pgvector `<=>` distance). Null on zero norms. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def combine(dot: Double, na: Double, nb: Double): Any = {
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }
  override protected def combineJava(ctx: CodegenContext, dot: String, na: String, nb: String, ev: ExprCode): String = {
    val denom = ctx.freshName("denom")
    s"""double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
       |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }""".stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Inner product (pgvector `<#>` is its negation). */
case class DotProductExpr(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override protected def combine(dot: Double, na: Double, nb: Double): Any = dot
  override protected def combineJava(ctx: CodegenContext, dot: String, na: String, nb: String, ev: ExprCode): String =
    s"${ev.value} = $dot;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Euclidean distance (pgvector `<->`): sqrt(na + nb − 2·dot). */
case class L2DistanceExpr(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"
  override protected def combine(dot: Double, na: Double, nb: Double): Any = {
    val d2 = na + nb - 2.0 * dot
    math.sqrt(if (d2 < 0.0) 0.0 else d2) // clamp fp negatives
  }
  override protected def combineJava(ctx: CodegenContext, dot: String, na: String, nb: String, ev: ExprCode): String = {
    val d2 = ctx.freshName("d2")
    s"""double $d2 = $na + $nb - 2.0 * $dot;
       |${ev.value} = java.lang.Math.sqrt($d2 < 0.0 ? 0.0 : $d2);""".stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object VectorExpressions {
  /** Column-API entry points (usable without SQL registration). */
  def cosineSimilarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def l2Distance(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2DistanceExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  /** (identifier, info, builder) triples for SparkSessionExtensions
    * and direct FunctionRegistry registration.
    */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      info(classOf[CosineSimilarity], "cosine_similarity", "_FUNC_(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("dot_product"),
      info(classOf[DotProductExpr], "dot_product", "_FUNC_(a, b) - inner product of two float arrays"),
      (es: Seq[Expression]) => DotProductExpr(es(0), es(1))),
    (FunctionIdentifier("l2_distance"),
      info(classOf[L2DistanceExpr], "l2_distance", "_FUNC_(a, b) - euclidean distance of two float arrays"),
      (es: Seq[Expression]) => L2DistanceExpr(es(0), es(1)))
  )
}
