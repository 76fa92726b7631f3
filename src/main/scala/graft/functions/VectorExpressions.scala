package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path (SURVEY.md
  * custom-operator preference order: a codegen `Expression` beats the
  * higher-order-function composition, which evaluates its lambda per
  * element through interpreted `LambdaFunction` plumbing).
  *
  * `vec_dot(a, b)`: dot product of two `array<double>` columns as a
  * tight primitive loop in both interpreted and generated code. The
  * accumulation order is ascending-index — IDENTICAL to the
  * `aggregate(zip_with(a, b, *), 0, +)` left fold it replaces and to
  * the DuckDB oracle's `list_sum(list_zip ...)` twin, so results stay
  * bit-reproducible. Array elements are assumed non-null (embedding
  * vectors); dimensions clamp to the shorter input.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-session registration of the native vector functions, so
  * `call_function("vec_dot", …)` / SQL `vec_dot(a, b)` resolve on any
  * session the engine runs in (the reference's module/function-catalog
  * bootstrap, flink-table FunctionCatalog).
  */
object VectorExpressions {
  private val DotName = FunctionIdentifier("vec_dot")

  private[graft] val dotBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "vec_dot takes 2 arguments")
    DotProduct(exprs.head, exprs(1))
  }

  /** FunctionDescription for SparkSessionExtensions#injectFunction. */
  private[graft] val dotDescription = (
    DotName,
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DotProduct].getName, "vec_dot"),
    dotBuilder)

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(DotName)) {
      reg.createOrReplaceTempFunction("vec_dot", dotBuilder, "built-in")
    }
  }
}
