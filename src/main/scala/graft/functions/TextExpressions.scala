package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the TEXT-profiling hot path — the
  * same promotion [[VectorExpressions]] made for embeddings (SURVEY.md
  * custom-operator preference order: a codegen `Expression` beats the
  * higher-order-function composition, whose lambda evaluates
  * INTERPRETED per array element).
  *
  * `count_in_set(arr, set)`: occurrences of `arr`'s elements in the
  * LITERAL string set — the `size(filter(toks, t => set.contains(t)))`
  * replacement behind stopword hit counting ([[graft.operators
  * .TextAnalysis.languageId]] runs it once per language per document,
  * the quality score once more over the union set). The set literal is
  * hashed ONCE per plan into a reference object; each row then pays one
  * hash probe per token instead of |set| interpreted equality lambdas.
  *
  * `sum_strlen(arr)`: Σ length(element) as a BIGINT — the
  * `aggregate(transform(toks, length), 0.0, +)` replacement behind the
  * mean-token-length quality signal. Lengths are exact integers, so the
  * double left-fold it replaces is reproduced exactly by summing longs
  * and casting.
  *
  * Both count a null element as a non-match (the HOF compositions they
  * replace propagate nulls the same way for the token arrays in use,
  * which never contain nulls).
  */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _))
          if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "count_in_set expects (array<string>, foldable array<string>), " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    // foldable + correctly-typed does not rule out a NULL literal set;
    // fail loudly by name rather than NPE from inside codegen setup
    val evaluated = right.eval(null)
    require(evaluated != null,
      "count_in_set: the word-set argument evaluated to NULL — pass a " +
        "non-null literal array<string>")
    val arr = evaluated.asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).clone())
      i += 1
    }
    s
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var c = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1L
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |long $c = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class SumStrLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sum_strlen expects array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_strlen"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var s = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s += arr.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) $s += $a.getUTF8String($i).numChars();
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  private val CountName = FunctionIdentifier("count_in_set")
  private val SumLenName = FunctionIdentifier("sum_strlen")

  private val countBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CountInSet(a, b)
    case other => throw new IllegalArgumentException(
      s"count_in_set expects 2 arguments, got ${other.size}")
  }

  private val sumLenBuilder: Seq[Expression] => Expression = {
    case Seq(a) => SumStrLen(a)
    case other => throw new IllegalArgumentException(
      s"sum_strlen expects 1 argument, got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(CountName)) {
      reg.createOrReplaceTempFunction("count_in_set", countBuilder, "built-in")
    }
    if (!reg.functionExists(SumLenName)) {
      reg.createOrReplaceTempFunction("sum_strlen", sumLenBuilder, "built-in")
    }
  }

  // Direct Column constructors — the operators' path. `call_function`
  // would resolve by NAME through the session registry, making every
  // consumer depend on ensureRegistered having run on that session
  // (ADVICE r15: languageId/qualityColumns/datasetCard failed on any
  // session that never went through Tables.load); building the
  // Catalyst node directly keeps them self-contained. ensureRegistered
  // stays for the SQL-name surface only.
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.GraftColumnBridge

  /** `count_in_set(arr, words)` as a self-contained Column. */
  def countInSet(arr: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(CountInSet(
      GraftColumnBridge.expression(arr),
      GraftColumnBridge.expression(
        org.apache.spark.sql.functions.typedLit(words))))

  /** `sum_strlen(arr)` as a self-contained Column. */
  def sumStrlen(arr: Column): Column =
    GraftColumnBridge.column(SumStrLen(GraftColumnBridge.expression(arr)))
}
