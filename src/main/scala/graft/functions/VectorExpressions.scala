package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
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

/** `vec_nearest(vec, cids, cents, aux, n, metric)`: the n nearest
  * centroids of a vector against a LITERAL centroid family, as one
  * tight primitive loop per row. Returns
  * `array<struct<score: double, cid: bigint>>` sorted ascending by
  * (score, cid) — exactly the `slice(array_sort(transform(…,
  * struct(score, cid))), 1, n)` / `array_min` composition it replaces,
  * with identical IEEE accumulation order and identical
  * `Double.compare` tie-breaking, so picks and scores are
  * bit-reproducible against the DuckDB oracles.
  *
  * WHY an expression and not the higher-order-function fold: HOF
  * lambdas evaluate INTERPRETED per element — per (row × centroid)
  * that is a boxed expression-tree walk, and with K centroids scaling
  * with the corpus (the IVF fixture grows K as corpus/50) the argmin
  * became the sf1 bottleneck (measured 26 s for 20k rows × 400
  * centroids × dim 64 ≈ 0.5 G multiply-adds that a primitive loop
  * does in well under a second). The expression keeps the r7 rewrite's
  * zero-shuffle shape — centroids stay plan literals, the projection
  * stays narrow on the scan — and moves the K×dim inner loop into one
  * JVM-compiled eval per row (CodegenFallback: the per-row dispatch is
  * negligible next to the loop body).
  *
  * `metric` is `'l2'` (score = |v|² − 2·v·c + aux_i, aux = centroid
  * self-dot) or `'cos'` (score = −(v·c / (|v|·aux_i)), aux = centroid
  * norm). All non-vec arguments must be foldable (plan literals).
  */
case class NearestCentroids(
    vec: Expression, cids: Expression, cents: Expression,
    aux: Expression, n: Expression, metric: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] =
    Seq(vec, cids, cents, aux, n, metric)
  override def nullable: Boolean = vec.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def isDA(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    val ok = isDA(vec.dataType) &&
      (cids.dataType match {
        case ArrayType(org.apache.spark.sql.types.LongType, _) => true
        case _ => false
      }) &&
      (cents.dataType match {
        case ArrayType(et, _) => isDA(et); case _ => false
      }) &&
      isDA(aux.dataType) &&
      n.dataType == org.apache.spark.sql.types.IntegerType &&
      metric.dataType == org.apache.spark.sql.types.StringType
    if (!ok) TypeCheckResult.TypeCheckFailure(
      "vec_nearest expects (array<double>, array<bigint>, " +
        "array<array<double>>, array<double>, int, string), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
    else if (!children.tail.forall(_.foldable))
      TypeCheckResult.TypeCheckFailure(
        "vec_nearest centroid family / n / metric must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "vec_nearest"

  // literal centroid family, parsed once per JVM into primitive arrays
  @transient private lazy val cidArr: Array[Long] =
    cids.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val centArr: Array[Array[Double]] = {
    val a = cents.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i =>
      a.getArray(i).toDoubleArray())
  }
  @transient private lazy val auxArr: Array[Double] =
    aux.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val topN: Int = {
    val v = n.eval(null).asInstanceOf[Int]
    require(v >= 1, s"vec_nearest n must be >= 1, got $v")
    v
  }
  @transient private lazy val isCos: Boolean =
    metric.eval(null).toString match {
      case "cos" => true
      case "l2" => false
      case m => throw new IllegalArgumentException(
        s"vec_nearest metric must be 'l2' or 'cos', got '$m'")
    }

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    if (vAny == null) return null
    val vd = vAny.asInstanceOf[ArrayData]
    val vlen = vd.numElements()
    val v = new Array[Double](vlen)
    var i = 0
    while (i < vlen) { v(i) = vd.getDouble(i); i += 1 }
    // |v|² with ascending-index accumulation (bit-identical to vec_dot)
    var vdot = 0.0
    i = 0
    while (i < vlen) { vdot += v(i) * v(i); i += 1 }
    val vn = math.sqrt(vdot)
    val k = cidArr.length
    val m = math.min(topN, k)
    // insertion top-m by (score asc, cid asc), Double.compare semantics
    // (same comparator as array_sort/array_min over struct(score, cid))
    val bs = new Array[Double](m)
    val bc = new Array[Long](m)
    var filled = 0
    var c = 0
    while (c < k) {
      val cv = centArr(c)
      val d = math.min(vlen, cv.length)
      var dot = 0.0
      i = 0
      while (i < d) { dot += v(i) * cv(i); i += 1 }
      val score =
        if (isCos) -(dot / (vn * auxArr(c))) else vdot - 2.0 * dot + auxArr(c)
      val cid = cidArr(c)
      // does (score, cid) beat slot j? strict lexicographic compare
      var j = filled
      while (j > 0 && {
        val cmp = java.lang.Double.compare(score, bs(j - 1))
        cmp < 0 || (cmp == 0 && cid < bc(j - 1))
      }) j -= 1
      if (j < m) {
        val last = math.min(filled, m - 1)
        var t = last
        while (t > j) { bs(t) = bs(t - 1); bc(t) = bc(t - 1); t -= 1 }
        bs(j) = score
        bc(j) = cid
        if (filled < m) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(bs(i), bc(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), cids = newChildren(1), cents = newChildren(2),
      aux = newChildren(3), n = newChildren(4), metric = newChildren(5))
}

/** `pq_adc(codes, lut, stride)`: asymmetric-distance-computation table
  * lookup for product-quantized vectors — `Σ_j lut[j·stride + codes[j]]`
  * as one tight primitive loop, fully codegen'd. `codes` is a corpus
  * row's per-subspace code array (`array<bigint>`, values in
  * `[0, stride)`), `lut` is a per-QUERY lookup table laid out
  * subspace-major (`array<double>`, length m·stride — a COLUMN, not a
  * literal: each query row carries its own table after the broadcast
  * join), and `stride` is the table width per subspace.
  *
  * WHY an expression: the equivalent
  * `aggregate(zip_with(codes, sequence(…)), …, element_at)` fold
  * evaluates interpreted per (pair × subspace) — the exact shape that
  * went super-linear in the r8 q133 argmin — while ADC's entire point
  * is that scoring a pair costs m table adds instead of dim multiplies.
  * Out-of-range codes throw (a wrong code is an encoder bug; an unsafe
  * buffer read would return garbage scores silently).
  */
case class PqAdc(codes: Expression, lut: Expression, stride: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = lut
  override def third: Expression = stride

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (codes.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }) && (lut.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && stride.dataType == org.apache.spark.sql.types.IntegerType
    if (!ok) TypeCheckResult.TypeCheckFailure(
      "pq_adc expects (array<bigint>, array<double>, int), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
    else if (!stride.foldable) TypeCheckResult.TypeCheckFailure(
      "pq_adc stride must be a literal")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(c: Any, l: Any, s: Any): Any = {
    val codesA = c.asInstanceOf[ArrayData]
    val lutA = l.asInstanceOf[ArrayData]
    val st = s.asInstanceOf[Int]
    val m = codesA.numElements()
    val len = lutA.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      // bounds-check the LONG code before narrowing: a corrupt code
      // >= 2^32 would wrap to a small non-negative int and silently
      // read the wrong lut slot (ADVICE.md r9)
      val code = codesA.getLong(j)
      val idx = j.toLong * st + code
      if (code < 0L || code >= st || idx >= len)
        throw new IllegalArgumentException(
          s"pq_adc: code $code in subspace $j indexes past " +
            s"the $len-entry lut (stride $st) — encoder/codebook mismatch")
      acc += lutA.getDouble(idx.toInt)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l, s) => {
      val m = ctx.freshName("m")
      val len = ctx.freshName("len")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      val code = ctx.freshName("code")
      s"""
         |int $m = $c.numElements();
         |int $len = $l.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  long $code = $c.getLong($j);
         |  long $idx = (long) $j * $s + $code;
         |  if ($code < 0L || $code >= $s || $idx >= $len) {
         |    throw new IllegalArgumentException(
         |      "pq_adc: code " + $code + " in subspace " + $j +
         |      " indexes past the " + $len + "-entry lut (stride " + $s +
         |      ") - encoder/codebook mismatch");
         |  }
         |  $acc += $l.getDouble((int) $idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(codes = newFirst, lut = newSecond, stride = newThird)
}

/** `pq_lut(qv, cents, stride)`: builds a query's ADC lookup table —
  * the m·stride array [[PqAdc]] consumes — in ONE expression pass.
  * `cents` is the LITERAL flattened codebook, subspace-major
  * (`array<array<double>>`, length m·stride; entry `j·stride + s` is
  * subspace j's code-s centroid, dead Lloyd slots as EMPTY arrays),
  * and the output entry `j·stride + s` is the ascending-index dot of
  * `qv[j·w … j·w+w)` with that centroid (0.0 for dead slots) —
  * bit-identical to the `array(vec_dot(slice(qv, j·w+1, w), lit(c)))`
  * column-per-slot builder it replaces.
  *
  * WHY an expression (VERDICT r10 "What's wrong" #2): the
  * column-per-slot builder materializes m·ksub SEPARATE Catalyst
  * expressions — 2,048 columns at q136's m=32/ksub=64, the most
  * expensive codegen unit in the corpus, and the cost is driver/
  * codegen-side, exactly the kind that degrades the interactive path
  * as m·ksub grows (m=16/ksub=256 → 4,096 columns). One expression
  * keeps the identical plan shape (query-side only, broadcast-class
  * by the [[graft.operators.Similarity.bruteForceTopK]] contract) at
  * constant plan size. Per-row dispatch is CodegenFallback — the
  * m·ksub·w multiply-add loop body dwarfs it, and the expression
  * evaluates once per QUERY row, never on the corpus side.
  */
case class PqLut(vec: Expression, cents: Expression, stride: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, cents, stride)
  override def nullable: Boolean = vec.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && (cents.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }) && stride.dataType == org.apache.spark.sql.types.IntegerType
    if (!ok) TypeCheckResult.TypeCheckFailure(
      "pq_lut expects (array<double>, array<array<double>>, int), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
    else if (!cents.foldable || !stride.foldable)
      TypeCheckResult.TypeCheckFailure(
        "pq_lut codebook / stride must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  // literal codebook, parsed once per JVM into primitive arrays;
  // empty entries (dead Lloyd slots) stay zero-length
  @transient private lazy val centArr: Array[Array[Double]] = {
    val a = cents.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getArray(i).toDoubleArray())
  }
  @transient private lazy val strideV: Int = {
    val s = stride.eval(null).asInstanceOf[Int]
    require(s >= 1, s"pq_lut stride must be >= 1, got $s")
    require(centArr.length % s == 0,
      s"pq_lut codebook length ${centArr.length} is not a multiple of " +
        s"stride $s")
    s
  }
  @transient private lazy val width: Int = {
    val ws = centArr.iterator.filter(_.length > 0).map(_.length).toSet
    require(ws.size == 1,
      s"pq_lut codebook entries must share one subspace width, got $ws")
    ws.head
  }

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    if (vAny == null) return null
    val vd = vAny.asInstanceOf[ArrayData]
    val vlen = vd.numElements()
    val v = new Array[Double](vlen)
    var i = 0
    while (i < vlen) { v(i) = vd.getDouble(i); i += 1 }
    val st = strideV
    val w = width
    val total = centArr.length
    val out = new Array[Double](total)
    var idx = 0
    while (idx < total) {
      val cv = centArr(idx)
      if (cv.length > 0) {
        val off = (idx / st) * w
        // same clamping as vec_dot over slice(qv, off+1, w): the dot
        // runs over min(cent width, remaining query components)
        val d = math.min(cv.length, math.max(0, vlen - off))
        var s = 0.0
        i = 0
        while (i < d) { s += v(off + i) * cv(i); i += 1 }
        out(idx) = s
      }
      idx += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), cents = newChildren(1), stride = newChildren(2))
}

/** Per-session registration of the native vector functions, so
  * `call_function("vec_dot", …)` / SQL `vec_dot(a, b)` resolve on any
  * session the engine runs in (the reference's module/function-catalog
  * bootstrap, flink-table FunctionCatalog).
  */
object VectorExpressions {
  private val DotName = FunctionIdentifier("vec_dot")
  private val NearestName = FunctionIdentifier("vec_nearest")
  private val PqAdcName = FunctionIdentifier("pq_adc")
  private val PqLutName = FunctionIdentifier("pq_lut")

  private[graft] val dotBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "vec_dot takes 2 arguments")
    DotProduct(exprs.head, exprs(1))
  }

  private[graft] val nearestBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 6, "vec_nearest takes 6 arguments")
    NearestCentroids(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4), exprs(5))
  }

  private[graft] val pqAdcBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3, "pq_adc takes 3 arguments")
    PqAdc(exprs(0), exprs(1), exprs(2))
  }

  private[graft] val pqLutBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3, "pq_lut takes 3 arguments")
    PqLut(exprs(0), exprs(1), exprs(2))
  }

  /** FunctionDescription for SparkSessionExtensions#injectFunction. */
  private[graft] val dotDescription = (
    DotName,
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DotProduct].getName, "vec_dot"),
    dotBuilder)

  private[graft] val nearestDescription = (
    NearestName,
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[NearestCentroids].getName, "vec_nearest"),
    nearestBuilder)

  private[graft] val pqAdcDescription = (
    PqAdcName,
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[PqAdc].getName, "pq_adc"),
    pqAdcBuilder)

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(DotName)) {
      reg.createOrReplaceTempFunction("vec_dot", dotBuilder, "built-in")
    }
    if (!reg.functionExists(NearestName)) {
      reg.createOrReplaceTempFunction("vec_nearest", nearestBuilder, "built-in")
    }
    if (!reg.functionExists(PqAdcName)) {
      reg.createOrReplaceTempFunction("pq_adc", pqAdcBuilder, "built-in")
    }
    if (!reg.functionExists(PqLutName)) {
      reg.createOrReplaceTempFunction("pq_lut", pqLutBuilder, "built-in")
    }
  }
}
