package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS algorithm): hash every character k-gram with a polynomial
  * rolling hash, then keep the minimum hash of every window of `w`
  * consecutive k-gram hashes. The distinct selected hashes are the
  * document's fingerprint; any shared substring of length ≥ w + k − 1
  * between two documents is guaranteed to contribute at least one common
  * fingerprint, which is the local-similarity guarantee exact/minhash
  * dedup lacks (minhash bounds global Jaccard; winnowing catches local
  * plagiarism-style overlap).
  *
  * Reference analog: Flink 1.11 has no fingerprinting operator — this is
  * part of the training-data-pipeline family alongside
  * [[graft.operators.Dedup]]. Single-pass per row, O(n): the rolling hash
  * updates in O(1) per position and the window minima come from a
  * monotonic deque, so 100 TB of documents cost one codegen'd projection
  * — no shuffle, no UDF boundary, no per-element lambda plumbing.
  *
  * Hash parity contract (the DuckDB oracle recomputes definitionally):
  * h(i) = (Σ_{j<k} byte(i+j) · B^{k−1−j}) mod M with B=257, M=1e9+7,
  * over the ASCII bytes of the already-normalized input (compose with
  * [[graft.operators.TextOps.normalize]] + space-strip upstream). Fewer
  * than w hashes → one window over them all; length < k → empty.
  */
object Winnow {
  val B: Long = 257L
  val M: Long = 1000000007L

  /** B^(k−1) mod M — the outgoing-byte weight of the rolling update. */
  def topPow(k: Int): Long = {
    var p = 1L
    var i = 0
    while (i < k - 1) { p = p * B % M; i += 1 }
    p
  }

  /** Sorted distinct window-minimum hashes; the codegen target. */
  def fingerprint(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xffL)) % M; i += 1 }
    hs(0) = h
    val top = topPow(k)
    i = 1
    while (i < m) {
      // (h − c_out·B^(k−1))·B + c_in, kept non-negative before each mod
      h = ((h + M - (bytes(i - 1) & 0xffL) * top % M) % M * B +
        (bytes(i + k - 1) & 0xffL)) % M
      hs(i) = h
      i += 1
    }
    if (m <= w) {
      var min = hs(0)
      i = 1
      while (i < m) { if (hs(i) < min) min = hs(i); i += 1 }
      return new GenericArrayData(Array(min))
    }
    // sliding-window minima via monotonic deque (indices, increasing
    // values front→back); consecutive equal minima collapse on append
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val sel = new Array[Long](m - w + 1)
    var nSel = 0
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val v = hs(deque(head))
        if (nSel == 0 || sel(nSel - 1) != v) { sel(nSel) = v; nSel += 1 }
      }
      i += 1
    }
    val kept = java.util.Arrays.copyOf(sel, nSel)
    java.util.Arrays.sort(kept)
    var out = 0
    i = 0
    while (i < kept.length) {
      if (out == 0 || kept(out - 1) != kept(i)) { kept(out) = kept(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept, out))
  }
}

/** `winnow_fp(text, k, w)` — see [[Winnow]]. k and w are literal ints. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (k >= 2 && w >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"winnow_fp needs k >= 2 and w >= 1, got (k=$k, w=$w)")
    } else TypeCheckResult.TypeCheckFailure(
      s"winnow_fp expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(input: Any): Any =
    Winnow.fingerprint(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.fingerprint($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpression {
  private val Name = FunctionIdentifier("winnow_fp")

  private def lit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(
      s"winnow_fp $what must be an integer literal")
  }

  private[graft] val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3, "winnow_fp takes (text, k, w)")
    WinnowFingerprint(exprs.head, lit(exprs(1), "k"), lit(exprs(2), "w"))
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(Name)) {
      reg.createOrReplaceTempFunction("winnow_fp", builder, "built-in")
    }
  }
}
