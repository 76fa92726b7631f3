package graft.operators

import java.util.concurrent.TimeoutException
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Future, Promise}

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Per-JVM probe the instrumented store reports into: local-mode tasks
  * serialize the closure (cloning any captured object), so the counter
  * must be a static the deserialized task resolves to the SAME instance
  * of.
  */
object AsyncProbe {
  val cur = new AtomicInteger
  val max = new AtomicInteger
  def reset(): Unit = { cur.set(0); max.set(0) }
  def enter(): Unit = {
    val c = cur.incrementAndGet()
    max.accumulateAndGet(c, math.max)
  }
  def exit(): Unit = { cur.decrementAndGet(); () }
}

class AsyncLookupSpec extends AnyFunSuite {
  import SparkTestSession._

  private val outSchema = new StructType().add("name", StringType)
  private val dim: Map[Any, Seq[Any]] =
    (1L to 20L).map(k => (k: Any) -> Seq[Any](s"name$k")).toMap

  private def df(keys: Seq[Long]) = {
    import spark.implicits._
    // single partition so collect order == partition emission order
    keys.toDF("k").repartition(1).select(col("k").cast(LongType))
  }

  private def store(delayMsOf: Any => Long): AsyncLookup.AsyncStore =
    AsyncLookup.delayedBroadcastStore(
      spark.sparkContext.broadcast(dim), delayMsOf)

  test("ordered mode emits in input order despite reversed completion order") {
    // earlier rows complete LAST (larger delays); order must still hold
    val keys = Seq(1L, 2L, 3L, 4L, 5L)
    val out = AsyncLookup.enrichAsync(df(keys), "k",
        store(k => (6 - k.asInstanceOf[Long]) * 40), outSchema,
        capacity = 8, timeoutMs = 5000, ordered = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == keys.map(k => (k, s"name$k")))
  }

  test("unordered mode emits by completion and still enriches every row once") {
    // first input row delayed 400 ms, the rest immediate: it must come
    // out LAST in unordered mode (generous margin over scheduler jitter)
    val keys = Seq(1L, 2L, 3L, 4L, 5L)
    val out = AsyncLookup.enrichAsync(df(keys), "k",
        store(k => if (k == (1L: Any)) 400L else 0L), outSchema,
        capacity = 8, timeoutMs = 5000, ordered = false)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out.toSet == keys.map(k => (k, s"name$k")).toSet)
    assert(out.last._1 == 1L, s"delayed head should emit last, got $out")
  }

  test("misses enrich as the left-outer null shape in both modes") {
    for (ordered <- Seq(true, false)) {
      val out = AsyncLookup.enrichAsync(df(Seq(1L, 99L)), "k",
          store(_ => 0L), outSchema, capacity = 4, timeoutMs = 5000,
          ordered = ordered)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set((1L, "name1"), (99L, null)))
    }
  }

  test("capacity bounds concurrent in-flight requests") {
    AsyncProbe.reset()
    val probing: AsyncLookup.AsyncStore = new AsyncLookup.AsyncStore {
      private val inner = AsyncLookup.delayedBroadcastStore(
        SparkTestSession.spark.sparkContext.broadcast(dim), _ => 30L)
      override def asyncLookup(key: Any): Future[Option[Seq[Any]]] = {
        AsyncProbe.enter()
        val p = Promise[Option[Seq[Any]]]()
        inner.asyncLookup(key).onComplete { t =>
          AsyncProbe.exit(); p.complete(t)
        }(scala.concurrent.ExecutionContext.parasitic)
        p.future
      }
    }
    AsyncLookup.enrichAsync(df((1L to 20L).toSeq), "k", probing, outSchema,
      capacity = 3, timeoutMs = 5000, ordered = true).collect()
    assert(AsyncProbe.max.get() > 1,
      s"expected pipelining, max in-flight ${AsyncProbe.max.get()}")
    assert(AsyncProbe.max.get() <= 3,
      s"capacity 3 violated: max in-flight ${AsyncProbe.max.get()}")
  }

  test("timeout fails the job by default and emits nulls with emptyOnTimeout") {
    // a store that never completes key 2
    val hung: AsyncLookup.AsyncStore = new AsyncLookup.AsyncStore {
      private val inner = AsyncLookup.delayedBroadcastStore(
        SparkTestSession.spark.sparkContext.broadcast(dim), _ => 0L)
      override def asyncLookup(key: Any): Future[Option[Seq[Any]]] =
        if (key == (2L: Any)) Promise[Option[Seq[Any]]]().future
        else inner.asyncLookup(key)
    }
    val e = intercept[Exception] {
      AsyncLookup.enrichAsync(df(Seq(1L, 2L, 3L)), "k", hung, outSchema,
        capacity = 4, timeoutMs = 200, ordered = true).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[TimeoutException]),
      s"expected a TimeoutException cause, got $e")

    val out = AsyncLookup.enrichAsync(df(Seq(1L, 2L, 3L)), "k", hung,
        outSchema, capacity = 4, timeoutMs = 200, ordered = false,
        emptyOnTimeout = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "name1"), (2L, null), (3L, "name3")))
  }
}
