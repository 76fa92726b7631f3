package graft.operators

import java.util.concurrent.{Executors, LinkedBlockingQueue, ScheduledExecutorService, TimeUnit, TimeoutException}

import scala.concurrent.{Await, ExecutionContext, Future, Promise}
import scala.concurrent.duration.DurationLong

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** Async lookup I/O — the Spark analog of the reference's
  * AsyncWaitOperator (flink-streaming-java
  * `DS/api/operators/async/AsyncWaitOperator.java`, surfaced as
  * `AsyncDataStream#orderedWait/#unorderedWait` and the async
  * LookupTableSource path): per-row lookups against an external store
  * run CONCURRENTLY with a bounded in-flight window, so the pipeline
  * hides per-request latency behind `capacity` outstanding requests
  * instead of paying it serially per row.
  *
  * Faithful knobs, per the reference operator:
  *  - `capacity` — max in-flight requests per partition (the operator's
  *    queue size; filling it backpressures the input, here by blocking
  *    the partition iterator);
  *  - `timeoutMs` — per-element timeout measured from request ISSUE
  *    (the reference arms a timer when the element enters the
  *    operator); on expiry the job fails by default, or emits the
  *    left-outer miss shape with `emptyOnTimeout = true` (the analog of
  *    overriding `AsyncFunction#timeout` to complete empty);
  *  - `ordered` — ordered emission (results leave in input-row order,
  *    `orderedWait`) vs unordered (results leave as they complete,
  *    `unorderedWait` — lower latency, order surrendered). Unordered
  *    still emits every row exactly once.
  *
  * Scale posture: like [[LookupJoin]], this exists for the dimension
  * that neither broadcasts nor snapshots — each of 1000 executors keeps
  * at most `capacity` requests open against the store, so total store
  * concurrency is explicit (partitions × capacity) and tunable, and no
  * shuffle is added (a narrow mapPartitions). The batched multi-get
  * ([[LookupJoin.enrichBatched]], q98) amortizes round-trips instead;
  * this operator is the true callback-concurrency analog for stores
  * whose API is per-key async (the reference ships exactly both).
  */
object AsyncLookup {

  /** Asynchronous point-lookup: completes with Some(values) or None on
    * miss. Implementations own their execution context / client
    * threads; production impls wrap async database/HTTP clients.
    */
  trait AsyncStore extends Serializable {
    def asyncLookup(key: Any): Future[Option[Seq[Any]]]
  }

  /** Per-JVM scheduler backing the timeout timers and the test stub's
    * simulated latency (the reference's ProcessingTimeService analog).
    * Daemon threads: must never block executor shutdown.
    */
  @transient private lazy val scheduler: ScheduledExecutorService =
    Executors.newScheduledThreadPool(2, r => {
      val t = new Thread(r, "graft-async-lookup-timer")
      t.setDaemon(true)
      t
    })

  /** The reference's per-element timer: a future that completes with
    * the lookup's result, or fails with TimeoutException `ms` after
    * issue — guaranteeing completion even against a hung store.
    */
  private def withTimeout[T](f: Future[T], ms: Long, key: Any): Future[T] = {
    val p = Promise[T]()
    val timer = scheduler.schedule(new Runnable {
      override def run(): Unit = p.tryFailure(new TimeoutException(
        s"async lookup timed out after $ms ms (key=$key)"))
    }, ms, TimeUnit.MILLISECONDS)
    f.onComplete { t =>
      timer.cancel(false)
      p.tryComplete(t)
    }(ExecutionContext.parasitic)
    p.future
  }

  /** Async-store stub over a broadcast map with simulated per-key
    * latency (deterministic — derive the delay from the key, never an
    * RNG, so runs reproduce). The test/oracle twin of
    * [[LookupJoin.broadcastStore]].
    */
  def delayedBroadcastStore(bc: Broadcast[Map[Any, Seq[Any]]],
      delayMsOf: Any => Long): AsyncStore =
    new AsyncStore {
      override def asyncLookup(key: Any): Future[Option[Seq[Any]]] = {
        val p = Promise[Option[Seq[Any]]]()
        scheduler.schedule(new Runnable {
          override def run(): Unit = p.trySuccess(bc.value.get(key))
        }, delayMsOf(key), TimeUnit.MILLISECONDS)
        p.future
      }
    }

  /** Async twin of [[LookupJoin.storeFrom]] (same broadcast-map stub +
    * driver-collect guard), with simulated per-key latency.
    */
  def asyncStoreFrom(dim: DataFrame, delayMsOf: Any => Long,
      maxRows: Int = 1000000): (AsyncStore, StructType) = {
    val (bc, schema) = LookupJoin.collectDim(dim, maxRows)
    (delayedBroadcastStore(bc, delayMsOf), schema)
  }

  /** Left-outer async lookup enrichment of `df` by `keyCol`, appending
    * `outCols` (typed by `outSchema`) from the store — see the object
    * scaladoc for the concurrency/ordering/timeout contract.
    */
  def enrichAsync(
      df: DataFrame, keyCol: String, store: AsyncStore,
      outSchema: StructType, capacity: Int = 64, timeoutMs: Long = 10000,
      ordered: Boolean = true, emptyOnTimeout: Boolean = false): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val schema = StructType(df.schema.fields ++ outSchema.fields)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val nOut = outSchema.size

    def emit(row: Row, hit: Option[Seq[Any]]): Row = {
      val extra: Array[Any] =
        hit.map(_.toArray).getOrElse(Array.fill[Any](nOut)(null))
      Row.fromSeq(row.toSeq ++ extra)
    }

    def resolve(row: Row, t: scala.util.Try[Option[Seq[Any]]]): Row = t match {
      case scala.util.Success(hit) => emit(row, hit)
      case scala.util.Failure(_: TimeoutException) if emptyOnTimeout =>
        emit(row, None)
      case scala.util.Failure(e) => throw e
    }

    if (ordered)
      df.mapPartitions { it =>
        // ordered emission: a FIFO of in-flight (row, future); the head
        // is awaited at emission, later completions wait their turn —
        // head-of-line blocking is the price of order, exactly as in
        // the reference's ordered queue
        new Iterator[Row] {
          private val inflight =
            new java.util.ArrayDeque[(Row, Future[Option[Seq[Any]]])](capacity)
          private def pump(): Unit =
            while (inflight.size < capacity && it.hasNext) {
              val row = it.next()
              inflight.add((row,
                withTimeout(store.asyncLookup(row.get(keyIdx)), timeoutMs,
                  row.get(keyIdx))))
            }
          override def hasNext: Boolean = { pump(); !inflight.isEmpty }
          override def next(): Row = {
            pump()
            val (row, f) = inflight.poll()
            // the timeout timer bounds f; the grace margin only guards
            // against a wedged timer thread
            resolve(row, Await.ready(f, (timeoutMs + 10000).millis).value.get)
          }
        }
      }(Encoders.row(schema))
    else
      df.mapPartitions { it =>
        // unordered emission: completions land in a queue as they
        // finish; the iterator drains it — first-completed leaves
        // first (the reference's unordered mode)
        new Iterator[Row] {
          private val done =
            new LinkedBlockingQueue[(Row, scala.util.Try[Option[Seq[Any]]])]()
          private var inFlight = 0
          private def pump(): Unit =
            while (inFlight < capacity && it.hasNext) {
              val row = it.next()
              inFlight += 1
              withTimeout(store.asyncLookup(row.get(keyIdx)), timeoutMs,
                row.get(keyIdx))
                .onComplete(t => done.put((row, t)))(ExecutionContext.parasitic)
            }
          override def hasNext: Boolean = { pump(); inFlight > 0 }
          override def next(): Row = {
            pump()
            // every in-flight future completes within timeoutMs by the
            // timer; the bounded poll is the same wedged-timer guard
            val polled = done.poll(timeoutMs + 10000, TimeUnit.MILLISECONDS)
            if (polled == null)
              throw new TimeoutException("async lookup completion queue stalled")
            inFlight -= 1
            resolve(polled._1, polled._2)
          }
        }
      }(Encoders.row(schema))
  }
}
