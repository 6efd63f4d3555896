package graft.operators

import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.collection.mutable
import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder}

/** The key-scoped state view handed to stateful async records — the
  * engine's analog of the KV store an async processor reads and writes
  * (reference: async processors promise same-key state writes are
  * visible to later same-key invocations,
  * /root/reference/kafka-client/src/main/java/dev/responsive/kafka/api/async/AsyncProcessorSupplier.java:81-95).
  * `get` after a same-key `put` returns the written value — within one
  * invocation and across invocations — because same-key records are
  * chained serially; `delete` is the tombstone. */
trait KeyState[S] {
  def get: Option[S]
  def put(s: S): Unit
  def delete(): Unit
}

/** Per-key-order-preserving async map — the engine's analog of the
  * reference's async processing framework (AsyncProcessorSupplier,
  * /root/reference/kafka-client/src/main/java/dev/responsive/kafka/api/async/AsyncProcessorSupplier.java:34-118;
  * ordering queue internal/async/queues/KeyOrderPreservingQueue.java:36,139-151;
  * pool internal/async/AsyncThreadPool.java:46-99).
  *
  * Contract mirrored from the reference:
  *  - same-key records run serially in encounter order (futures chained
  *    per key) — read-your-writes across invocations;
  *  - cross-key records run concurrently on a bounded pool;
  *  - at most `maxInFlight` records are scheduled ahead (the
  *    MAX_EVENTS_QUEUED analog, kafka-client/src/main/java/dev/responsive/kafka/api/config/ResponsiveConfig.java:253-291), so a slow
  *    record applies backpressure instead of buffering the partition;
  *  - one record's failure fails THAT record (rethrown at its output
  *    position, failing the task like any Spark exception) without
  *    poisoning later same-key records — the chain continues past
  *    failures, like the reference's per-event fault isolation. A failed
  *    record's state writes up to the throw point remain (the reference
  *    flushes per-event too); later same-key records see them.
  *
  * Lifecycle: the pool is torn down by a TaskContext completion listener,
  * so limit()/take()/task-abort cannot leak non-daemon threads even when
  * the output iterator is never drained.
  *
  * Memory safety of the stateful variant: the per-partition state map is
  * a ConcurrentHashMap; same-key accesses are already serialized by the
  * future chain (the executor's queue publishes writes between chain
  * hops), and distinct keys touch distinct entries concurrently.
  *
  * Deviation: output preserves full input order (the reference forwards
  * in completion order) — stricter, and what keeps Spark plans
  * deterministic. Spark already parallelizes across partitions; this
  * utility adds intra-partition concurrency for high-latency per-record
  * work (remote lookups), which is the reference's motivating use case.
  */
object AsyncOps {

  /** Per-record wait bound: a record whose `f` hangs past this fails the
    * task instead of wedging the executor thread forever. */
  val RecordTimeout: FiniteDuration = 10.minutes

  /** Stateless async map (no cross-invocation state). */
  def asyncMapPartitions[T, R: Encoder](
      ds: Dataset[T],
      parallelism: Int,
      maxInFlight: Int = 64)(keyOf: T => Any)(f: T => R): Dataset[R] =
    core(ds, parallelism, maxInFlight)(keyOf)(() => (t, _) => f(t))

  /** Stateful async map: `f` receives a [[KeyState]] scoped to the
    * record's key, with read-your-writes visibility across same-key
    * invocations (the reference's async-processor state contract).
    *
    * PARTITION-LOCAL STATE: like the reference — where Kafka's
    * partitioning guarantees a key's records all hit one task and its
    * store (kafka-client/src/main/java/dev/responsive/kafka/api/async/AsyncProcessorSupplier.java:96-118, "single stateful
    * processor" per task) — the state map lives per partition. The
    * cross-invocation contract therefore requires same-key records to
    * be co-located: feed this from `repartition($"key")`, a
    * groupByKey-shaped upstream, or a source that is already
    * key-partitioned. Keys split across partitions get independent
    * per-partition states (no error is possible here because `keyOf`
    * is an opaque function, not a Column). */
  def asyncMapPartitionsStateful[T, S, R: Encoder](
      ds: Dataset[T],
      parallelism: Int,
      maxInFlight: Int = 64)(keyOf: T => Any)(f: (T, KeyState[S]) => R): Dataset[R] =
    core(ds, parallelism, maxInFlight)(keyOf) { () =>
      val states = new ConcurrentHashMap[Any, S]()
      (t, k) =>
        f(t, new KeyState[S] {
          def get: Option[S] = Option(states.get(k))
          def put(s: S): Unit = states.put(k, s)
          def delete(): Unit = states.remove(k)
        })
    }

  /** Shared scaffolding: per-key future chains over a bounded pool.
    * `mkInvoke` is a per-partition factory so stateful runs get a
    * partition-scoped state map. */
  private def core[T, R: Encoder](
      ds: Dataset[T],
      parallelism: Int,
      maxInFlight: Int)(keyOf: T => Any)(mkInvoke: () => (T, Any) => R): Dataset[R] =
    ds.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pool = Executors.newFixedThreadPool(parallelism)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
          pool.shutdownNow()
        })
        val invoke = mkInvoke()
        val chains = mutable.Map.empty[Any, Future[Unit]]
        val inFlight = mutable.Queue.empty[Future[Try[R]]]

        def schedule(): Unit =
          while (inFlight.size < maxInFlight && it.hasNext) {
            val t = it.next()
            val k = keyOf(t)
            val prev = chains.getOrElse(k, Future.unit)
            val fut = prev.map(_ => Try(invoke(t, k)))
            // the key's chain advances whether or not this record failed
            chains(k) = fut.map(_ => ())
            inFlight.enqueue(fut)
          }

        new Iterator[R] {
          override def hasNext: Boolean = {
            schedule()
            val more = inFlight.nonEmpty
            if (!more) pool.shutdown()
            more
          }
          override def next(): R = {
            schedule()
            Await.result(inFlight.dequeue(), RecordTimeout) match {
              case Success(r) => r
              case Failure(e) => throw e
            }
          }
        }
      }
    }

  /** Q58 — the async framework driver-graded (it was spec-only): a
    * per-key running sequence + running sum computed through
    * [[asyncMapPartitionsStateful]]'s KeyState chains. Correct output
    * REQUIRES the reference's async contract end to end — same-key
    * records chained serially in encounter order with read-your-writes
    * state (a reordered or lost chain hop corrupts every later k_seq /
    * run_cents for that key), while cross-key records race freely on
    * the pool (the driver compare sorts rows, so cross-key completion
    * order is immaterial). The sum runs in exact integer cents, so the
    * oracle is the SQL cumulative window — FP addition order never
    * enters. Feed is repartitioned by key + sorted within partitions:
    * the co-location the stateful contract documents (the Kafka
    * partition-assignment analog).
    * Reference: kafka-client/src/main/java/dev/responsive/kafka/api/async/AsyncProcessorSupplier.java:81-95 (same-key serial,
    * read-your-writes), kafka-client/src/main/java/dev/responsive/kafka/internal/async/queues/KeyOrderPreservingQueue.java:36,139-151. */
  val q58: graft.QueryDef = graft.QueryDef(
    "q58_async_running_sum",
    (s, d) => {
      import s.implicits._
      val evs = graft.Tables.events(s, d)
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("value"))
        .repartition(org.apache.spark.sql.functions.col("user_id"))
        .sortWithinPartitions(
          org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("event_id"))
        .as[(Long, Long, java.sql.Timestamp, Double)]
      asyncMapPartitionsStateful[(Long, Long, java.sql.Timestamp, Double), (Long, Long), (Long, Long, Long, Long)](
        evs, parallelism = 8)(_._1) { (rec, st) =>
        val (seq, run) = st.get.getOrElse((0L, 0L))
        val next = (seq + 1, run + math.round(rec._4 * 100))
        st.put(next)
        (rec._1, rec._2, next._1, next._2)
      }.toDF("user_id", "event_id", "k_seq", "run_cents")
    },
    Some("""SELECT user_id, event_id,
           |  row_number() OVER w AS k_seq,
           |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS run_cents
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)
  )

  val all: Seq[graft.QueryDef] = Seq(q58)
}
