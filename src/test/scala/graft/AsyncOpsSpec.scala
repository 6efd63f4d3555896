package graft

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import graft.operators.AsyncOps

/** JVM-singleton probes: task closures are serialized even in local
  * mode, so driver-side collections captured by value stay empty —
  * executors resolve this object in-process instead. */
object AsyncProbe {
  val threads = new ConcurrentHashMap[String, Boolean]()
  val order = new ConcurrentLinkedQueue[Long]()
}

class AsyncOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("asyncMapPartitions preserves input order and per-key sequencing") {
    val input = (1L to 400L).map(i => (i % 7, i))
    val ds = input.toDS().repartition(2)
    val out = AsyncOps.asyncMapPartitions(ds, parallelism = 8, maxInFlight = 16)(_._1) {
      case (k, v) => (k, v * 2)
    }
    val collected = out.collect()
    assert(collected.sortBy(_._2).sameElements(input.map { case (k, v) => (k, v * 2) }.sortBy(_._2)))
  }

  test("asyncMapPartitions runs cross-key work concurrently") {
    AsyncProbe.threads.clear()
    val ds = (1L to 64L).map(i => (i, i)).toDS().coalesce(1)
    AsyncOps.asyncMapPartitions(ds, parallelism = 8)(_._1) { t =>
      AsyncProbe.threads.put(Thread.currentThread().getName, true)
      Thread.sleep(5)
      t._2
    }.collect()
    assert(AsyncProbe.threads.size > 1,
      s"expected multiple worker threads, saw ${AsyncProbe.threads.size}")
  }

  test("per-key chain: same-key records apply serially (no interleaving)") {
    AsyncProbe.order.clear()
    val ds = (1L to 100L).map(i => (1L, i)).toDS().coalesce(1) // all same key
    AsyncOps.asyncMapPartitions(ds, parallelism = 8)(_._1) { t =>
      AsyncProbe.order.add(t._2); t._2
    }.collect()
    val seq = AsyncProbe.order.toArray(Array.empty[java.lang.Long]).map(_.longValue)
    assert(seq.length == 100)
    assert(seq.sameElements(seq.sorted), "same-key records must execute in order")
  }

  test("a failing record does not poison later same-key records") {
    AsyncProbe.order.clear()
    val ds = (1L to 10L).map(i => (1L, i)).toDS().coalesce(1) // one key, serial chain
    val out = AsyncOps.asyncMapPartitions(ds, parallelism = 4)(_._1) { t =>
      if (t._2 == 3) throw new IllegalStateException("record 3 fails")
      AsyncProbe.order.add(t._2)
      t._2
    }
    // the failure surfaces at its own output position (failing the job,
    // like any Spark task exception)...
    val e = intercept[org.apache.spark.SparkException](out.collect())
    assert(e.getMessage.contains("record 3 fails") ||
      Option(e.getCause).exists(_.getMessage.contains("record 3 fails")))
    // ...but records AFTER the failure on the same key still executed
    val seen = AsyncProbe.order.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSet
    assert(seen.contains(4L), s"record 4 should have run past the failure; saw $seen")
  }

  test("early termination (limit) does not leak the worker pool") {
    // take(3) abandons the iterator; the TaskContext completion listener
    // must still shut the pool down — probe thread liveness by name
    AsyncProbe.threads.clear()
    val ds = (1L to 200L).map(i => (i, i)).toDS().coalesce(1)
    AsyncOps.asyncMapPartitions(ds, parallelism = 4)(_._1) { t =>
      AsyncProbe.threads.put(Thread.currentThread().getName, true)
      t._2
    }.limit(3).collect()
    Thread.sleep(300) // allow the completion listener to run shutdownNow
    val live = Thread.getAllStackTraces.keySet.toArray(Array.empty[Thread])
      .filter(t => t.isAlive && AsyncProbe.threads.containsKey(t.getName))
    assert(live.isEmpty, s"leaked pool threads: ${live.map(_.getName).mkString(",")}")
  }
}
