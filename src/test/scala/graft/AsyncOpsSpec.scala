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
}
