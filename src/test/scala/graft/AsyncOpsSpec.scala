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

  test("stateful: same-key state writes are visible to later invocations, in order") {
    // each record increments its key's counter; the emitted value is the
    // counter AFTER the increment, so per key the outputs must read
    // 1,2,3,… in encounter order — any lost update, stale read, or
    // reordering breaks the exact sequence
    val input = (1L to 300L).map(i => (i % 5, i))
    val ds = input.toDS().coalesce(1)
    val out = AsyncOps.asyncMapPartitionsStateful[(Long, Long), Long, (Long, Long, Long)](
      ds, parallelism = 8, maxInFlight = 16)(_._1) { (t, st) =>
      val n = st.get.getOrElse(0L) + 1
      st.put(n)
      (t._1, t._2, n)
    }.collect()
    assert(out.length == 300)
    for ((k, rows) <- out.groupBy(_._1)) {
      val inOrder = rows.sortBy(_._2).map(_._3)
      assert(inOrder.sameElements(1L to inOrder.length),
        s"key $k counter sequence broken: ${inOrder.take(10).mkString(",")}")
    }
  }

  test("stateful: keys are isolated and delete tombstones the entry") {
    // key 1 puts then deletes; key 2 only reads — it must never observe
    // key 1's value, and key 1's read after delete must be None
    val input = Seq((1L, "put"), (2L, "read"), (1L, "del"), (1L, "read"), (2L, "read"))
    val ds = input.toDS().coalesce(1)
    val out = AsyncOps.asyncMapPartitionsStateful[(Long, String), String, String](
      ds, parallelism = 4)(_._1) { (t, st) =>
      t._2 match {
        case "put"  => st.put("v1"); "ok"
        case "del"  => st.delete(); "ok"
        case "read" => st.get.getOrElse("none")
      }
    }.collect()
    assert(out.toSeq == Seq("ok", "none", "ok", "none", "none"))
  }

  test("stateful: read-your-writes within one invocation") {
    val ds = Seq((7L, 42L)).toDS().coalesce(1)
    val out = AsyncOps.asyncMapPartitionsStateful[(Long, Long), Long, Long](
      ds, parallelism = 2)(_._1) { (t, st) =>
      st.put(t._2)
      st.get.get // must see the value written two lines up
    }.collect()
    assert(out.toSeq == Seq(42L))
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
