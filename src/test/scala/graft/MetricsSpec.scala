package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpecBase {
  import spark.implicits._

  // listener events are delivered asynchronously — poll for them
  private def awaitMetrics(l: MetricsListener)(p: Seq[QueryMetric] => Boolean): Seq[QueryMetric] = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var snap = l.snapshot()
    while (!p(snap) && System.nanoTime() < deadline) {
      Thread.sleep(50)
      snap = l.snapshot()
    }
    snap
  }

  test("listener records duration and output rows per completed action") {
    val l = Metrics.attach(spark)
    try {
      l.clear()
      val n = (1L to 1000L).toDF("x").filter(col("x") % 2 === 0).count()
      assert(n == 500)
      val recorded = awaitMetrics(l)(_.nonEmpty)
      assert(recorded.nonEmpty, "no metrics recorded")
      val m = recorded.last
      assert(!m.failed && m.durationNs > 0)
      assert(m.action == "count")
    } finally Metrics.detach(spark, l)
  }

  test("shuffle bytes are captured for a shuffling query") {
    val l = Metrics.attach(spark)
    try {
      l.clear()
      Tables.events(spark, sfDir).groupBy("user_id").count().collect()
      val snap = awaitMetrics(l)(_.exists(_.shuffleBytesWritten > 0))
      assert(snap.exists(_.shuffleBytesWritten > 0), s"expected shuffle bytes, got $snap")
    } finally Metrics.detach(spark, l)
  }
}
