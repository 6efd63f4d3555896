package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite, built through the engine facade
  * (UTC, AQE+skew, RocksDB state store, SQL functions registered). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = Graft.session(master = "local[8]", shufflePartitions = 8)

  val sfDir = "/root/testdata/sf0.001"
}

/** JVM-global manual clock for [[graft.streaming.StateTtl]] tests:
  * local-mode executors share the JVM, so processors observe `nowMs`
  * updates made by the test thread between micro-batches — expiry
  * becomes deterministic, no sleeps. */
object ManualTtlClock {
  val nowMs = new java.util.concurrent.atomic.AtomicLong(0L)
  val clock: () => Long = () => nowMs.get()
}
