package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite, built through the engine facade
  * (UTC, AQE+skew, RocksDB state store, SQL functions registered). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = Graft.session(master = "local[8]", shufflePartitions = 8)

  val sfDir = "/root/testdata/sf0.001"
}
