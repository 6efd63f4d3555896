package graft

import org.apache.spark.sql.SparkSession

/** The engine facade (SURVEY §7): one entry point that builds a session
  * with every setting the engine's semantics depend on, and registers
  * the SQL function surface. The analog of the reference's single
  * configured entry point (`new ResponsiveKafkaStreams(topology, props)`,
  * api/ResponsiveKafkaStreams.java:96) — a user adopts the library by
  * calling `Graft.session()` and then using plain Spark.
  *
  * Load-bearing settings, each learned the hard way (NOTES.md):
  *  - UTC session timezone: fixture timestamps and every oracle compare
  *    assume it;
  *  - nanosAsLong: fixture parquet is TIMESTAMP(NANOS), which Spark has
  *    no type for (Tables.load truncates to µs the way DuckDB does);
  *  - RocksDB state store provider: transformWithState requires it;
  *  - AQE + skew-join: runtime re-planning and hot-key splitting
  *    (SkewOps.saltedJoin covers what AQE can't);
  *  - shuffle partitions sized to the parallelism in use, NOT the 200
  *    default (32-core local harness → 32; a cluster sizes to executors).
  */
object Graft {

  def session(
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    functions.GraftFunctions.register(spark)
    spark
  }
}
