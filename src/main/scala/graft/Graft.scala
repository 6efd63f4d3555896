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
    val required = Map(
      "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.session.timeZone" -> "UTC",
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val builder = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.ui.enabled", "false")
    required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    // getOrCreate silently returns any pre-existing session, dropping
    // every config above — fail fast instead of handing back a session
    // that looks configured but is not (wrong timezone/state provider
    // corrupts results, not just performance)
    val drifted = required.filter { case (k, v) => spark.conf.getOption(k) != Some(v) }
    require(drifted.isEmpty,
      s"Graft.session: pre-existing SparkSession overrides load-bearing configs: " +
        drifted.map { case (k, v) => s"$k=${spark.conf.getOption(k).orNull} (need $v)" }
          .mkString(", "))
    functions.GraftFunctions.register(spark)
    spark
  }
}
