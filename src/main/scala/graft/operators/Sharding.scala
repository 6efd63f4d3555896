package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus export — the training-shard writer that closes the
  * ingest → curate → export pipeline: the curated corpus lands as N
  * range-partitioned parquet shards, each internally sorted by the key,
  * so a training loader can stream shards sequentially (and locate a
  * key's shard by range) without any further shuffle.
  *
  * Scale: one range shuffle (Spark samples the key distribution to cut
  * balanced boundaries) + a partition-local sort that spills — exactly
  * the plan `repartitionByRange.sortWithinPartitions` produces; no
  * driver-side collection at any size.
  */
object Sharding {

  /** Write `df` as `numShards` range-partitioned shards sorted by `key`.
    * Returns the written row count, collected from the write job itself
    * via an Observation (CollectMetrics node in the write plan) — NOT by
    * re-reading the output, which at 100 TB would be a second full scan
    * of the export just to produce a number the job already knew. */
  def writeSorted(df: DataFrame, key: String, numShards: Int, path: String): Long = {
    val obs = org.apache.spark.sql.Observation()
    // the tap sits ABOVE the range exchange: repartitionByRange runs a
    // boundary-sampling pass over its child, and a tap below the
    // exchange would count every row twice (sample + real pass)
    df.repartitionByRange(numShards, col(key)).sortWithinPartitions(key)
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(path)
    obs.get("rows").asInstanceOf[Long]
  }
}
