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
    * Returns the written row count. */
  def writeSorted(df: DataFrame, key: String, numShards: Int, path: String): Long = {
    val out = df.repartitionByRange(numShards, col(key)).sortWithinPartitions(key)
    out.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path).count()
  }
}
