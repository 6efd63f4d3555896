package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interactive queries with an explicit position — the analog of the
  * reference's IQ `Position` / staleness-bound surface
  * (/root/reference/kafka-client/src/main/java/dev/responsive/kafka/internal/stores/ResponsiveKeyValueStore.java:202-204:
  * reads report the changelog offset the served snapshot reflects, so a
  * caller can bound staleness). On Spark the statestore checkpoint IS
  * the changelog: the committed-batch log under `<ckpt>/commits` names
  * the versions that exist, and the statestore source can pin a read to
  * any of them — so "position" here is the committed microbatch id, and
  * a pinned read is a repeatable snapshot at that position even while
  * the stream keeps committing newer batches. */
object InteractiveQueries {

  /** The highest committed microbatch id in the checkpoint — the
    * position of the freshest consistent snapshot. -1 if nothing has
    * committed yet. */
  def position(ckpt: String): Long = {
    val dir = new java.io.File(ckpt, "commits")
    val ids = Option(dir.list()).getOrElse(Array.empty[String])
      .filter(_.forall(_.isDigit)).map(_.toLong)
    if (ids.isEmpty) -1L else ids.max
  }

  /** Read a state variable's rows as of `batchId` (defaults to the
    * freshest committed position). The snapshot is consistent: it
    * reflects exactly the writes of batches 0..batchId. */
  def stateAt(
      spark: SparkSession,
      ckpt: String,
      stateVarName: String,
      batchId: Long = -1L): DataFrame = {
    val at = if (batchId >= 0) batchId else position(ckpt)
    require(at >= 0,
      s"no committed snapshot in checkpoint $ckpt yet — run at least one microbatch first")
    spark.read.format("statestore")
      .option("path", ckpt)
      .option("stateVarName", stateVarName)
      .option("batchId", at)
      .load()
  }
}
