package graft

import java.nio.file.Files
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Online serving as a stream ([[graft.streaming.ServeStream]]): each
  * micro-batch of lookup requests is answered from the landed index
  * through the exact searchTopk path, so streamed answers must equal
  * the batch API's for the same query vectors. */
class ServeStreamSpec extends SparkSpecBase {

  test("streamed ANN serving equals batch searchTopk per micro-batch") {
    import spark.implicits._
    val d = sfDir
    // two disjoint query batches: corpus vectors 3..5 and 6..8 under
    // fresh negative qids (no corpus collision)
    def qsOf(ids: Range): Seq[(Long, Array[Double])] =
      spark.read.parquet(s"$d/embeddings.parquet")
        .filter(col("vec_id").isin(ids.map(i => Long.box(i.toLong)): _*))
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (-(r.getLong(0) + 1), r.getSeq[Double](1).toArray)).toSeq
    val (b1, b2) = (qsOf(3 to 5), qsOf(6 to 8))

    val sink = Files.createTempDirectory("graft-serve-sink").toString + "/out"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, Array[Double])]
    val q = graft.streaming.ServeStream.serveTopk(
      src.toDF().toDF("qid", "embedding"), d, "prefix", sink)
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(sink)
      .select(col("qid"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val batch = Similarity.searchTopk(spark, d, "prefix", b1 ++ b2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed == batch, "streamed serving must equal the batch API")
    // batch provenance recorded: both micro-batches present
    assert(spark.read.parquet(sink).select("batch_id").distinct().count() == 2)
  }
}
