package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins on hot keys.
  *
  * AQE's skew-join handles most cases at runtime (enabled in our session
  * configs); this is the explicit salting form for the cases AQE can't
  * rescue — e.g. a single key carrying an unsplittable fraction of the
  * fact side joined to a non-broadcastable table, where one reducer
  * would otherwise process the whole hot key.
  *
  * `saltedJoin` splits every fact-side key into `salts` sub-keys via a
  * deterministic content hash (never rand() — retries and replays must
  * route a row identically), and replicates the other side `salts` ways
  * so every sub-key finds its match. Output rows are exactly those of
  * the unsalted join; only the partitioning changes: the hot key's rows
  * spread over `salts` reducers instead of one.
  *
  * Cost model: replicating the build side multiplies its shuffle volume
  * by `salts` — use for joins where the build side is far smaller than
  * the hot key's row count (the usual skew shape), and size `salts` to
  * the desired per-reducer slice of the hottest key.
  */
object SkewOps {

  /** Equi-join `fact` with `dim` on `key`, salting the fact side
    * `salts` ways and replicating `dim` to match. Supports inner and
    * left_outer (fact-preserving) joins. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports fact-preserving joins, not $joinType")
    // the helper column must not collide with caller data — silently
    // overwriting and then dropping a real __salt column would corrupt
    // both the join keys and the output schema
    val saltCol = Iterator.from(0).map(i => if (i == 0) "__salt" else s"__salt$i")
      .find(c => !fact.columns.contains(c) && !dim.columns.contains(c)).get
    // deterministic per-row salt: hash of the full fact row, so replays,
    // task retries, and speculative attempts route a row the same way
    val factCols = fact.columns.map(col).toIndexedSeq
    val salted = fact.withColumn(saltCol, pmod(xxhash64(struct(factCols: _*)), lit(salts)))
    val replicated = dim
      .withColumn(saltCol, explode(expr(s"sequence(0, ${salts - 1})")))
      .withColumn(saltCol, col(saltCol).cast("long"))
    salted.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
