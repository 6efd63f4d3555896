package graft.operators

import graft.{QueryDef, Tables}
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

  val Salts = 8
  val HotKey = 7L
  val DimKeys = 97L

  /** q57 — the salted join registry-graded end-to-end (the q04b
    * precedent: probe-proven mechanism → oracle-graded query). The fact
    * side is events with a synthesized hot key (4/5 of all rows land on
    * key [[HotKey]] — the one-key-wedges-one-reducer shape that is the
    * #1 real-cluster join killer); the dim side is the distinct key
    * domain with a label. The join runs through [[saltedJoin]] with a
    * `merge` hint pinning a shuffle join (at fixture scale Spark would
    * otherwise broadcast the 97-row dim and no reducer would ever see
    * the hot key; at 100 TB the dim that NEEDS salting is precisely the
    * one too big to broadcast). The oracle is the plain unsalted join —
    * salting must be invisible in the result. SkewOpsSpec additionally
    * pins the distribution: no post-salt (key, salt) slice of the hot
    * key exceeds 2× the mean slice. */
  val q57 = QueryDef(
    "q57_salted_skew_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val fact = ev.select(
        when(col("event_id") % 5 === 0, col("user_id") % DimKeys)
          .otherwise(lit(HotKey)).as("skew_key"),
        col("value"))
      val dim = ev.select((col("user_id") % DimKeys).as("skew_key")).distinct()
        .withColumn("segment", concat(lit("seg_"), col("skew_key")))
      saltedJoin(fact, dim.hint("merge"), "skew_key", Salts)
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("total"))
    },
    Some(s"""WITH fact AS (
            |  SELECT CASE WHEN event_id % 5 = 0 THEN user_id % $DimKeys
            |              ELSE $HotKey END AS skew_key, value
            |  FROM events),
            |dim AS (
            |  SELECT skew_key, 'seg_' || CAST(skew_key AS VARCHAR) AS segment
            |  FROM (SELECT DISTINCT user_id % $DimKeys AS skew_key FROM events))
            |SELECT segment, count(*) AS cnt, round(sum(value), 4) AS total
            |FROM fact JOIN dim USING (skew_key)
            |GROUP BY segment""".stripMargin),
    doc = "salted skew join over a synthesized hot key; oracle = the plain join"
  )

  val all: Seq[QueryDef] = Seq(q57)
}
