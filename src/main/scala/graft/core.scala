package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark query over the fixture tables plus (when
  * SQL-expressible) an equivalent DuckDB oracle for the driver's
  * differential check (SURVEY §5 — the analog of the reference's
  * regression harness, kafka-client-examples/e2e-test regression/).
  *
  * Contract notes:
  *  - Column names MUST match between `fn`'s output and `oracle`.
  *  - Never emit raw TIMESTAMP columns (parquet ns vs µs mismatch between
  *    DuckDB and Spark); emit epoch seconds as BIGINT instead.
  *  - Round every DOUBLE aggregate (ulp-order summation differences).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    /** false = oracle-baseline plan that is deliberately NOT scalable
      * (e.g. dd2/dd4's exhaustive O(n²) pair joins, kept as differential
      * ground truth for their bucketed scale twins dd3/dd7). ScaleProbe
      * skips these by default so a 100× run never hits an O(n²) wall,
      * and users can query the flag before pointing a plan at a large
      * input. */
    scalePath: Boolean = true
)

/** Fixture table loaders (TESTDATA.md). All reads go through here so
  * that scan options stay in one place. At 100 TB these parquet dirs
  * would be partitioned tables; the loaders are the seam where
  * partition pruning / bucketing metadata would attach.
  */
object Tables {
  /** Parquet TIMESTAMP(NANOS) columns per table. Spark has no ns
    * timestamp type; we read them as raw ns longs
    * (spark.sql.legacy.parquet.nanosAsLong) and truncate to µs
    * TimestampType — the same truncation DuckDB applies reading the
    * same files, so oracle comparisons agree exactly. */
  private val tsCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.LongType
    val converted = tsCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      df.schema(c).dataType match {
        case LongType => // TIMESTAMP(NANOS) read as raw ns
          df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
        case _ => // µs TIMESTAMP_NTZ → session-TZ (UTC) TimestampType
          df.withColumn(c, col(c).cast("timestamp"))
      }
    }
    // origin-event accounting (opt-in; see Metrics.TapSourcesKey): every
    // query over a tapped loader reports rows-in with no per-query wiring
    if (spark.conf.get(Metrics.TapSourcesKey, "false").toBoolean) Metrics.tapSource(converted)
    else converted
  }

  /** events restricted to `[loIso, hiIso)` with the range predicate
    * applied to the RAW ns long BEFORE the µs conversion, so it reaches
    * the parquet scan as a comparable pushed filter (row-group min/max
    * pruning). Filtering the converted `timestamp_micros(...)` column
    * only pushes IsNotNull — at 100 TB that is a full-table read. */
  def eventsBetween(s: SparkSession, d: String, loIso: String, hiIso: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, lit}
    import org.apache.spark.sql.types.LongType
    def ns(iso: String): Long =
      java.time.LocalDate.parse(iso).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.getEpochSecond * 1000000000L
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= lit(ns(loIso)) && col("ts") < lit(ns(hiIso)))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // bounds as explicit UTC-µs literals, NOT lit(iso).cast: a cast
        // parses in the session timezone, which would silently shift the
        // window in any non-UTC session while the LongType branch above
        // stays UTC-pinned
        events(s, d).filter(
          col("ts") >= expr(s"timestamp_micros(${ns(loIso) / 1000}L)") &&
            col("ts") < expr(s"timestamp_micros(${ns(hiIso) / 1000}L)"))
    }
  }

  def region(s: SparkSession, d: String)    = load(s, d, "region")
  def nation(s: SparkSession, d: String)    = load(s, d, "nation")
  def customer(s: SparkSession, d: String)  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = load(s, d, "supplier")
  def part(s: SparkSession, d: String)      = load(s, d, "part")
  def orders(s: SparkSession, d: String)    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String)    = load(s, d, "events")
  def documents(s: SparkSession, d: String) = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = load(s, d, "embeddings")
}
