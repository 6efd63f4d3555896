package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Remaining stateless DSL surface (SURVEY §2.2): flatMap (explode) and
  * branch/split + merge — the Kafka Streams `flatMap`, `split()` and
  * `merge()` operators the reference's store layer sits under.
  */
object StatelessOps {

  /** Q25 — flatMap: one document row → one row per token, then a count
    * per token (the flatMap + groupBy word-count shape). */
  val q25 = QueryDef(
    "q25_flatmap_explode",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n")),
    Some("""SELECT w AS word, count(*) AS n
           |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
           |GROUP BY 1""".stripMargin)
  )

  /** Q26 — branch/split + merge: route events into typed branches with
    * per-branch transforms, then union them back (KStream#split /
    * KStream#merge analog). Branch predicates are disjoint and total. */
  val q26 = QueryDef(
    "q26_branch_merge",
    (s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), lit("purchase").as("branch"),
          round(col("value") * 1.1, 3).as("amount"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id"), lit("error").as("branch"), lit(0.0).as("amount"))
      val rest = e.filter(!col("event_type").isin("purchase", "error"))
        .select(col("event_id"), lit("other").as("branch"),
          round(col("value"), 2).as("amount"))
      purchases.union(errors).union(rest)
    },
    Some("""SELECT event_id, 'purchase' AS branch, round(value * 1.1, 3) AS amount
           |FROM events WHERE event_type = 'purchase'
           |UNION ALL
           |SELECT event_id, 'error' AS branch, CAST(0.0 AS DOUBLE) AS amount
           |FROM events WHERE event_type = 'error'
           |UNION ALL
           |SELECT event_id, 'other' AS branch, round(value, 2) AS amount
           |FROM events WHERE event_type NOT IN ('purchase', 'error')""".stripMargin)
  )

  val all: Seq[QueryDef] = Seq(q25, q26)
}
