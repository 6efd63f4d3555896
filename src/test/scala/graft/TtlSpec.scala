package graft

import graft.operators.Ttl
import org.apache.spark.sql.functions._

/** Unit coverage for the TtlProvider-shaped policy API
  * (reference TtlProvider.java:32-113 semantics): default fallback,
  * infinite override, fromKey / fromValue / fromKeyAndValue shapes,
  * and withNoDefault retention. */
class TtlSpec extends SparkSpecBase {
  import spark.implicits._

  // rows at 0h, 10h, 30h, 80h before "now" (ts in epoch seconds)
  private val now = 1000000L * 3600
  private lazy val df = Seq(
    (1L, "purchase", now - 0L),
    (2L, "signup", now - 10 * 3600L),
    (3L, "view", now - 30 * 3600L),
    (10L, "view", now - 80 * 3600L)
  ).toDF("user_id", "event_type", "ts_sec")
    .withColumn("ts", col("ts_sec").cast("timestamp"))
    .withColumn("now", lit(now).cast("timestamp"))

  private def kept(p: graft.operators.TtlProvider): Set[Long] =
    p.retain(df, col("ts"), col("now")).select("user_id").collect().map(_.getLong(0)).toSet

  test("default-only policy expires by store TTL") {
    assert(kept(Ttl.withDefault(12 * 3600)) == Set(1L, 2L))
  }

  test("withNoDefault and no override never expires") {
    assert(kept(Ttl.withNoDefault) == Set(1L, 2L, 3L, 10L))
  }

  test("fromValue override: infinite pin + longer window + default fallback") {
    val p = Ttl.withDefault(12 * 3600)
      .fromValue(when(col("event_type") === "purchase", Ttl.Infinite)
        .when(col("event_type") === "view", 40L * 3600))
    // purchase pinned, signup falls to 12h default (alive at 10h),
    // views live 40h (30h alive, 80h expired)
    assert(kept(p) == Set(1L, 2L, 3L))
  }

  test("fromKey override: key-derived retention") {
    val p = Ttl.withDefault(12 * 3600)
      .fromKey(when(col("user_id") % 10 === 0, Ttl.Infinite))
    assert(kept(p) == Set(1L, 2L, 10L))
  }

  test("fromKeyAndValue override sees both key and value columns") {
    val p = Ttl.withNoDefault
      .fromKeyAndValue(
        when(col("user_id") < 3 && col("event_type") =!= "view", Ttl.Infinite)
          .otherwise(20L * 3600))
    // users 1,2 pinned (key < 3 and not a view); both views outlive 20h
    assert(kept(p) == Set(1L, 2L))
  }

  test("override with no default: un-overridden rows never expire") {
    val p = Ttl.withNoDefault
      .fromValue(when(col("event_type") === "view", 40L * 3600))
    assert(kept(p) == Set(1L, 2L, 3L))
  }
}
