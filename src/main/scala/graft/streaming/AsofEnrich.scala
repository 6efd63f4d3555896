package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** A purchase enriched with the user's most recent prior signup. */
final case class AsofRow(purchase_id: Long, user_id: Long, asof_signup_id: java.lang.Long)

/** Streaming twin of the q36 as-of join: per-key carry-forward state —
  * a ValueState holding the latest signup seen so far; each purchase
  * emits with that snapshot. The batch form is a window function; the
  * streaming form is exactly one small ValueState per key, which is why
  * the carry-forward formulation beats a range join at any scale.
  */
class AsofEnrichProcessor extends StatefulProcessor[Long, Event, AsofRow] {
  @transient private var lastSignup: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSignup = getHandle.getValueState[Long]("lastSignup", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[Event], timerValues: TimerValues): Iterator[AsofRow] = {
    val out = Vector.newBuilder[AsofRow]
    rows.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      if (e.event_type == "signup") lastSignup.update(e.event_id)
      else if (e.event_type == "purchase") {
        out += AsofRow(e.event_id, key,
          if (lastSignup.exists()) Long.box(lastSignup.get()) else null)
      }
    }
    out.result().iterator
  }
}
