package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** A purchase enriched with the user's most recent prior signup. */
final case class AsofRow(purchase_id: Long, user_id: Long, asof_signup_id: java.lang.Long)

/** One retained signup version. */
final case class SignupRef(ts_ms: Long, event_id: Long)

/** Streaming twin of the q36 as-of join: per-key carry-forward state.
  * Each purchase emits with the newest signup at or before its OWN
  * event time — exact point-in-time semantics even when events arrive
  * out of order across microbatches:
  *
  *  - the state is the signup VERSION HISTORY (sorted ListState), not a
  *    single value, so a late purchase finds the signup that was current
  *    at its event time instead of one from its future;
  *  - stale signups insert into their ordered position; duplicates
  *    collapse;
  *  - versions shadowed below the watermark compact away (any future
  *    admissible purchase has ts ≥ watermark, so only the newest
  *    version at-or-below the watermark plus everything newer can ever
  *    be an answer) — state stays bounded by disorder, not by history.
  *
  * Emitted rows are append-mode-immutable, so a signup arriving after a
  * purchase already emitted cannot retro-enrich it — the as-of-arrival
  * deviation every streaming enrich shares; after an ordered full
  * replay the output equals the batch q36 answer (parity spec). Ties
  * follow the batch rule: a signup with (ts, id) lexicographically ≤
  * the purchase's (ts, id) is eligible.
  */
class AsofEnrichProcessor extends StatefulProcessor[Long, Event, AsofRow] {
  @transient private var signups: ListState[SignupRef] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    signups = getHandle.getListState[SignupRef](
      "signups", Encoders.product[SignupRef], TTLConfig.NONE)

  private def lexLeq(a: SignupRef, ts: Long, id: Long): Boolean =
    a.ts_ms < ts || (a.ts_ms == ts && a.event_id <= id)

  override def handleInputRows(
      key: Long, rows: Iterator[Event], timerValues: TimerValues): Iterator[AsofRow] = {
    var refs = if (signups.exists()) signups.get().toVector else Vector.empty[SignupRef]
    var dirty = false
    val out = Vector.newBuilder[AsofRow]
    rows.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      if (e.event_type == "signup") {
        val ref = SignupRef(e.ts.getTime, e.event_id)
        if (!refs.contains(ref)) {
          refs = (refs :+ ref).sortBy(r => (r.ts_ms, r.event_id))
          dirty = true
        }
      } else if (e.event_type == "purchase") {
        val eligible = refs.filter(lexLeq(_, e.ts.getTime, e.event_id))
        out += AsofRow(e.event_id, key,
          eligible.lastOption.map(r => Long.box(r.event_id)).orNull)
      }
    }
    // watermark compaction: versions shadowed by a newer version that is
    // itself STRICTLY below the watermark can never answer a future query.
    // A purchase at ts == wm is still admissible and its tie rule is
    // (ts equal && signup.event_id <= purchase.event_id), so every
    // version at ts == wm must survive — shadow only below the newest
    // version with ts_ms < wm.
    val wm = timerValues.getCurrentWatermarkInMs()
    if (wm > 0 && refs.nonEmpty) {
      val shadowIdx = refs.lastIndexWhere(_.ts_ms < wm)
      if (shadowIdx > 0) {
        refs = refs.drop(shadowIdx)
        dirty = true
      }
    }
    if (dirty) signups.put(refs.toArray)
    out.result().iterator
  }
}
