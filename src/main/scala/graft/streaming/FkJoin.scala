package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming table–table foreign-key join — the analog of Kafka Streams'
  * KTable FK join as exercised by the reference
  * (/root/reference/kafka-client/src/test/java/dev/responsive/kafka/integration/ResponsiveForeignKeyJoinIntegrationTest.java:150-157:
  * `inventory.join(merchant, Inventory::getMerchantId, joiner)`), which
  * Kafka Streams implements with subscription/response topics. SURVEY §7
  * flags this as a hard part with no Spark built-in.
  *
  * Two phases, mirroring the subscription/response topology:
  *
  *  1. **Router** (keyed by left pk): remembers each left row's last FK;
  *     on update emits a retraction to the old FK's partition when the FK
  *     changed, plus an upsert to the new FK's partition — the
  *     "subscription topic" re-key.
  *  2. **Joiner** (keyed by FK): holds the right side's current value and
  *     a map of subscribed left rows; a left upsert emits one joined row,
  *     a right update fans out joined rows to every subscribed left — the
  *     "response" path.
  *
  * Output is an update-mode changelog of FkJoined rows (last-write-wins
  * per left pk by seq); left rows with no right match emit rval = null,
  * and retractions emit a tombstone (rval null + retracted=true).
  *
  * Scale: both phases partition by their key (pk then fk) — exactly two
  * shuffles, state ∝ live rows; the right-update fan-out touches only
  * that FK's subscribers.
  */
object FkJoin {

  /** Left-table changelog record (upsert by pk; fk is the join column). */
  final case class LeftRow(pk: Long, fk: Long, lval: String, seq: Long)
  /** Right-table changelog record (upsert by rk). */
  final case class RightRow(rk: Long, rval: String, seq: Long)

  /** Internal envelope routed on `key` (= fk). */
  final case class FkMsg(
      key: Long, side: String, pk: Long, fk: Long,
      lval: String, rval: String, seq: Long, retract: Boolean)

  /** Joined changelog row. */
  final case class FkJoined(
      pk: Long, fk: Long, lval: String, rval: String, seq: Long, retracted: Boolean)

  /** Phase 1: per-pk FK bookkeeping, emits retract+upsert envelopes.
    * A left row with `lval == null` is a tombstone (the KTable delete):
    * it retracts the subscription at the last FK and clears the
    * bookkeeping, so the joined row disappears downstream.
    *
    * With `ttl` set, bookkeeping idle past the TTL is forgotten: an FK
    * change after expiry emits no retraction to the old FK — coherent
    * with the joiner, whose subscription for that pk expired on the same
    * clock.
    *
    * CHECKPOINT COMPATIBILITY: round 10 widened the "lastFk" state from
    * Long to (fk, writeTs) — a streaming query cannot resume a
    * checkpoint written by the Long version; restart from a fresh
    * checkpoint and re-feed the changelog. */
  class FkRouter(ttl: Option[StateTtl] = None)
      extends StatefulProcessor[Long, LeftRow, FkMsg] {
    @transient private var lastFk: ValueState[(Long, Long)] = _ // (fk, writeTs)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastFk = getHandle.getValueState[(Long, Long)]("lastFk",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    private def liveFk(): Option[Long] =
      if (!lastFk.exists()) None
      else {
        val (fk, ts) = lastFk.get()
        if (ttl.exists(_.expired(ts))) { lastFk.clear(); None } else Some(fk)
      }

    override def handleInputRows(
        key: Long, rows: Iterator[LeftRow], timerValues: TimerValues): Iterator[FkMsg] = {
      val out = Vector.newBuilder[FkMsg]
      rows.toVector.sortBy(_.seq).foreach { r =>
        if (r.lval == null) { // left tombstone
          liveFk().foreach { fk =>
            out += FkMsg(fk, "L", r.pk, fk, null, null, r.seq, retract = true)
            lastFk.clear()
          }
        } else {
          liveFk().filter(_ != r.fk).foreach { fk =>
            out += FkMsg(fk, "L", r.pk, fk, null, null, r.seq, retract = true)
          }
          lastFk.update((r.fk, ttl.map(_.clock()).getOrElse(0L)))
          out += FkMsg(r.fk, "L", r.pk, r.fk, r.lval, null, r.seq, retract = false)
        }
      }
      out.result().iterator
    }
  }

  /** A state row paired with its last-write timestamp (0 when no TTL —
    * the timestamp is never consulted then). */
  final case class Stamped[V](v: V, writeTs: Long)

  /** Phase 2: per-fk join state (right value + subscribed lefts).
    * `ttl` as in [[FkRouter]]: an expired subscription stops receiving
    * right-update fan-out; an expired right value joins as null again.
    *
    * CHECKPOINT COMPATIBILITY: round 10 wrapped both state rows in
    * [[Stamped]] — checkpoints from earlier rounds cannot resume. */
  class FkJoiner(ttl: Option[StateTtl] = None)
      extends StatefulProcessor[Long, FkMsg, FkJoined] {
    @transient private var right: ValueState[Stamped[RightRow]] = _
    @transient private var lefts: MapState[Long, Stamped[LeftRow]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      right = getHandle.getValueState[Stamped[RightRow]](
        "right", Encoders.product[Stamped[RightRow]], TTLConfig.NONE)
      lefts = getHandle.getMapState[Long, Stamped[LeftRow]](
        "lefts", Encoders.scalaLong, Encoders.product[Stamped[LeftRow]], TTLConfig.NONE)
    }

    private def now(): Long = ttl.map(_.clock()).getOrElse(0L)

    override def handleInputRows(
        key: Long, rows: Iterator[FkMsg], timerValues: TimerValues): Iterator[FkJoined] = {
      val out = Vector.newBuilder[FkJoined]
      def rv: String =
        if (!right.exists()) null
        else {
          val s = right.get()
          if (ttl.exists(_.expired(s.writeTs))) { right.clear(); null } else s.v.rval
        }
      // live subscriptions; expired ones are dropped from state (removal
      // buffered — no mutation under the state iterator)
      def liveLefts(): Seq[(Long, LeftRow)] = {
        val live = Vector.newBuilder[(Long, LeftRow)]
        val dead = Vector.newBuilder[Long]
        lefts.iterator().foreach { case (pk, s) =>
          if (ttl.exists(_.expired(s.writeTs))) dead += pk else live += (pk -> s.v)
        }
        dead.result().foreach(lefts.removeKey)
        live.result()
      }
      rows.toVector.sortBy(m => (m.seq, m.side)).foreach { m =>
        if (m.side == "L" && m.retract) {
          // same stamped TTL read as liveLefts/rv (ADVICE r10): an
          // expired subscription is cleared WITHOUT emitting — the
          // downstream already stopped seeing it when it expired
          if (lefts.containsKey(m.pk)) {
            val expired = ttl.exists(_.expired(lefts.getValue(m.pk).writeTs))
            lefts.removeKey(m.pk)
            if (!expired)
              out += FkJoined(m.pk, key, null, null, m.seq, retracted = true)
          }
        } else if (m.side == "L") {
          val lr = LeftRow(m.pk, m.fk, m.lval, m.seq)
          lefts.updateValue(m.pk, Stamped(lr, now()))
          out += FkJoined(m.pk, m.fk, m.lval, rv, m.seq, retracted = false)
        } else { // right upsert or tombstone: fan out to all subscribers
          if (m.rval == null) right.clear() // right delete → left-join nulls
          else right.update(Stamped(RightRow(key, m.rval, m.seq), now()))
          liveLefts().foreach { case (pk, lr) =>
            out += FkJoined(pk, key, lr.lval, m.rval, m.seq, retracted = false)
          }
        }
      }
      out.result().iterator
    }
  }

  /** Compose the two phases over changelog streams (or batch datasets in
    * tests). Returns the joined changelog.
    *
    * `ttl`: optional state expiry (reference TtlProvider analog,
    * enforced on read — see [[StateTtl]]). None (the default) keeps
    * state forever; Some(StateTtl(ms)) expires abandoned pks, fks and
    * subscriptions ms after their last update, without leaving
    * TimeMode.None. */
  def fkJoinStream(left: Dataset[LeftRow], right: Dataset[RightRow],
      ttl: Option[StateTtl] = None): Dataset[FkJoined] = {
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val msgEnc: org.apache.spark.sql.Encoder[FkMsg] = Encoders.product[FkMsg]
    implicit val joinedEnc: org.apache.spark.sql.Encoder[FkJoined] = Encoders.product[FkJoined]
    val routed = left.groupByKey(_.pk)
      .transformWithState(new FkRouter(ttl), TimeMode.None(), OutputMode.Update())
    val rightMsgs = right.map(r =>
      FkMsg(r.rk, "R", -1L, r.rk, null, r.rval, r.seq, retract = false))
    routed.union(rightMsgs)
      .groupByKey(_.key)
      .transformWithState(new FkJoiner(ttl), TimeMode.None(), OutputMode.Update())
  }
}
