package graft.streaming

/** State TTL for stateful stream operators — the analog of the
  * reference's per-store TTL (api/stores/TtlProvider.java:32-113),
  * enforced ON READ like the reference's `get(key, streamTimeMs)`
  * (kafka-client/src/main/java/dev/responsive/kafka/internal/stores/PartitionedOperations.java:355-390) and this engine's own
  * KvStoreProcessor: every state row carries its last-write timestamp,
  * and a read past `ttlMs` treats the row as absent (the reader also
  * clears it, so expired rows stop occupying the store the next time
  * their key is touched).
  *
  * Deliberately NOT Spark's native TTLConfig: that requires
  * TimeMode.ProcessingTime, under which the engine triggers continuous
  * empty micro-batches to advance timers — a busy-loop in long-idle
  * pipelines and a livelock for `processAllAvailable`-driven harnesses
  * (measured: ~1000 empty epochs in 6 min on an idle two-phase FK
  * join). Lazy read-side expiry keeps TimeMode.None — the only mode
  * chained stateful operators run under — and costs one long per state
  * row.
  *
  * A key never touched again does keep its (expired) row on disk; at
  * the reference's own semantics that is also true until compaction.
  * Pipelines needing hard reclamation bound it with checkpoint
  * lifecycle (fresh checkpoint per retention era) — the same operational
  * answer the reference's segment expiry gives (SURVEY §2.6).
  *
  * `clock` returns "now" in ms. The default is wall-clock
  * (processing-time TTL); tests swap in a manual clock for
  * deterministic expiry — the lambda must be serializable (capture
  * nothing, or reference a JVM-global holder).
  */
final case class StateTtl(ttlMs: Long, clock: () => Long = () => System.currentTimeMillis()) {
  def expired(writeTs: Long): Boolean = clock() - writeTs > ttlMs
}
