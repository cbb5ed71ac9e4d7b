package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memo of expensive derived artifacts (persisted
  * index frames, trained models, metadata scalars), keyed by the LIVE
  * session object through a WeakHashMap.
  *
  * Why not `(System.identityHashCode(session), key)` (the repo's
  * earlier convention): identity hashes are reused after GC, so a new
  * session could — with matching inner key — be served a stale value
  * whose plan is bound to a stopped session's cache. Weak identity keys
  * make that impossible (the entry can never outlive its session and be
  * handed to an impostor). Cleanup is honest but partial: entries whose
  * values are plain scalars/models die with the session, while a
  * DataFrame value strongly references its SparkSession, so the value
  * keeps the weak key reachable and that entry lives for the process
  * lifetime — the memo's correctness story is the stale-identity fix,
  * not leak elimination; DataFrame-valued memos are bounded-cardinality
  * by construction (one entry per (session, SF dir)).
  *
  * Concurrency: the global WeakHashMap monitor guards only the tiny
  * get-or-create of the per-session entry; BUILDS run under the
  * per-session entry lock, so two sessions build concurrently (the
  * multi-tenant shape: one notebook's Lloyd training never blocks
  * another session's unrelated memo) while builds within one session
  * stay serialized — the `synchronized` monitor is reentrant, so nested
  * builds (the IVF-PQ build invoking the centroid build) still work.
  * Values built under a lost race are impossible by construction: the
  * double-check happens under the same per-session lock as the build.
  *
  * LOCK-ORDERING RULE (cross-memo nesting): reentrancy covers nesting
  * within ONE memo instance only. Each SessionMemo holds its own
  * per-session entry lock, so a build in memo A that nests a build in
  * memo B, concurrent with a same-session build in B nesting into A,
  * is a classic lock-order deadlock. Builds that nest ACROSS memo
  * instances must therefore acquire in one fixed global order:
  * pack-level result memos may call into the shared trainer/metadata
  * memos (trainMemo, nVecMemo, fixture memos), NEVER the reverse — a
  * trainer build must not invoke a pack memo. Every nesting in this
  * repo today follows that edge direction (verified: trainer builds
  * call only other trainer builds of the SAME memo, which reentrancy
  * covers); a new memo whose builds call into an existing one joins
  * the order below the memos it calls.
  */
final class SessionMemo[K, V] {
  private final class Entry {
    val map = new java.util.HashMap[K, V]()
  }

  private val bySession =
    new java.util.WeakHashMap[SparkSession, Entry]()

  def get(s: SparkSession, k: K)(build: => V): V = {
    val entry = bySession.synchronized {
      var e = bySession.get(s)
      if (e == null) {
        e = new Entry
        bySession.put(s, e)
      }
      e
    }
    entry.synchronized {
      val hit = entry.map.get(k)
      if (hit != null) hit
      else {
        val v = build
        entry.map.put(k, v)
        v
      }
    }
  }
}
