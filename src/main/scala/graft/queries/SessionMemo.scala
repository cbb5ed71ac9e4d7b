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
  * make that impossible (the entry dies with the session) and also stop
  * dead sessions' entries accumulating for the process lifetime.
  *
  * Values built under a lost race are discarded (same best-effort
  * semantics as the ConcurrentHashMap pattern it replaces); builds are
  * serialized per memo via the map's monitor, which is what the old
  * `synchronized` double-check did too.
  */
final class SessionMemo[K, V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[K, V]]()

  def get(s: SparkSession, k: K)(build: => V): V = bySession.synchronized {
    var inner = bySession.get(s)
    if (inner == null) {
      inner = new java.util.HashMap[K, V]()
      bySession.put(s, inner)
    }
    val hit = inner.get(k)
    if (hit != null) hit
    else {
      val v = build
      inner.put(k, v)
      v
    }
  }
}
