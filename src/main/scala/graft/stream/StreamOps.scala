package graft.stream

import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming-query lifecycle hygiene. Spark keeps every state-store
 * provider of a STOPPED query loaded in the executor until the state
 * maintenance tick (60 s default) verifies it against the coordinator —
 * HDFS-backed providers hold their FULL state map on heap, so an
 * application that starts and stops many stateful queries (the
 * reference restarts its CQ pipeline per config change —
 * integration/tsdb/process.go lifecycle; any bench or test suite does
 * it constantly) accumulates dead providers that tax whatever runs
 * next. Measured: a 4-query back-to-back session inflated the last
 * streaming query 2.7× (13.9 s vs 5.2 s — BENCH_NOTES.md
 * "a9_streaming_hop root cause").
 *
 * [[stopAndUnload]] makes teardown deterministic: stop the query, then
 * unload every resident provider immediately. The unload is GLOBAL —
 * providers of still-ACTIVE queries are also dropped, which is safe
 * (each reloads lazily from its checkpoint on its next micro-batch)
 * but costs those queries one reload; prefer calling it when the
 * stopped query is the last stateful one in flight, which is the
 * teardown shape everywhere in this repo.
 */
object StreamOps {

  /** Stop `q` (if still active) and unload all resident state-store
   *  providers so heap returns to baseline now, not at the next
   *  maintenance tick. Idempotent. */
  def stopAndUnload(q: StreamingQuery): Unit = {
    if (q.isActive) q.stop()
    org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()
  }
}
