package org.apache.spark.sql.graft

/**
 * Benchmark-hygiene shim: [[org.apache.spark.sql.execution.streaming.state.StateStore]]
 * keeps every state-store provider of a STOPPED streaming query loaded in
 * the executor (`loadedProviders`) until the 60 s maintenance tick gets
 * around to verifying it with the coordinator. In a single-JVM bench that
 * runs several stateful streaming queries back-to-back, each stopped
 * query's resident providers (HDFS-backed providers hold their FULL state
 * map on heap) tax the next query's micro-batches — measured as a
 * cumulative 1.4-2.5× inflation of `a9_streaming_hop` when other
 * streaming queries precede it in the same session (BENCH_NOTES.md
 * "a9_streaming_hop root cause"). `unloadAll` is `private[sql]`, hence
 * this one-line forwarder in the sql package — original code, no Spark
 * internals copied.
 */
object StateStoreHygiene {
  def unloadAll(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
