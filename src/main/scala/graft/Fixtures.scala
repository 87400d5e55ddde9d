package graft

import java.nio.file.{Files, Path, Paths}

/** Session-scoped temp-fixture root (round-16: stop the debris leak at
 *  the source). Every store-backed query/verify/test fixture used to
 *  call `Files.createTempDirectory("graft_*")` directly and could not
 *  delete in-run (the returned DataFrame outlives its builder), so
 *  soaks and test batteries accumulated thousands of stale dirs —
 *  ~14 GB of tmp debris measurably DOUBLED write-heavy bench entries
 *  (BENCH_NOTES "Round-15 debris"). Now all fixtures nest under ONE
 *  per-JVM `graft_session_*` root that
 *   - a shutdown hook deletes on normal JVM exit, and
 *   - carries a `PID` marker so [[Bench]]'s crash-debris sweep can
 *     prove liveness (skip roots whose JVM is still running — a
 *     long-lived probe's fixture is safe even when a bench runs
 *     concurrently, which the old mtime-only floor could not promise).
 */
object Fixtures {
  /** Marker file name inside a session root; content = owning JVM pid. */
  val PidMarker = "PID"
  val SessionPrefix = "graft_session_"

  private lazy val root: Path = {
    val r = Files.createTempDirectory(SessionPrefix)
    Files.write(r.resolve(PidMarker),
      ProcessHandle.current().pid().toString.getBytes("UTF-8"))
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(r.toFile), "graft-fixture-sweep"))
    r
  }

  /** A fresh fixture dir under the session root — drop-in for
   *  `Files.createTempDirectory(prefix)` at every fixture site. */
  def newDir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** Is the JVM that owns `sessionRoot` still alive? Missing/unreadable
   *  marker counts as dead (pre-round-16 debris has no marker). */
  def ownerAlive(sessionRoot: Path): Boolean =
    try {
      val pid = new String(
        Files.readAllBytes(sessionRoot.resolve(PidMarker)), "UTF-8").trim.toLong
      ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
    } catch { case scala.util.control.NonFatal(_) => false }
}
