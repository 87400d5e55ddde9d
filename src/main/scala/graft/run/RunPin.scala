package graft.run

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * ONE persisted pin across EVERY store a training run reads — the
 * missing top layer of the reproducibility story: the tier store pins
 * its corpus ([[graft.store.TierStore.pinNow]]), the streamed indexes
 * pin theirs ([[graft.functions.Similarity.pinIvfIndex]],
 * [[graft.functions.Dedup.pinMinhashIndex]]), but a real pipeline run
 * touches all of them, and "re-run last Tuesday's job" needs the whole
 * VECTOR of pins, saved somewhere durable, resolvable months later. A
 * `RunPin` is that vector: named per-store pins plus each store's kind
 * and path, captured in one call, persisted as a tiny atomic manifest
 * next to the run's artifacts, and re-loaded to drive every `asOf`
 * read arm the engine has.
 *
 * Each member pin is individually LOGICAL ([[graft.store.AsOfPin]] —
 * positions in that store's own commit sequences; no clock in any
 * comparison), so a loaded manifest reproduces each store's exact
 * capture-time state regardless of later appends, folds, rebuilds, or
 * any mtime games an object store plays.
 * Members are captured in the caller's order, not atomically across
 * stores: capture DERIVED stores first (indexes, then the corpus) so
 * the cut is causally consistent with a corpus-then-index writer — an
 * index pin can then only lag its corpus pin, never lead it.
 *
 * Resolution is GUARDED: [[RunPin.ivfPin]]/[[RunPin.minhashPin]]/
 * [[RunPin.tierPin]] check both the kind and the path recorded at
 * capture, so applying run A's manifest to run B's index fails loudly
 * instead of silently pinning the wrong corpus. Vacuumed history keeps
 * its per-store contract: a resolution older than what survives throws
 * (`_floor`/ledger-fold records), never a partial read.
 *
 * Reference semantics: the reference answers historical queries only
 * as far as its retention policies keep data
 * (/root/reference/src/integration/tsdb/storage/influxdb_v2.go:34-42);
 * a persisted cross-store pin vector is the training-pipeline
 * extension of that stance — explicit, durable, loud past reclaimed
 * history.
 */
final case class RunPin(entries: Map[String, RunPin.Entry]) {

  /** The raw pin of a member (loud on unknown names). */
  def pinOf(name: String): graft.store.AsOfPin = entry(name).pin

  private[run] def entry(name: String): RunPin.Entry =
    entries.getOrElse(name, throw new NoSuchElementException(
      s"run pin has no member '$name' (members: ${entries.keys.toSeq.sorted.mkString(", ")})"))

  private[run] def checked(name: String, kind: String,
      path: String): graft.store.AsOfPin = {
    val e = entry(name)
    require(e.kind == kind,
      s"run-pin member '$name' is a ${e.kind} pin, not a $kind pin")
    require(e.path == path,
      s"run-pin member '$name' was captured over ${e.path}, not $path — " +
        "refusing to pin a different store")
    e.pin
  }
}

object RunPin {

  /** One member: the store's kind ("tier" | "ivf" | "minhash" |
   *  "bm25"), the path it was captured over, and its logical pin. */
  final case class Entry(kind: String, path: String, pin: graft.store.AsOfPin)

  /** A store to pin. */
  sealed trait Target
  final case class Tier(store: graft.store.TierStore) extends Target
  final case class Ivf(path: String) extends Target
  final case class Minhash(path: String) extends Target
  final case class Bm25(path: String) extends Target

  /** Capture every target's pin, in the given order (derived stores
   *  first for a causally-consistent cut — see the class doc). */
  def capture(spark: SparkSession, targets: Seq[(String, Target)]): RunPin = {
    require(targets.map(_._1).distinct.length == targets.length,
      "duplicate member names in a run-pin capture")
    RunPin(targets.map { case (name, t) =>
      name -> (t match {
        case Tier(st) => Entry("tier", st.root, st.pinNow())
        case Ivf(p) =>
          Entry("ivf", p, graft.functions.Similarity.pinIvfIndex(spark, p))
        case Minhash(p) =>
          Entry("minhash", p, graft.functions.Dedup.pinMinhashIndex(spark, p))
        case Bm25(p) =>
          Entry("bm25", p, graft.functions.Retrieval.pinBm25Index(spark, p))
      })
    }.toMap)
  }

  // ---- guarded resolution arms ---- //

  /** The pinned as-of read of a tier (kind+path guarded). */
  def tierRead(pin: RunPin, name: String, store: graft.store.TierStore,
      tier: graft.model.Tier): DataFrame =
    store.readAsOf(tier, pin.checked(name, "tier", store.root))

  /** The member pin for an IVF index at `path` (kind+path guarded) —
   *  feed it to any `asOf` arm of the Similarity index API. */
  def ivfPin(pin: RunPin, name: String, path: String): graft.store.AsOfPin =
    pin.checked(name, "ivf", path)

  /** The member pin for a MinHash index at `path` (kind+path guarded). */
  def minhashPin(pin: RunPin, name: String, path: String): graft.store.AsOfPin =
    pin.checked(name, "minhash", path)

  /** The member pin for a BM25 index at `path` (kind+path guarded). */
  def bm25Pin(pin: RunPin, name: String, path: String): graft.store.AsOfPin =
    pin.checked(name, "bm25", path)

  // ---- persistence: a tiny atomic ok-terminated manifest ---- //
  //
  // One line per member (URL-encoded fields — names and paths may hold
  // anything), `ok` last. Written staged-hidden + renamed: the manifest
  // APPEARS atomically and a torn write is detectable (no `ok`), the
  // TierLayout.commit idiom. Format is engine-independent on purpose:
  // the manifest lives next to the run's artifacts for as long as the
  // run's provenance matters.

  private val Header = "graft-run-pin v2" // v2: logical AsOfPin members

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  /** Persist atomically at `file` (overwrites a previous manifest). */
  def save(spark: SparkSession, pin: RunPin, file: String): Unit = {
    val p = new HPath(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val body = (Seq(Header) ++
      pin.entries.toSeq.sortBy(_._1).map { case (n, e) =>
        s"${enc(n)}\t${enc(e.kind)}\t${enc(e.path)}\t${enc(e.pin.encoded)}"
      } ++ Seq("ok", "")).mkString("\n")
    val staged = new HPath(p.getParent, s"._staging_${p.getName}")
    val out = fs.create(staged, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false): Unit
    require(fs.rename(staged, p), s"run-pin publish: $staged -> $p failed")
  }

  /** Load a saved manifest — loud on absence or a torn write. */
  def load(spark: SparkSession, file: String): RunPin = {
    val p = new HPath(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no run-pin manifest at $file")
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val lines = text.linesIterator.toSeq
    require(lines.headOption.contains(Header) && lines.lastOption.contains("ok"),
      s"run-pin manifest at $file is torn or not a run pin")
    RunPin(lines.drop(1).dropRight(1).map { l =>
      l.split("\t", 4) match {
        case Array(n, k, pth, v) =>
          dec(n) -> Entry(dec(k), dec(pth), graft.store.AsOfPin.decode(dec(v)))
        case _ => throw new IllegalArgumentException(
          s"bad run-pin manifest line in $file: $l")
      }
    }.toMap)
  }
}
