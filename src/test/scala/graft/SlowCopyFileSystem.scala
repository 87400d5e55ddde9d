package graft

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/**
 * Local FileSystem that emulates an OBJECT STORE's rename contract:
 * `rename` is a visible file-by-file copy followed by a recursive
 * delete (exactly how S3A implements it) with an injectable hook
 * BETWEEN the copy and the delete — the widest possible version of the
 * non-atomic-rename window the manifest-gated publish must survive.
 * Registered under the `slowcopy://` scheme via
 * `fs.slowcopy.impl` in the Hadoop configuration.
 */
class SlowCopyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "slowcopy"
  override def getUri: java.net.URI = java.net.URI.create("slowcopy:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    // copy first (every intermediate state visible to listings), hook,
    // then delete the source — no atomicity anywhere, like S3A
    FileUtil.copy(this, src, this, dst, false, getConf)
    SlowCopyFileSystem.betweenCopyAndDelete()
    delete(src, true)
  }
}

object SlowCopyFileSystem {
  /** Test seam invoked after the copy half of every rename, before the
   *  delete half — a reader here observes BOTH trees fully present. */
  @volatile var betweenCopyAndDelete: () => Unit = () => ()
}
