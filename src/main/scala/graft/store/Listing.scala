package graft.store

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}

/**
 * Shared bounded LISTING pool — one per JVM, capping total concurrent
 * directory listings against the namenode/object store no matter how
 * many walks run at once (the EraseAudit r12 rationale, promoted
 * store-wide): query planning ([[TierFileIndex]] lists one dir per
 * partition), pin capture ([[AsOfPin.capture]] lists one dir per
 * sequence), and the audits ([[EraseAudit.walkParquet]]) all fan
 * through it. At 100 TB a tier holds ~10⁵ (measurement, date)
 * partitions; a sequential per-partition listStatus walk is minutes of
 * serialized driver RPC before the first task launches — 16-wide, it
 * is seconds, and the shared cap keeps N concurrent walks from
 * multiplying into N×16 in-flight listings.
 *
 * Nesting rule: tasks submitted here must not THEMSELVES fan out
 * through the pool (fixed-width pools deadlock on nested blocking
 * waits) — [[inParallel]] enforces it by running inline when the
 * caller already IS a pool thread.
 */
private[graft] object Listing {

  private val PoolWidth = 16

  lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(PoolWidth,
      (r: Runnable) => {
        val t = new Thread(r, "graft-store-list"); t.setDaemon(true); t
      })

  private def onPoolThread: Boolean =
    Thread.currentThread().getName == "graft-store-list"

  /** Map `xs` through `f` on the shared pool (order-preserving;
   *  exceptions rethrow to the caller). Runs inline when already on a
   *  pool thread — see the nesting rule above. */
  def inParallel[A, B](xs: Seq[A])(f: A => B): Seq[B] =
    if (xs.lengthCompare(2) < 0 || onPoolThread) xs.map(f)
    else xs
      .map(x => pool.submit(new java.util.concurrent.Callable[B] {
        def call(): B = f(x)
      }))
      .map { fut =>
        try fut.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause }
      }

  /** `fs.listStatus` of many directories, concurrently. */
  def listMany(fs: FileSystem, dirs: Seq[HPath]): Seq[Seq[FileStatus]] =
    inParallel(dirs)(d => fs.listStatus(d).toSeq)
}
