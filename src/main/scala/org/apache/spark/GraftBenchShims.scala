package org.apache.spark

/** Minimal access shim for the `private[spark]` listener-bus drain:
  * bench instrumentation samples per-query task metrics from a
  * SparkListener, and without a drain between queries the async bus
  * would attribute a query's late events to the next query's window.
  */
object GraftBenchShims {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** This JVM's shuffle/spill local directories (`blockmgr-*`) — the
    * bench samples their byte size across the run to prove shuffle-file
    * residue stays bounded (the one residue channel unpersist/clearCache
    * cannot touch; files are reaped only when the ContextCleaner runs
    * after a GC).
    */
  def localDirBytes(sc: SparkContext): Long = {
    val dirs = SparkEnv.get.blockManager.diskBlockManager.localDirs
    def du(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
    dirs.map(du).sum
  }
}
