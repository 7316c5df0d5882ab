package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Recursive data-file listing shared by every consumer that must see
  * exactly what `spark.read` sees (the avro scan, parquet compaction
  * sizing): nested/partitioned layouts keep data in subdirectories, so
  * a top-level-only listing silently reads or sizes partial data, and
  * a file is hidden if ANY path component below the root is hidden
  * (e.g. everything under a leftover `_temporary/` attempt dir — a
  * leaf-name-only filter would count those bytes).
  */
object FsListing {

  /** Manual recursion rather than `fs.listFiles(dir, true)`: hidden
    * directories are PRUNED before descending (the recursive iterator
    * walks into `_temporary/` and materializes located statuses for
    * in-flight task attempts — which vanish mid-listing when a racing
    * writer commits, blowing up the whole walk), and a directory that
    * disappears between its parent's listing and its own is skipped —
    * a lister racing live writers (vacuum, compaction sizing) must see
    * a consistent view of the COMMITTED files, not throw on the
    * uncommitted churn.
    */
  def listDataFiles(fs: FileSystem, dir: Path): Seq[FileStatus] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    def walk(d: Path): Unit = {
      val entries =
        try fs.listStatus(d)
        catch { case _: java.io.FileNotFoundException => Array.empty[FileStatus] }
      entries.foreach { st =>
        val n = st.getPath.getName
        if (!(n.startsWith("_") || n.startsWith("."))) {
          if (st.isDirectory) walk(st.getPath)
          else if (st.isFile) buf += st
        }
      }
    }
    walk(dir)
    buf.toSeq
  }
}
