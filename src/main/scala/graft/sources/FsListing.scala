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

  def listDataFiles(fs: FileSystem, dir: Path): Seq[FileStatus] = {
    val root = fs.makeQualified(dir).toUri.getPath
    def hidden(f: Path): Boolean = {
      var cur = f
      while (cur != null && cur.toUri.getPath != root) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val it  = fs.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !hidden(st.getPath)) buf += st
    }
    buf.toSeq
  }
}
