package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference engine's native output
  * format — `key: value` text lines (reference reducer.go:113-132,
  * written by [[graft.operators.TextJobs.sinkText]]). The one
  * extension rung the engine had not yet demonstrated: a full
  * connector with the three scan-side pushdowns a 100 TB source needs:
  *
  *   - column pruning ([[SupportsPushDownRequiredColumns]]): a
  *     key-only projection never materializes values;
  *   - filter pushdown ([[SupportsPushDownFilters]]): key/value
  *     comparisons evaluate inside the partition reader, so filtered
  *     rows never cross the source boundary — and Catalyst removes the
  *     post-scan Filter for everything this scan accepts;
  *   - limit pushdown ([[SupportsPushDownLimit]]): each partition
  *     reader stops after `limit` rows (Spark re-applies the global
  *     limit above, so partial pushdown stays correct).
  *
  * Parallelism is one [[InputPartition]] per file — the natural split
  * for line-oriented shuffle output, where the upstream writer already
  * sized the files. Registered as `graft-kv` via
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister.
  */
/** Java-serializable carrier for the session Hadoop configuration.
  * The driver plans with `sessionState.newHadoopConf()` (credentials,
  * custom fs schemes); executor-side readers/writers must open files
  * with the SAME conf or an S3A/custom-scheme path silently falls back
  * to defaults. Hadoop's Configuration is not Serializable, so it
  * round-trips through its own write/readFields wire format.
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Shared temp-dir commit protocol for the graft V2 sinks (kv text,
  * avro): tasks write to `_tmp_<queryId>/` and report (tmpFile,
  * finalName); job commit renames every reported file into place and
  * THEN deletes pre-existing data files when truncating — the old
  * list is captured before any rename, and final names carry the
  * queryId so new files never collide with old. Rename-first means a
  * mid-commit failure leaves a recoverable mixed directory instead of
  * destroying the previous data (delete-first loses it); a fully
  * atomic swap needs a manifest/table layer above a rename-based
  * filesystem and is explicitly out of scope here.
  */
object V2TempCommit {
  def commit(path: String, queryId: String, truncate: Boolean, moves: Seq[(String, String)], conf: Configuration): Unit = {
    val root = new Path(path)
    val fs   = root.getFileSystem(conf)
    val old: Array[Path] =
      if (truncate && fs.exists(root))
        fs.listStatus(root)
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
          .map(_.getPath)
      else Array.empty
    moves.foreach { case (tmpFile, finalName) =>
      // rename returns false instead of throwing on e.g. an existing
      // destination — a silent false would drop a partition's data
      require(fs.rename(new Path(tmpFile), new Path(path, finalName)), s"commit rename failed for $tmpFile")
    }
    old.foreach(f => fs.delete(f, false))
    fs.delete(new Path(root, s"_tmp_$queryId"), true)
  }

  def abort(path: String, queryId: String, conf: Configuration): Unit = {
    val root = new Path(path)
    root.getFileSystem(conf).delete(new Path(root, s"_tmp_$queryId"), true)
  }
}

class KvTextTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KvTextTable.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = new KvTextTable(properties.get("path"))
}

object KvTextTable {
  /** Fixed schema: schema inference over text is a full extra scan and
    * is banned at 100 TB (same stance as [[Sources.csv]]); a line with
    * no `": "` separator yields (line, NULL).
    */
  val schema: StructType = StructType(
    Seq(StructField("key", StringType, nullable = true), StructField("value", StringType, nullable = true))
  )
}

class KvTextTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null && path.nonEmpty, "graft-kv requires a path")
  override def name(): String                             = s"graft-kv($path)"
  override def schema(): StructType                       = KvTextTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = new KvScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder          = new KvWriteBuilder(path, info)
}

class KvScanBuilder(path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit {
  private var required: StructType  = KvTextTable.schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int            = -1

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition(KvFilterEval.supported)
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  // partial pushdown: each reader stops at `limit`, Spark re-limits
  // globally above (isPartiallyPushed defaults to true)
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  override def build(): Scan = new KvScan(path, required, pushed, limit)
}

class KvScan(path: String, required: StructType, filters: Array[Filter], limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch           = this
  override def description(): String =
    s"graft-kv $path ReadSchema: ${required.simpleString}, PushedFilters: [${filters.mkString(", ")}], PushedLimit: $limit"

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side listing with the session's Hadoop conf (credentials,
    // fs implementations); one partition per data file, sorted for
    // deterministic partition ids
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p    = new Path(path)
    val fs   = p.getFileSystem(conf)
    val stat = if (fs.getFileStatus(p).isDirectory) fs.listStatus(p) else Array(fs.getFileStatus(p))
    stat
      .filter(_.isFile)
      .map(_.getPath)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(_.toString)
      .sorted
      .map(f => KvInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // capture the session conf HERE (driver side) so executors open
    // files with the same credentials/fs settings planning used
    KvReaderFactory(
      required.fieldNames,
      filters,
      limit,
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf())
    )
}

case class KvInputPartition(file: String) extends InputPartition

case class KvReaderFactory(fields: Array[String], filters: Array[Filter], limit: Int, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvPartitionReader(partition.asInstanceOf[KvInputPartition].file, fields, filters, limit, conf.value)
}

class KvPartitionReader(file: String, fields: Array[String], filters: Array[Filter], limit: Int, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val path = new Path(file)
  private val in = new BufferedReader(
    new InputStreamReader(path.getFileSystem(conf).open(path), StandardCharsets.UTF_8)
  )
  private var current: InternalRow = _
  private var emitted              = 0L

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    var line = in.readLine()
    while (line != null) {
      val sep             = line.indexOf(": ")
      val key             = if (sep >= 0) line.substring(0, sep) else line
      val value: String   = if (sep >= 0) line.substring(sep + 2) else null
      if (filters.forall(KvFilterEval.eval(_, key, value))) {
        current = InternalRow.fromSeq(fields.toSeq.map {
          case "key"   => UTF8String.fromString(key)
          case "value" => if (value == null) null else UTF8String.fromString(value)
        })
        emitted += 1
        return true
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit     = in.close()
}

// ---------------------------------------------------------------- write

/** Write half of the connector: the [[V2TempCommit]] protocol over
  * reference-format text. Each task writes its partition to a
  * uniquely-named temp file under `_tmp_<queryId>/`; task commit
  * reports the temp path, job commit renames every reported file into
  * place and then clears the pre-existing data files on
  * truncate/overwrite (rename-first — a mid-commit failure leaves the
  * old data recoverable), job abort deletes the temp dir — so a
  * failed/speculative task leaves nothing behind. NULL values write
  * as a bare key line (which the scan reads back as NULL — lossless
  * round-trip); NULL keys are rejected (the reference format has no
  * encoding for them), as are keys containing the ': ' separator and
  * keys/values containing line terminators — each would silently
  * change row boundaries on read-back.
  */
class KvWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val s = info.schema()
    require(
      s.fields.map(f => (f.name, f.dataType)).toSeq ==
        Seq("key" -> StringType, "value" -> StringType),
      s"graft-kv writes (key string, value string), got ${s.simpleString}"
    )
    new KvWrite(path, info.queryId(), doTruncate)
  }
}

class KvWrite(path: String, queryId: String, truncate: Boolean) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String = s"graft-kv write $path (truncate=$truncate)"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    KvWriterFactory(path, queryId, new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    V2TempCommit.commit(
      path,
      queryId,
      truncate,
      messages.toSeq.map { case KvCommitMessage(t, f) => (t, f) },
      SparkSession.active.sessionState.newHadoopConf()
    )

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    V2TempCommit.abort(path, queryId, SparkSession.active.sessionState.newHadoopConf())
}

case class KvCommitMessage(tmpFile: String, finalName: String) extends WriterCommitMessage

case class KvWriterFactory(path: String, queryId: String, conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, queryId, partitionId, taskId, conf.value)
}

class KvDataWriter(path: String, queryId: String, partitionId: Int, taskId: Long, conf: Configuration)
    extends DataWriter[InternalRow] {
  // taskId in the temp name keeps speculative attempts from clobbering
  // each other; only the committed attempt's file is moved into place
  private val tmpFile = new Path(new Path(path, s"_tmp_$queryId"), f"part-$partitionId%05d-$taskId.txt")
  private val fs      = tmpFile.getFileSystem(conf)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmpFile, true), StandardCharsets.UTF_8)
  )

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(0), "graft-kv cannot encode a NULL key")
    val key = row.getUTF8String(0).toString
    // the separator inside a key would round-trip as a truncated key
    // with the rest folded into the value, and a line terminator in
    // either field would round-trip as extra bogus rows (the reader is
    // line-based) — silent corruption either way, so reject like NULL
    // keys (the reference format has no escaping)
    require(!key.contains(": "), s"graft-kv cannot encode a key containing ': ': '$key'")
    def noNewline(s: String, what: String): Unit =
      require(!s.contains('\n') && !s.contains('\r'), s"graft-kv cannot encode a $what containing a line terminator")
    noNewline(key, "key")
    if (row.isNullAt(1)) out.write(key)
    else {
      val value = row.getUTF8String(1).toString
      noNewline(value, "value")
      out.write(key); out.write(": "); out.write(value)
    }
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    // queryId in the FINAL name too: an append must never collide with
    // a previous write's part files (rename onto an existing path
    // fails), and two appends of the same frame must coexist
    KvCommitMessage(tmpFile.toString, f"part-$partitionId%05d-$queryId.txt")
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmpFile, false)
  }

  override def close(): Unit = ()
}

/** String-typed filter evaluation for the kv scan. `supported` is the
  * contract with Catalyst: anything it accepts is FULLY handled here
  * (so the post-scan Filter drops it), anything else is returned as
  * residual and evaluated above the scan as usual.
  */
object KvFilterEval {
  private def isCol(attr: String)   = attr == "key" || attr == "value"
  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _: String)            => isCol(a)
    case GreaterThan(a, _: String)        => isCol(a)
    case GreaterThanOrEqual(a, _: String) => isCol(a)
    case LessThan(a, _: String)           => isCol(a)
    case LessThanOrEqual(a, _: String)    => isCol(a)
    case StringStartsWith(a, _)           => isCol(a)
    case IsNotNull(a)                     => isCol(a)
    case IsNull(a)                        => isCol(a)
    case _                                => false
  }

  // range comparisons use UTF8String (UTF-8 byte order, == code-point
  // order) — Java String '<' compares UTF-16 code units, which
  // disagrees for supplementary-plane characters; since accepted
  // filters are REMOVED from the post-scan Filter, the pushed
  // evaluation must match Spark's exactly
  private def cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  def eval(f: Filter, key: String, value: String): Boolean = {
    def col(attr: String): String = if (attr == "key") key else value
    f match {
      case EqualTo(a, v: String)            => col(a) != null && col(a) == v
      case GreaterThan(a, v: String)        => col(a) != null && cmp(col(a), v) > 0
      case GreaterThanOrEqual(a, v: String) => col(a) != null && cmp(col(a), v) >= 0
      case LessThan(a, v: String)           => col(a) != null && cmp(col(a), v) < 0
      case LessThanOrEqual(a, v: String)    => col(a) != null && cmp(col(a), v) <= 0
      case StringStartsWith(a, v)           => col(a) != null && col(a).startsWith(v)
      case IsNotNull(a)                     => col(a) != null
      case IsNull(a)                        => col(a) == null
      case _                                => true
    }
  }
}
