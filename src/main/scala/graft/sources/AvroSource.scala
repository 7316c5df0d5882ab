package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for Avro container files, `graft-avro`.
  *
  * The environment ships the core avro runtime (avro-1.12.1) but NOT
  * the spark-avro connector module, so this is a from-scratch V2
  * source over `DataFileReader`/`DataFileWriter` — closing the one
  * row-oriented interchange format the engine's source matrix lacked
  * (parquet/orc cover columnar, csv/json/kv-text cover text).
  *
  * Supported type mapping (both directions):
  *
  *   boolean/int/long/float/double/string/bytes ↔ the corresponding
  *   Catalyst primitive; `union(null, T)` ↔ nullable T; `array<T>` ↔
  *   ArrayType; `map<string, T>` ↔ MapType(String, T); nested
  *   `record` ↔ StructType — recursively; logical `date` ↔ DateType
  *   and `timestamp-micros` ↔ TimestampType (their avro physical
  *   encodings — int days / long micros — ARE the Catalyst internal
  *   encodings, so the mapping is lossless and conversion-free).
  *   Decimal logical types, `timestamp-millis`/local timestamps,
  *   enums, fixed, and multi-branch unions are intentionally out of
  *   scope and rejected with a clear error rather than silently
  *   mis-read.
  *
  * Layout/scale notes: one [[InputPartition]] per container file (the
  * natural split — blocks inside a file are sequential, parallelism
  * comes from the file count the upstream writer chose, same stance as
  * the kv-text source). Avro is row-oriented, so column pruning
  * ([[SupportsPushDownRequiredColumns]]) cannot skip reads, but it
  * narrows decode: only the required fields are CONVERTED to Catalyst
  * values, and the rows crossing the scan boundary carry just the
  * projected width. Schema comes from one container header (a few KB)
  * — never a data scan. Writes go through the shared
  * [[V2TempCommit]] rename-first protocol: in-progress task output is
  * invisible (temp dir), and an overwrite that fails mid-commit
  * leaves the previous data recoverable instead of destroyed.
  */
class AvroTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  // writes hand the query schema straight to getTable — without this,
  // DataFrameWriter.save calls inferSchema on a path that doesn't
  // exist yet
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null && path.nonEmpty, "graft-avro requires a path")
    val conf  = SparkSession.active.sessionState.newHadoopConf()
    val first = AvroScan.listFiles(path, conf).headOption.getOrElse(
      throw new IllegalArgumentException(s"graft-avro: no data files under $path")
    )
    AvroConv.toSqlType(AvroScan.headerSchema(first, conf)).asInstanceOf[StructType]
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = new AvroTable(properties.get("path"), schema)
}

class AvroTable(path: String, schema0: StructType) extends Table with SupportsRead with SupportsWrite {
  require(path != null && path.nonEmpty, "graft-avro requires a path")
  override def name(): String       = s"graft-avro($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, schema0)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new AvroWriteBuilder(path, info)
}

class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit {
  private var required: StructType                            = full
  private var pushed: Array[Filter]                           = Array.empty
  private var limit: Int                                      = -1
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition(AvroFilterEval.supported(_, full))
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  // partial pushdown: each reader stops at `limit`, Spark re-limits
  // globally above (same contract as the kv scan)
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def build(): Scan              = new AvroScan(path, required, full, pushed, limit)
}

object AvroScan {
  /** Driver-side listing, session Hadoop conf; RECURSIVE (a nested or
    * partitioned layout keeps data in subdirectories — a top-level-only
    * listing would silently read partial data, the same hazard
    * compactParquet documents for parquet), skipping files with ANY
    * hidden/underscore path component below the root (e.g. a leftover
    * `_temporary/` attempt dir), sorted for deterministic partition ids.
    */
  def listFiles(path: String, conf: Configuration): Seq[String] = {
    val p  = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.getFileStatus(p).isDirectory) return Seq(p.toString)
    FsListing.listDataFiles(fs, p).map(_.getPath.toString).sorted
  }

  /** One container file's header schema (a few KB read, never data). */
  def headerSchema(file: String, conf: Configuration): AvroSchema = {
    val reader =
      new DataFileReader[GenericRecord](new FsInput(new Path(file), conf), new GenericDatumReader[GenericRecord]())
    try reader.getSchema
    finally reader.close()
  }
}

class AvroScan(path: String, required: StructType, full: StructType, filters: Array[Filter], limit: Int = -1)
    extends Scan
    with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch           = this
  override def description(): String =
    s"graft-avro $path ReadSchema: ${required.simpleString}, PushedFilters: [${filters.mkString(", ")}], PushedLimit: $limit"

  // one recursive listing per scan, shared by partition planning and
  // the expected-schema resolution (a large directory should not be
  // walked twice in driver-side planning)
  private lazy val hadoopConf           = SparkSession.active.sessionState.newHadoopConf()
  private lazy val files: Seq[String]   = AvroScan.listFiles(path, hadoopConf)

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => AvroInputPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    AvroReaderFactory(
      required.json,
      full.json,
      // the expected (reader) Avro schema: the first file's header —
      // the same header inferSchema derived the Catalyst schema from.
      // Every file decodes through Avro SCHEMA RESOLUTION against it,
      // so heterogeneous-but-compatible writer schemas (reordered or
      // extra fields) read consistently, and incompatible files fail
      // loudly in the resolver. Null only when the dir is empty — and
      // then no partitions exist, so no reader ever parses it.
      files.headOption.map(f => AvroScan.headerSchema(f, hadoopConf).toString).orNull,
      filters,
      limit,
      new SerializableHadoopConf(hadoopConf)
    )
}

case class AvroInputPartition(file: String) extends InputPartition

case class AvroReaderFactory(
    requiredJson: String,
    fullJson: String,
    expectedAvroJson: String,
    filters: Array[Filter],
    limit: Int,
    conf: SerializableHadoopConf
) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(
      partition.asInstanceOf[AvroInputPartition].file,
      DataType.fromJson(requiredJson).asInstanceOf[StructType],
      DataType.fromJson(fullJson).asInstanceOf[StructType],
      expectedAvroJson,
      filters,
      limit,
      conf.value
    )
}

class AvroPartitionReader(
    file: String,
    required: StructType,
    full: StructType,
    expectedAvroJson: String,
    filters: Array[Filter],
    limit: Int,
    conf: Configuration
) extends PartitionReader[InternalRow] {
  // decode through Avro schema resolution against the table's expected
  // schema (not each file's own writer schema): heterogeneous writer
  // schemas — reordered or extra fields — resolve by field name, and
  // genuinely incompatible files fail loudly in the resolver instead
  // of mis-reading
  private val expectedSchema = new AvroSchema.Parser().parse(expectedAvroJson)
  private val datumReader    = new GenericDatumReader[GenericRecord](null, expectedSchema)
  private val reader         = new DataFileReader[GenericRecord](new FsInput(new Path(file), conf), datumReader)
  // pushed filters COMPILED once per reader: field positions resolved
  // against the expected schema, comparison constants pre-encoded —
  // the innermost scan loop must not pay a schema lookup and a
  // constant re-encode per row per filter
  private val compiledFilters: Array[GenericRecord => Boolean] = {
    val pos = expectedSchema.getFields.asScala.map(f => f.name -> f.pos).toMap
    filters.map(AvroFilterEval.compile(_, full, pos))
  }
  private var current: InternalRow = _
  private var emitted              = 0L

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (reader.hasNext) {
      val rec = reader.next()
      // pushed filters evaluate on the decoded record BEFORE Catalyst
      // conversion — rows that fail never materialize an InternalRow;
      // the post-scan Filter for these predicates is gone, so this
      // evaluation must match Spark's exactly (AvroFilterEval)
      if (compiledFilters.forall(_(rec))) {
        // convert only the REQUIRED fields — pruning narrows decode work
        // and row width even though a row format can't skip byte reads
        current = InternalRow.fromSeq(
          required.fields.toSeq.map(f => AvroConv.toCatalyst(rec.get(f.name), f.dataType))
        )
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit      = reader.close()
}

/** Typed filter evaluation for the avro scan. `supported` is the
  * contract with Catalyst: anything it accepts is FULLY handled in
  * [[AvroPartitionReader]] (so the post-scan Filter drops it); the
  * rest is residual and evaluated above the scan as usual. Scope is
  * deliberately narrow — top-level string/int/long/float/double (+
  * boolean equality) fields only: string ranges compare in UTF8String
  * byte order (== code-point order; Java String '<' compares UTF-16
  * code units, which disagrees for supplementary-plane characters —
  * the KvFilterEval lesson). Float/double compare under SPARK's SQL
  * total order, not raw IEEE: NaN is greater than every value and
  * equal to itself (java.lang.{Float,Double}.compare already does
  * this), and -0.0 equals 0.0 (compare does NOT — both sides are
  * normalized first; AvroSourceSpec pins the corner cases against
  * Spark's own evaluation).
  */
object AvroFilterEval {
  private def fieldType(schema: StructType, attr: String): Option[DataType] =
    schema.fields.find(_.name == attr).map(_.dataType)

  private def comparable(dt: DataType, v: Any): Boolean = (dt, v) match {
    case (StringType, _: String) => true
    case (IntegerType, _: Int)   => true
    case (LongType, _: Long)     => true
    case (DoubleType, _: Double) => true
    case (FloatType, _: Float)   => true
    case _                       => false
  }

  def supported(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, v) =>
      fieldType(schema, a).exists(dt => comparable(dt, v) || (dt == BooleanType && v.isInstanceOf[Boolean]))
    case GreaterThan(a, v)        => fieldType(schema, a).exists(comparable(_, v))
    case GreaterThanOrEqual(a, v) => fieldType(schema, a).exists(comparable(_, v))
    case LessThan(a, v)           => fieldType(schema, a).exists(comparable(_, v))
    case LessThanOrEqual(a, v)    => fieldType(schema, a).exists(comparable(_, v))
    case StringStartsWith(a, _)   => fieldType(schema, a).contains(StringType)
    case IsNotNull(a)             => fieldType(schema, a).isDefined
    case IsNull(a)                => fieldType(schema, a).isDefined
    case _                        => false
  }

  /** Compile one pushed filter into a per-record predicate: the field
    * POSITION is resolved once against the expected (reader) schema,
    * the Catalyst type once against the table schema, and comparison
    * constants are pre-encoded (the string side as UTF8String) — so
    * the per-row cost is one positional get plus one comparison.
    */
  def compile(f: Filter, schema: StructType, pos: Map[String, Int]): GenericRecord => Boolean = {
    def dt(a: String): DataType = schema.fields.find(_.name == a).get.dataType
    def p(a: String): Int       = pos(a)
    // record string values arrive as Utf8 (or String); range compares
    // must use UTF-8 byte order (== code-point order), so the record
    // side converts per row but the CONSTANT side is encoded here once
    def strCmp(a: String, v: Any)(test: Int => Boolean): GenericRecord => Boolean = {
      val i = p(a); val c = UTF8String.fromString(v.asInstanceOf[String])
      rec => { val x = rec.get(i); x != null && test(UTF8String.fromString(x.toString).compareTo(c)) }
    }
    def longCmp(a: String, v: Any)(test: Int => Boolean): GenericRecord => Boolean = {
      val i = p(a); val c = v.asInstanceOf[Long]
      rec => { val x = rec.get(i); x != null && test(java.lang.Long.compare(x.asInstanceOf[Long], c)) }
    }
    def intCmp(a: String, v: Any)(test: Int => Boolean): GenericRecord => Boolean = {
      val i = p(a); val c = v.asInstanceOf[Int]
      rec => { val x = rec.get(i); x != null && test(java.lang.Integer.compare(x.asInstanceOf[Int], c)) }
    }
    // Spark's SQL total order: Double.compare already ranks NaN above
    // everything and equal to itself (Spark agrees), but it also ranks
    // -0.0 below 0.0 where Spark says they're EQUAL — normalizing both
    // sides to +0.0 closes that one gap
    def normD(d: Double): Double = if (d == 0.0d) 0.0d else d
    def normF(f: Float): Float   = if (f == 0.0f) 0.0f else f
    def dblCmp(a: String, v: Any)(test: Int => Boolean): GenericRecord => Boolean = {
      val i = p(a); val c = normD(v.asInstanceOf[Double])
      rec => { val x = rec.get(i); x != null && test(java.lang.Double.compare(normD(x.asInstanceOf[Double]), c)) }
    }
    def fltCmp(a: String, v: Any)(test: Int => Boolean): GenericRecord => Boolean = {
      val i = p(a); val c = normF(v.asInstanceOf[Float])
      rec => { val x = rec.get(i); x != null && test(java.lang.Float.compare(normF(x.asInstanceOf[Float]), c)) }
    }
    def cmp(a: String, v: Any)(test: Int => Boolean): GenericRecord => Boolean = dt(a) match {
      case StringType  => strCmp(a, v)(test)
      case IntegerType => intCmp(a, v)(test)
      case LongType    => longCmp(a, v)(test)
      case DoubleType  => dblCmp(a, v)(test)
      case FloatType   => fltCmp(a, v)(test)
      case other       => throw new IllegalStateException(s"graft-avro: unexpected pushed comparison type $other")
    }
    f match {
      case EqualTo(a, v) =>
        dt(a) match {
          case BooleanType =>
            val i = p(a); val c = v.asInstanceOf[Boolean]
            rec => { val x = rec.get(i); x != null && x.asInstanceOf[Boolean] == c }
          case StringType =>
            // equality needs no byte-order: code-point equality is
            // byte equality, and String.equals skips the encode
            val i = p(a); val c = v.asInstanceOf[String]
            rec => { val x = rec.get(i); x != null && x.toString == c }
          case _ => cmp(a, v)(_ == 0)
        }
      case GreaterThan(a, v)        => cmp(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v)(_ >= 0)
      case LessThan(a, v)           => cmp(a, v)(_ < 0)
      case LessThanOrEqual(a, v)    => cmp(a, v)(_ <= 0)
      case StringStartsWith(a, v)   => val i = p(a); rec => { val x = rec.get(i); x != null && x.toString.startsWith(v) }
      case IsNotNull(a)             => val i = p(a); rec => rec.get(i) != null
      case IsNull(a)                => val i = p(a); rec => rec.get(i) == null
      case _                        => _ => true
    }
  }
}

// ---------------------------------------------------------------- write

class AvroWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var doTruncate            = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    AvroConv.toAvroSchema(info.schema()) // fail fast on unsupported types
    new AvroWrite(path, info.queryId(), info.schema(), doTruncate)
  }
}

class AvroWrite(path: String, queryId: String, schema: StructType, truncate: Boolean) extends Write with BatchWrite {
  override def toBatch: BatchWrite   = this
  override def description(): String = s"graft-avro write $path (truncate=$truncate)"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    AvroWriterFactory(path, queryId, schema.json, new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))

  // shared rename-first protocol (V2TempCommit): new files in, then
  // the captured old list out — a mid-commit failure leaves a mixed
  // directory, never a destroyed one
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    V2TempCommit.commit(
      path,
      queryId,
      truncate,
      messages.toSeq.map { case AvroCommitMessage(t, f) => (t, f) },
      SparkSession.active.sessionState.newHadoopConf()
    )

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    V2TempCommit.abort(path, queryId, SparkSession.active.sessionState.newHadoopConf())
}

case class AvroCommitMessage(tmpFile: String, finalName: String) extends WriterCommitMessage

case class AvroWriterFactory(path: String, queryId: String, schemaJson: String, conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(
      path,
      queryId,
      partitionId,
      taskId,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      conf.value
    )
}

class AvroDataWriter(path: String, queryId: String, partitionId: Int, taskId: Long, schema: StructType, conf: Configuration)
    extends DataWriter[InternalRow] {
  private val tmpFile    = new Path(new Path(path, s"_tmp_$queryId"), f"part-$partitionId%05d-$taskId.avro")
  private val fs         = tmpFile.getFileSystem(conf)
  private val avroSchema = AvroConv.toAvroSchema(schema)
  private val writer = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, fs.create(tmpFile, true))
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(
        f.name,
        AvroConv.toAvro(
          if (row.isNullAt(i)) null else row.get(i, f.dataType),
          f.dataType,
          avroSchema.getField(f.name).schema()
        )
      )
    }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    // queryId in the final name: appends never collide across writes
    AvroCommitMessage(tmpFile.toString, f"part-$partitionId%05d-$queryId.avro")
  }

  override def abort(): Unit = {
    writer.close()
    fs.delete(tmpFile, false)
  }

  override def close(): Unit = ()
}

/** Avro ↔ Catalyst type and value conversion for the supported subset. */
object AvroConv {
  import AvroSchema.Type._

  def toSqlType(s: AvroSchema): DataType = s.getType match {
    case BOOLEAN => BooleanType
    // temporal logical types whose avro physical encoding IS the
    // Catalyst internal encoding (days / micros since epoch) map
    // losslessly; `timestamp-millis` is REJECTED rather than read as a
    // bare long — a declared timestamp silently surfacing as numbers
    // is exactly the quiet misread this connector refuses elsewhere
    case INT if logicalName(s).contains("date") => DateType
    case INT                                    => IntegerType
    case LONG if logicalName(s).contains("timestamp-micros") => TimestampType
    case LONG if logicalName(s).exists(n => n.startsWith("timestamp") || n.startsWith("local-timestamp")) =>
      throw new IllegalArgumentException(
        s"graft-avro: only timestamp-micros is supported among avro timestamp logical types, got $s"
      )
    case LONG => LongType
    case FLOAT   => FloatType
    case DOUBLE  => DoubleType
    case STRING  => StringType
    case BYTES   => BinaryType
    case ARRAY   => ArrayType(toSqlType(s.getElementType), containsNull = isNullable(s.getElementType))
    case MAP     => MapType(StringType, toSqlType(s.getValueType), valueContainsNull = isNullable(s.getValueType))
    case RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name(), toSqlType(nonNull(f.schema())), nullable = isNullable(f.schema()))
      })
    case UNION =>
      val branches = s.getTypes.asScala.filterNot(_.getType == NULL)
      require(branches.size == 1, s"graft-avro: only union(null, T) unions are supported, got $s")
      toSqlType(branches.head)
    case other => throw new IllegalArgumentException(s"graft-avro: unsupported avro type $other in $s")
  }

  private def logicalName(s: AvroSchema): Option[String] =
    Option(s.getLogicalType).map(_.getName)

  private def isNullable(s: AvroSchema): Boolean =
    s.getType == UNION && s.getTypes.asScala.exists(_.getType == NULL)

  private def nonNull(s: AvroSchema): AvroSchema =
    if (s.getType == UNION) {
      val branches = s.getTypes.asScala.filterNot(_.getType == NULL)
      require(branches.size == 1, s"graft-avro: only union(null, T) unions are supported, got $s")
      branches.head
    } else s

  def toAvroSchema(st: StructType, name: String = "row"): AvroSchema = {
    def field(dt: DataType, nullable: Boolean, path: String): AvroSchema = {
      val base = dt match {
        case BooleanType     => AvroSchema.create(BOOLEAN)
        case IntegerType     => AvroSchema.create(INT)
        case ShortType       => AvroSchema.create(INT)
        case ByteType        => AvroSchema.create(INT)
        case LongType        => AvroSchema.create(LONG)
        case DateType        => org.apache.avro.LogicalTypes.date().addToSchema(AvroSchema.create(INT))
        case TimestampType =>
          org.apache.avro.LogicalTypes.timestampMicros().addToSchema(AvroSchema.create(LONG))
        case FloatType       => AvroSchema.create(FLOAT)
        case DoubleType      => AvroSchema.create(DOUBLE)
        case StringType      => AvroSchema.create(STRING)
        case BinaryType      => AvroSchema.create(BYTES)
        case ArrayType(e, n) => AvroSchema.createArray(field(e, n, s"${path}_item"))
        case MapType(StringType, v, n) => AvroSchema.createMap(field(v, n, s"${path}_value"))
        case s: StructType   => toAvroSchema(s, path)
        case other =>
          throw new IllegalArgumentException(
            s"graft-avro: unsupported Catalyst type ${other.simpleString} (decimal/timestamp_ntz logical types out of scope)"
          )
      }
      if (nullable) AvroSchema.createUnion(AvroSchema.create(NULL), base) else base
    }
    val b = SchemaBuilder.record(name).fields()
    val withFields = st.fields.foldLeft(b) { (acc, f) =>
      acc.name(f.name).`type`(field(f.dataType, f.nullable, s"${name}_${f.name}")).noDefault()
    }
    withFields.endRecord()
  }

  /** Avro runtime value → Catalyst value for `dt`. */
  def toCatalyst(v: Any, dt: DataType): Any =
    if (v == null) null
    else
      dt match {
        case StringType => UTF8String.fromString(v.toString) // Utf8 or String
        case BinaryType =>
          val bb    = v.asInstanceOf[java.nio.ByteBuffer]
          val bytes = new Array[Byte](bb.remaining())
          bb.duplicate().get(bytes)
          bytes
        // date/timestamp ride their physical encoding: avro int days /
        // long micros ARE the Catalyst internal values
        case IntegerType | LongType | FloatType | DoubleType | BooleanType | DateType | TimestampType => v
        case ShortType => v.asInstanceOf[Int].toShort
        case ByteType  => v.asInstanceOf[Int].toByte
        case ArrayType(e, _) =>
          val xs = v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          new GenericArrayData(xs.map(toCatalyst(_, e)))
        case MapType(StringType, vt, _) =>
          val m  = v.asInstanceOf[java.util.Map[Any, Any]].asScala.toSeq
          val ks = m.map { case (k, _) => UTF8String.fromString(k.toString): Any }
          val vs = m.map { case (_, x) => toCatalyst(x, vt) }
          new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
        case st: StructType =>
          val rec = v.asInstanceOf[GenericRecord]
          InternalRow.fromSeq(st.fields.toSeq.map(f => toCatalyst(rec.get(f.name), f.dataType)))
        case other => throw new IllegalArgumentException(s"graft-avro: unsupported read type $other")
      }

  /** Catalyst value → Avro runtime value for `dt`, built against the
    * DECLARED schema `avro` (possibly a nullable union): Avro's union
    * resolution matches records by name, so nested records must carry
    * the exact schema node the writer declared, not a structurally
    * equal rebuild.
    */
  def toAvro(v: Any, dt: DataType, avro: AvroSchema): Any =
    if (v == null) null
    else {
      val s = nonNull(avro)
      dt match {
        case StringType => v.toString // UTF8String → String
        case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
        case IntegerType | LongType | FloatType | DoubleType | BooleanType | DateType | TimestampType => v
        case ShortType => v.asInstanceOf[Short].toInt
        case ByteType  => v.asInstanceOf[Byte].toInt
        case ArrayType(e, _) =>
          val ad  = v.asInstanceOf[ArrayData]
          val out = new java.util.ArrayList[Any](ad.numElements())
          var i   = 0
          while (i < ad.numElements()) {
            out.add(if (ad.isNullAt(i)) null else toAvro(ad.get(i, e), e, s.getElementType))
            i += 1
          }
          out
        case MapType(StringType, vt, _) =>
          val md  = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
          val out = new java.util.HashMap[String, Any](md.numElements())
          val ks  = md.keyArray()
          val vs  = md.valueArray()
          var i   = 0
          while (i < md.numElements()) {
            out.put(
              ks.getUTF8String(i).toString,
              if (vs.isNullAt(i)) null else toAvro(vs.get(i, vt), vt, s.getValueType)
            )
            i += 1
          }
          out
        case st: StructType =>
          val row = v.asInstanceOf[InternalRow]
          val rec = new GenericData.Record(s)
          st.fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(
              f.name,
              toAvro(if (row.isNullAt(i)) null else row.get(i, f.dataType), f.dataType, s.getField(f.name).schema())
            )
          }
          rec
        case other => throw new IllegalArgumentException(s"graft-avro: unsupported write type $other")
      }
    }
}
