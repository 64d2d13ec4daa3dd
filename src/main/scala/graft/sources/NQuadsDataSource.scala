package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** N-Quads as a first-class DataSource V2 — the LAST engine extension
  * point this library exercises (expressions, SQL functions, optimizer
  * Rule, Strategy + SparkPlan with codegen, typed Aggregator, streaming
  * state, and now a connector): `spark.read.format("nquads").load(dir)`.
  *
  * Connector shape: one InputPartition per file (a directory of line
  * shards parallelizes across executors exactly like text), COLUMN
  * PRUNING pushed into the reader (SupportsPushDownRequiredColumns — a
  * `select("obj")` materializes one field per line, not four; the scan's
  * ReadSchema proves it), the reference's wasQuotedFrom URI repair
  * (fix_dataset_uris.py) applied line-by-line before parsing, and
  * malformed lines skipped instead of poisoning the read. Semantics are
  * pinned to the Column-transform parser (NQuads.parseLine) by the
  * hash-gated q_nquads_source round-trip.
  */
class NQuadsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nquads"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NQuadsTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null,
      "nquads: exactly one path is required — load(dir) / save(dir); multi-path load is not supported")
    new NQuadsTable(path)
  }
}

object NQuadsTable {
  val Schema: StructType = StructType(
    Seq("subject", "predicate", "obj", "graph")
      .map(StructField(_, StringType, nullable = true)))
}

class NQuadsTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"nquads($path)"
  override def schema(): StructType = NQuadsTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NQuadsScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new NQuadsWriteBuilder(path, info.schema())
}

class NQuadsScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  private var required: StructType = NQuadsTable.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accept equality and prefix filters on any quad field — the reader
    * pre-filters on the parsed groups BEFORE materializing the pruned row.
    * All filters are also returned as residual (Spark re-applies them),
    * the conservative connector contract: the pushdown is an IO/alloc
    * saver, never a correctness dependency. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo(a, _: String) => NQuadsTable.Schema.fieldNames.contains(a)
      case StringStartsWith(a, _) => NQuadsTable.Schema.fieldNames.contains(a)
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new NQuadsScan(path, required, pushed)
}

/** Hadoop Configuration with Java serialization — the connector ships
  * the driver's conf to executor-side readers/writers exactly like the
  * built-in file sources do, so the connector works wherever a Hadoop
  * FileSystem does (HDFS, S3A, local), not only when driver and
  * executors share a local disk (the r7 java.io.File defect). */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

object SerializableHadoopConf {
  /** The active session's Hadoop conf (driver side). */
  def fromSession(): SerializableHadoopConf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
}

class NQuadsScan(path: String, required: StructType,
    val pushedFilters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"nquads($path) PushedFilters: ${pushedFilters.mkString("[", ", ", "]")}"
  private lazy val conf = SerializableHadoopConf.fromSession()
  override def planInputPartitions(): Array[InputPartition] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf.value)
    if (!fs.exists(root))
      throw new IllegalArgumentException(s"nquads: path does not exist: $path")
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root)
          .filter(st => st.isFile &&
            !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      else Array(fs.getFileStatus(root))
    files.sortBy(_.getPath.getName)
      .map(st => NQuadsPartition(st.getPath.toString): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new NQuadsReaderFactory(required.fieldNames, pushedFilters, conf)
}

case class NQuadsPartition(file: String) extends InputPartition

class NQuadsReaderFactory(fields: Array[String], filters: Array[Filter],
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NQuadsReader(partition.asInstanceOf[NQuadsPartition].file, fields, filters, conf)
}

/** Per-file line reader: URI repair → regex parse → pushed filters
  * evaluated on the parsed groups → only the PRUNED fields materialize as
  * UTF8Strings; malformed lines are skipped. */
class NQuadsReader(file: String, fields: Array[String], filters: Array[Filter],
    conf: SerializableHadoopConf) extends PartitionReader[InternalRow] {
  // the SAME grammar as the Column-transform twin (NQuads.LineRegex):
  // IRI or literal object, optional datatype/lang suffix, optional graph
  private val LinePattern = java.util.regex.Pattern.compile(NQuads.LineRegex)
  private val br = {
    val p = new org.apache.hadoop.fs.Path(file)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getFileSystem(conf.value).open(p),
        java.nio.charset.StandardCharsets.UTF_8))
  }
  // per-field extraction mirrors the Column parser: obj is the IRI group
  // or the literal group; an absent graph is "" (never null), matching
  // regexp_extract's unmatched-optional-group value
  private def extractorOf(name: String): java.util.regex.Matcher => String =
    name match {
      case "subject" => _.group(1)
      case "predicate" => _.group(2)
      case "obj" => m => { val i = m.group(3); if (i != null) i else m.group(4) }
      case "graph" => m => { val g = m.group(5); if (g != null) g else "" }
      case other => sys.error(s"nquads: unknown column $other")
    }
  // extractor per required field, in the pruned schema's order
  private val extractors = fields.map(extractorOf)
  private val checks: Array[java.util.regex.Matcher => Boolean] = filters.map {
    case EqualTo(a, v: String) => val e = extractorOf(a); m => e(m) == v
    case StringStartsWith(a, v) => val e = extractorOf(a); m => e(m).startsWith(v)
    case f => sys.error(s"nquads: unpushable filter $f")
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = br.readLine()
    while (line != null) {
      val fixed = line.replaceAll("wasQuotedFrom> <(?!http://)", "wasQuotedFrom> <http://")
      val m = LinePattern.matcher(fixed)
      if (m.matches() && checks.forall(_(m))) {
        current = new GenericInternalRow(
          extractors.map(e => UTF8String.fromString(e(m)): Any))
        return true
      }
      line = br.readLine() // malformed or filtered line: skip
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = br.close()
}

// ---------------------------------------------------------------- write

/** Write path: each task streams its partition into one
  * `part-<partition>-<task>.nq` shard, committing via rename from a
  * dot-hidden temp name (which the reader's hidden-file filter ignores
  * until then); task abort deletes the temp. OVERWRITE is truncate-on-
  * COMMIT: pre-existing shards are recorded at job start and deleted only
  * after every task has committed, and JOB abort deletes the shards that
  * committed tasks had already published — so a failed overwrite leaves
  * the old data intact instead of destroying it up front. (A concurrent
  * reader can briefly see old+new shards between task commits and the
  * job commit — the line-format trade-off, documented not hidden.) */
class NQuadsWriteBuilder(path: String, schema: StructType)
  extends WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
  require(schema.fieldNames.toSeq == NQuadsTable.Schema.fieldNames.toSeq,
    s"nquads write expects columns ${NQuadsTable.Schema.fieldNames.mkString(", ")}, " +
      s"got ${schema.fieldNames.mkString(", ")}")
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new NQuadsBatchWrite(path, doTruncate)
  }
}

class NQuadsBatchWrite(path: String, truncate: Boolean) extends BatchWrite {
  // driver-side: capture the session conf once; writers get it via the
  // (serialized) factory
  private val conf = SerializableHadoopConf.fromSession()
  private var preExisting: Array[org.apache.hadoop.fs.Path] = Array.empty
  private def fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf.value)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new org.apache.hadoop.fs.Path(path)
    fs.mkdirs(dir)
    if (truncate)
      preExisting = fs.listStatus(dir)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".nq")).map(_.getPath)
    new NQuadsWriterFactory(path, conf)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // truncate-on-commit: old shards go only once every task succeeded;
    // a same-name collision with a freshly committed shard is kept
    val fresh = messages.collect { case NQuadsCommit(f) => f }.toSet
    preExisting.filterNot(p => fresh.contains(p.toString))
      .foreach(fs.delete(_, false))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // committed tasks already published their shards — retract them so the
    // directory still holds exactly the pre-job data
    messages.collect { case NQuadsCommit(f) => new org.apache.hadoop.fs.Path(f) }
      .foreach(fs.delete(_, false))
}

class NQuadsWriterFactory(path: String, conf: SerializableHadoopConf)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new NQuadsWriter(path, partitionId, taskId, conf)
}

case class NQuadsCommit(file: String) extends WriterCommitMessage

class NQuadsWriter(path: String, partitionId: Int, taskId: Long,
    conf: SerializableHadoopConf) extends DataWriter[InternalRow] {
  private val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf.value)
  // fs-qualified so commit-message paths compare equal to the driver's
  // listStatus paths in NQuadsBatchWrite.commit
  private val finalFile = fs.makeQualified(
    new org.apache.hadoop.fs.Path(path, f"part-$partitionId%05d-$taskId.nq"))
  private val tmpFile = new org.apache.hadoop.fs.Path(path, s".${finalFile.getName}.inprogress")
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmpFile, true),
      java.nio.charset.StandardCharsets.UTF_8))
  override def write(row: InternalRow): Unit = {
    // fail LOUDLY on rows the line grammar cannot carry: a null field
    // would serialize as the literal "null", and an embedded newline would
    // split the quad so the reader silently drops both halves
    var i = 0
    while (i < 4) {
      if (row.isNullAt(i))
        throw new IllegalArgumentException(
          s"nquads: null in column ${NQuadsTable.Schema.fieldNames(i)} — the line format has no null representation")
      val v = row.getUTF8String(i).toString
      if (v.indexOf('\n') >= 0 || v.indexOf('\r') >= 0)
        throw new IllegalArgumentException(
          s"nquads: newline in column ${NQuadsTable.Schema.fieldNames(i)} — escape upstream before writing")
      // IRI slots: an embedded angle bracket terminates the reader's group
      // early, so the line reparses wrong or drops silently
      if (i != 2 && (v.indexOf('<') >= 0 || v.indexOf('>') >= 0))
        throw new IllegalArgumentException(
          s"nquads: angle bracket in IRI column ${NQuadsTable.Schema.fieldNames(i)} — not representable")
      i += 1
    }
    out.write(s"<${row.getUTF8String(0)}> <${row.getUTF8String(1)}> " +
      s""""${row.getUTF8String(2)}" <${row.getUTF8String(3)}> .""")
    out.newLine()
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    if (!fs.rename(tmpFile, finalFile))
      sys.error(s"nquads: commit rename failed for $finalFile")
    NQuadsCommit(finalFile.toString)
  }
  override def abort(): Unit = { out.close(); fs.delete(tmpFile, false); () }
  override def close(): Unit = ()
}
