package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro source/sink — the row-major interchange format of Kafka
  * pipelines (schema-registry ecosystems hand data over as Avro object
  * containers as often as warehouses hand over parquet/ORC). The Spark
  * distribution here ships no spark-avro connector, so this seam builds
  * on the Avro container API directly (the one legitimate use of
  * per-partition imperative IO: there is no declarative operator to
  * compose).
  *
  * Scale notes:
  *  - writes are SHARDED to an explicit target count (the Jsonl/Orc
  *    convention — shards sized for the downstream consumer) and
  *    deflate-compressed; each task streams its partition through one
  *    DataFileWriter, so writer memory is O(block), not O(partition);
  *  - reads stream each container through DataFileReader via the
  *    Hadoop-FS seekable input — records never buffer whole-file in
  *    memory — with one task per shard (the same parallelism the writer
  *    chose; a DataSource V2 relation with block-level splits is the
  *    step up documented at NQuadsDataSource, which demonstrates that
  *    API in this repo);
  *  - reads take an EXPLICIT schema (the Jsonl discipline: inference is
  *    an extra pass and nondeterministic under drift) and capture
  *    corruption into [[Jsonl.CorruptCol]] instead of failing the job:
  *    an unreadable container yields ONE corrupt row; a mid-stream block
  *    corruption yields the rows decoded so far plus one corrupt row
  *    (Avro block CRCs make silent misdecodes a non-concern);
  *  - Avro is row-major: no column pruning or predicate pushdown exists
  *    to exploit, so the right 100 TB posture is "land as Avro, convert
  *    to parquet/ORC at the ingest edge" — this seam is the ingest edge.
  *
  * Type coverage: the driver tables' lattice — long/int/double/float/
  * string/boolean/binary plus arrays of those, nullable via
  * union(null, T). Timestamps travel as micros-since-epoch longs
  * (timestamp-micros is Avro's own convention; the caller casts). */
/** Avro→Spark schema-resolution rules, serializable so executor-side
  * closures can consult them without capturing the [[Avro]] module. */
private[sources] object AvroResolve extends Serializable {
  private def unwrap(sch: Schema): Schema =
    if (sch.getType == Schema.Type.UNION)
      sch.getTypes.asScala.find(_.getType != Schema.Type.NULL)
        .getOrElse(sch)
    else sch

  /** Does a container-written `w` decode lawfully under target `t`
    * (identity or an Avro-lawful widening promotion)? */
  def lawful(w: Schema, t: DataType): Boolean = {
    import Schema.Type._
    (unwrap(w).getType, t) match {
      case (INT, IntegerType | LongType | FloatType | DoubleType) => true
      case (LONG, LongType | DoubleType) => true
      case (FLOAT, FloatType | DoubleType) => true
      case (DOUBLE, DoubleType) => true
      case (STRING, StringType) => true
      case (BYTES, BinaryType) => true
      case (BOOLEAN, BooleanType) => true
      case (ARRAY, ArrayType(e, _)) => lawful(unwrap(w).getElementType, e)
      case _ => false
    }
  }
}

object Avro {

  /** Spark StructType → Avro record schema (nullable fields become
    * union["null", T] with null default). */
  def toAvroSchema(st: StructType, name: String): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case StringType => Schema.create(Schema.Type.STRING)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case ArrayType(e, containsNull) =>
        Schema.createArray(if (containsNull) nullable(prim(e)) else prim(e))
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type for Avro interchange: $other")
    }
    def nullable(s: Schema): Schema =
      Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))
    val fields = st.fields.map { f =>
      val base = prim(f.dataType)
      val sch = if (f.nullable) nullable(base) else base
      val dflt = if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null
      new Schema.Field(f.name, sch, null, dflt)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def sparkToAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(e, _)) =>
      seq.map(x => sparkToAvro(x, e)).asJava
    case (x, _) => x
  }

  private def avroToSpark(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (l: java.util.List[_], ArrayType(e, _)) =>
      l.asScala.map(x => avroToSpark(x, e)).toSeq
    // Avro-lawful numeric promotions (schema evolution: a container
    // written with the narrower type reads under the wider target)
    case (i: java.lang.Integer, LongType) => i.longValue()
    case (i: java.lang.Integer, DoubleType) => i.doubleValue()
    case (i: java.lang.Integer, FloatType) => i.floatValue()
    case (l: java.lang.Long, DoubleType) => l.doubleValue()
    case (f: java.lang.Float, DoubleType) => f.doubleValue()
    case (i: java.lang.Integer, IntegerType) => i
    case (l: java.lang.Long, LongType) => l
    case (f: java.lang.Float, FloatType) => f
    case (d: java.lang.Double, DoubleType) => d
    case (b: java.lang.Boolean, BooleanType) => b
    // anything else that reaches a typed target with the wrong runtime
    // class is a writer/target mismatch with NO lawful promotion
    // (e.g. long → int narrows): surface it as corruption here, at
    // decode time, instead of a ClassCastException at action time
    case (x, LongType | IntegerType | DoubleType | FloatType |
             BooleanType | StringType | BinaryType) =>
      throw new IllegalArgumentException(
        s"writer value of ${x.getClass.getName} has no lawful promotion to $dt")
    case (x, _) => x
  }

  /** Write `df` as `shards` deflate Avro object-container part-files
    * under `path` (overwrite semantics). */
  def write(df: DataFrame, path: String, shards: Int): Unit = {
    val st = df.schema
    val avroJson = toAvroSchema(st, "graft_record").toString
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true); fs.mkdirs(root)
    df.repartition(shards).rdd.mapPartitionsWithIndex { (pid, rows) =>
      val sch = new Schema.Parser().parse(avroJson)
      val conf = new org.apache.hadoop.conf.Configuration()
      // task-attempt commit protocol: stream the partition into a
      // dot-prefixed attempt-unique temp file (invisible to read()'s
      // *.avro glob), then atomically rename into the final path on
      // success — a speculative/retried attempt can never interleave
      // bytes into the final shard, and a task dying mid-write leaves
      // only temp litter, never a truncated *.avro
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val finalP = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
      val tmpP = new org.apache.hadoop.fs.Path(
        path, f".part-$pid%05d.avro.attempt-$attempt.tmp")
      val pfs = finalP.getFileSystem(conf)
      val out = pfs.create(tmpP, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](sch))
      w.setCodec(CodecFactory.deflateCodec(6))
      w.create(sch, out)
      var committed = false
      try {
        rows.foreach { r =>
          val rec = new GenericData.Record(sch)
          var i = 0
          while (i < st.length) {
            rec.put(st(i).name, sparkToAvro(r.get(i), st(i).dataType))
            i += 1
          }
          w.append(rec)
        }
        w.close()
        pfs.delete(finalP, false) // losing attempt's output, if any
        if (!pfs.rename(tmpP, finalP))
          throw new java.io.IOException(s"commit rename failed: $tmpP -> $finalP")
        committed = true
      } finally {
        if (!committed) {
          try w.close() catch { case _: Exception => () }
          try pfs.delete(tmpP, false) catch { case _: Exception => () }
        }
      }
      Iterator.single(pid)
    }.count(): Unit
  }

  /** Read Avro containers under `path` with an explicit target schema;
    * corruption lands in [[Jsonl.CorruptCol]] instead of failing the
    * job (the PERMISSIVE contract of the Jsonl seam). Fields are matched
    * BY NAME against the target schema; a container missing a field
    * yields nulls there (schema evolution's add-column case).
    *
    * Schema evolution beyond add-column:
    *  - `aliases` maps a TARGET field name to the container field names
    *    it was previously written under (Avro reader-schema aliases:
    *    rename-on-read). The target name wins when both are present.
    *  - numeric promotion on read: a container written int/long/float
    *    decodes under a wider target (int→long/float/double,
    *    long→double, float→double) per Avro's resolution rules; a
    *    mismatch with no lawful promotion (e.g. long→int) is detected
    *    UP FRONT from the container's schema and routes the whole file
    *    to one corrupt row — no partial decode, no ClassCastException
    *    at action time (the writer/target disagreement is a property of
    *    the file, so per-record rows would just repeat it per record).
    *
    * A nonexistent root fails fast (a typo'd path must not read as an
    * empty dataset); an existing-but-empty directory reads as empty. */
  def read(s: SparkSession, path: String, schema: StructType,
           aliases: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root))
      throw new IllegalArgumentException(s"Avro read path does not exist: $path")
    val files: Seq[String] =
      fs.globStatus(new org.apache.hadoop.fs.Path(path, "*.avro"))
        .map(_.getPath.toString).toSeq.sorted
    val out = schema.add(Jsonl.CorruptCol, StringType)
    val n = out.length
    val rdd = s.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        def corrupt(e: Throwable): Row = {
          val a = new Array[Any](n)
          a(n - 1) = s"$f: ${e.getClass.getSimpleName}: ${e.getMessage}"
          Row.fromSeq(a.toSeq)
        }
        try {
          val in = new org.apache.avro.mapred.FsInput(
            new org.apache.hadoop.fs.Path(f),
            new org.apache.hadoop.conf.Configuration())
          val rdr = DataFileReader.openReader(in,
            new GenericDatumReader[GenericRecord]())
          // by-name matching against the CONTAINER's schema: resolve
          // each target field to the container name it travels under —
          // its own name first, then its reader-schema aliases; a field
          // the container lacks entirely reads as null (rec.get(name)
          // throws on unknown fields, so probe presence up front)
          val sourceName: IndexedSeq[String] = (0 until n - 1).map { i =>
            val tgt = schema(i).name
            if (rdr.getSchema.getField(tgt) != null) tgt
            else aliases.getOrElse(tgt, Seq.empty)
              .find(old => rdr.getSchema.getField(old) != null)
              .orNull
          }
          // up-front resolution check: every present field's CONTAINER
          // type must map lawfully onto its target type, else the whole
          // file is one corrupt row (a schema disagreement is a property
          // of the file, not of any record)
          val clash = (0 until n - 1).find(i => sourceName(i) != null &&
            !AvroResolve.lawful(
              rdr.getSchema.getField(sourceName(i)).schema(),
              schema(i).dataType))
          clash.foreach { i =>
            try rdr.close() catch { case _: Exception => () }
            throw new IllegalArgumentException(
              s"field ${sourceName(i)} has no lawful promotion to " +
                s"${schema(i).dataType}")
          }
          def toRow(rec: GenericRecord): Row = {
            val a = new Array[Any](n)
            var i = 0
            while (i < n - 1) {
              if (sourceName(i) != null)
                a(i) = avroToSpark(rec.get(sourceName(i)), schema(i).dataType)
              i += 1
            }
            Row.fromSeq(a.toSeq)
          }
          var failed = false
          Iterator.continually {
            if (failed) None
            else try {
              if (rdr.hasNext) Some(toRow(rdr.next()))
              else { rdr.close(); None }
            } catch { case e: Exception =>
              failed = true
              try rdr.close() catch { case _: Exception => () }
              Some(corrupt(e))
            }
          }.takeWhile(_.isDefined).map(_.get)
        } catch { case e: Exception => Iterator.single(corrupt(e)) }
      }
    s.createDataFrame(rdd, out)
  }
}
