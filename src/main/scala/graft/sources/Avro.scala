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
      val p = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
      val out = p.getFileSystem(conf).create(p, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](sch))
      w.setCodec(CodecFactory.deflateCodec(6))
      w.create(sch, out)
      try rows.foreach { r =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < st.length) {
          rec.put(st(i).name, sparkToAvro(r.get(i), st(i).dataType))
          i += 1
        }
        w.append(rec)
      } finally w.close()
      Iterator.single(pid)
    }.count(): Unit
  }

  /** Read Avro containers under `path` with an explicit target schema;
    * corruption lands in [[Jsonl.CorruptCol]] instead of failing the
    * job (the PERMISSIVE contract of the Jsonl seam). Fields are matched
    * BY NAME against the target schema; a container missing a field
    * yields nulls there (schema evolution's add-column case). */
  def read(s: SparkSession, path: String, schema: StructType): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files: Seq[String] =
      if (!fs.exists(root)) Seq.empty
      else fs.globStatus(new org.apache.hadoop.fs.Path(path, "*.avro"))
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
          // by-name matching against the CONTAINER's schema: a target
          // field the container lacks reads as null (rec.get(name)
          // throws on unknown fields, so probe presence up front)
          val present = (0 until n - 1)
            .map(i => rdr.getSchema.getField(schema(i).name) != null)
          def toRow(rec: GenericRecord): Row = {
            val a = new Array[Any](n)
            var i = 0
            while (i < n - 1) {
              if (present(i))
                a(i) = avroToSpark(rec.get(schema(i).name), schema(i).dataType)
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
