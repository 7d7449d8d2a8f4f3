package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft-avro")` / `df.write.format("graft-avro")`
  * — Avro container-file ingestion and landing as a DataSource V2,
  * built directly on the `avro` core library (the classpath carries no
  * spark-avro module, so this closes the reference's "Avro ingestion"
  * surface, GCS2Postgres `README.md:11`, with an in-repo connector).
  *
  * Read path (the scale story):
  *  - **Schema inference** opens ONE file header (Avro container files
  *    carry their writer schema) — no data scan.
  *  - **Splittable scans**: Avro blocks are delimited by 16-byte sync
  *    markers, so a single large file fans out across executors — each
  *    input partition is a byte range `[start, end)`; the reader seeks
  *    to the first sync past `start` (`DataFileReader.sync`) and stops
  *    at the first sync past `end` (`pastSync`), the same contract as
  *    Hadoop's AvroInputFormat, so every record is read exactly once.
  *    Range size comes from `option("splitSize", bytes)` (default
  *    128 MiB — at 100 TB this is ~800k tasks over any executor count).
  *  - **Column pruning** is real decoder work, not post-hoc projection:
  *    the required columns become an Avro *reader schema* (a field
  *    subset of the file's own writer schema), and Avro schema
  *    resolution skips the unwanted fields during decode.
  *
  * Write path mirrors [[graft.engine.PgCopySource]]: one deflate-coded
  * `.avro` container file per partition, task-id-suffixed names so
  * speculative attempts never collide, abort deletes the attempt's
  * file, `mode("overwrite")` truncates the directory driver-side first.
  * As with every catalog-less DSv2 TableProvider, writers must pick
  * `mode("append")` or `mode("overwrite")` explicitly — Spark maps the
  * default ErrorIfExists onto catalogs, which this path-based source
  * doesn't have.
  *
  * Types covered (both directions) are [[AvroConv]]'s scope:
  * primitives, `[null,T]` unions, records, arrays, string-keyed maps,
  * `date`/`timestamp-micros`/`timestamp-millis`/`decimal` logicals.
  */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-avro needs a path"))
    val files = AvroSource.listAvroFiles(path)
    if (files.isEmpty)
      throw new IllegalArgumentException(s"graft-avro: no .avro files under $path")
    AvroConv.toStructType(AvroSource.writerSchemaOf(files.head.getPath))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-avro needs a path"))
    val splitSize = Option(properties.get("splitSize"))
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    new AvroTable(path, schema, splitSize)
  }
}

private[sources] object AvroSource {
  private def hconf = new Configuration()

  def listAvroFiles(path: String): Seq[FileStatus] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(p)) return Seq.empty
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory) fs.listStatus(p).toSeq
      else Seq(st)
    files.filter(f => f.isFile && f.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.getName)
  }

  def writerSchemaOf(file: HPath): Schema = {
    val in = new FsInput(file, hconf)
    val r = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try r.getSchema finally { r.close() }
  }

  /** Reader-schema projection: the writer record with only `names`
    * fields, writer field schemas kept verbatim so resolution is a
    * pure skip, never a promotion surprise. Field order follows
    * `names` (= the Spark required schema order).
    */
  def projectSchema(writer: Schema, names: Seq[String]): Schema = {
    val fields = names.map { n =>
      val f = writer.getField(n)
      require(f != null, s"graft-avro: column $n not in writer schema $writer")
      new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    Schema.createRecord(writer.getName, writer.getDoc, writer.getNamespace,
      false, fields.asJava)
  }
}

private class AvroTable(path: String, tblSchema: StructType, splitSize: Long)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tblSchema, splitSize)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // fail at plan time if any column has no Avro mapping
    AvroConv.toAvroRecord(info.schema(), "graft_row")
    new AvroWriteBuilder(path, info.schema())
  }
}

// -----------------------------------------------------------------
// read
// -----------------------------------------------------------------

private class AvroScanBuilder(path: String, full: StructType, splitSize: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(path, required, splitSize)
}

private case class AvroRange(file: String, start: Long, end: Long)
    extends InputPartition

private class AvroScan(path: String, required: StructType, splitSize: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro $path ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] =
    AvroSource.listAvroFiles(path).flatMap { f =>
      val len = f.getLen
      val n = math.max(1L, (len + splitSize - 1) / splitSize)
      (0L until n).map { i =>
        AvroRange(f.getPath.toString, i * splitSize,
          math.min((i + 1) * splitSize, len))
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)
}

private class AvroReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroRangeReader(p.asInstanceOf[AvroRange], required)
}

/** Reads the records whose block's sync point falls in `[start, end)`.
  * Exactly-once across ranges: `sync(start)` positions at the first
  * block boundary at-or-after `start`; `pastSync(end)` goes true once
  * the reader has crossed `end`, at which point the NEXT range owns
  * the remaining blocks.
  */
private class AvroRangeReader(range: AvroRange, required: StructType)
    extends PartitionReader[InternalRow] {
  private val conf = new Configuration()
  private val datumReader = new GenericDatumReader[GenericRecord]()
  private val fileReader = new DataFileReader[GenericRecord](
    new FsInput(new HPath(range.file), conf), datumReader)
  // anything failing after the reader opened must not leak the stream
  private val projection =
    try {
      val p = AvroSource.projectSchema(fileReader.getSchema,
        required.fields.map(_.name).toSeq)
      datumReader.setExpected(p)
      fileReader.sync(range.start)
      p
    } catch {
      case t: Throwable => fileReader.close(); throw t
    }

  private val fieldConvs = required.fields.zipWithIndex.map { case (f, i) =>
    (i, AvroConv.reader(projection.getFields.get(i).schema(), f.dataType))
  }
  private var record: GenericRecord = _

  override def next(): Boolean = {
    if (fileReader.hasNext && !fileReader.pastSync(range.end)) {
      record = fileReader.next(record)
      true
    } else false
  }

  override def get(): InternalRow = {
    val out = new Array[Any](fieldConvs.length)
    var i = 0
    while (i < fieldConvs.length) {
      val (pos, c) = fieldConvs(i)
      val v = record.get(pos)
      out(i) = if (v == null) null else c(v)
      i += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = fileReader.close()
}

// -----------------------------------------------------------------
// write
// -----------------------------------------------------------------

private class AvroWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(path, schema, doTruncate)
  }
}

private case class AvroCommit(fileName: String) extends WriterCommitMessage

private class AvroBatchWrite(path: String, schema: StructType,
                             doTruncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new HPath(path)
    val fs = dir.getFileSystem(new Configuration())
    if (doTruncate && fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    new AvroWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new HPath(path).getFileSystem(new Configuration())
    messages.collect { case AvroCommit(f) =>
      fs.delete(new HPath(s"$path/$f"), false)
    }
  }
}

private class AvroWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(path, schema, partitionId, taskId)
}

/** Per-task container-file writer: streams records block-by-block
  * through the deflate codec (never buffers the partition). Task
  * retries are safe — names embed the task id and the commit
  * coordinator admits one attempt per partition.
  *
  * Crash safety: blocks stream to a staging name (`…avro.tmp`, which
  * [[AvroSource.listAvroFiles]] never lists) and the file only takes
  * its final `.avro` name via rename inside `commit()`. An executor
  * that dies mid-write leaves an orphaned `.tmp` — invisible to
  * readers, so a hard task failure can never surface duplicate rows
  * (the old direct-to-final scheme left valid-parseable partials
  * beside the retry's file).
  */
private class AvroDataWriter(path: String, schema: StructType,
                             partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val fileName = f"part-$partitionId%05d-$taskId.avro"
  private val tmpName = s"$fileName.tmp"
  private val avroSchema = AvroConv.toAvroRecord(schema, "graft_row")
  private val rowConv = AvroConv.writer(schema, avroSchema)
  private val fs = new HPath(path).getFileSystem(new Configuration())
  private val out = fs.create(new HPath(s"$path/$tmpName"), true)
  private val writer =
    new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
  writer.setCodec(CodecFactory.deflateCodec(6))
  writer.create(avroSchema, out)
  private var closed = false

  override def write(record: InternalRow): Unit =
    writer.append(rowConv(record).asInstanceOf[GenericRecord])

  override def commit(): WriterCommitMessage = {
    close()
    if (!fs.rename(new HPath(s"$path/$tmpName"), new HPath(s"$path/$fileName")))
      throw new java.io.IOException(
        s"graft-avro: commit rename failed for $path/$tmpName")
    AvroCommit(fileName)
  }

  override def abort(): Unit = {
    close()
    fs.delete(new HPath(s"$path/$tmpName"), false)
    // in case abort raced a completed commit()'s rename
    fs.delete(new HPath(s"$path/$fileName"), false)
  }

  override def close(): Unit =
    if (!closed) { closed = true; writer.close() }
}
