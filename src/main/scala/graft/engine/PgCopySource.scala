package graft.engine

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `df.write.format("pgcopy")` — the Spark-native packaging of the
  * reference's bulk COPY sink (GCS2Postgres `src/db/db.go:175-180`,
  * `pgx.CopyFrom`) as a DataSourceV2 `TableProvider`, so the COPY TEXT
  * payload path needs no facade call: registered via
  * `DataSourceRegister` (META-INF/services), byte-identical payloads to
  * [[Sink]]'s `pgcopy` case because both delegate every field to the
  * ONE audited encoder ([[PgCopy]]).
  *
  * Layout contract (same as the facade): `path` is the payload
  * directory; each partition writes one `part-*.txt` COPY TEXT file,
  * and commit writes `<path>.copy.sql` next to the directory with one
  * `\COPY` command per file actually committed. `option("table", t)`
  * names the target table in the manifest (default: the path's last
  * segment).
  *
  * Scale shape: encoding stays a narrow per-row projection inside each
  * task (no shuffle, no driver materialization — unlike the reference,
  * which buffers all rows driver-side, db.go:151-155); sink parallelism
  * is the upstream partition count. Task retries are safe: file names
  * embed the task id, the commit coordinator admits one attempt per
  * partition, and losing attempts delete their file in `abort()`.
  *
  * Write-only: `mode("append")` adds part files, `mode("overwrite")`
  * truncates the directory first ([[TableCapability.TRUNCATE]]); reads
  * are rejected (the payload is for `psql \COPY`, not for Spark).
  */
class PgCopySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pgcopy"

  // write-only source: the schema is always supplied by the writing
  // DataFrame (externally), never inferred from files
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "pgcopy is a write-only sink (COPY TEXT payload files); it cannot be read back as a table")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("pgcopy sink needs option(\"path\", ...)"))
    val table = Option(properties.get("table")).getOrElse(
      path.stripSuffix("/").split('/').last)
    new PgCopyTable(path, table, schema)
  }
}

private class PgCopyTable(path: String, table: String, schema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"pgcopy:$table"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // the facade's type gate, enforced at plan time: struct/map have no
    // scalar Postgres analogue (reference converter is scalar-only,
    // utils.go:135-166)
    val bad = info.schema().fields.filterNot(f => PgCopy.supported(f.dataType))
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"pgcopy: unsupported field type(s) ${bad.map(f => s"${f.name}: ${f.dataType.sql}").mkString(", ")} — flatten upstream")
    new PgCopyWriteBuilder(path, table, info.schema())
  }
}

private class PgCopyWriteBuilder(path: String, table: String,
                                 schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new PgCopyBatchWrite(path, table, schema, doTruncate)
  }
}

private case class PgCopyCommit(fileName: String) extends WriterCommitMessage

private class PgCopyBatchWrite(path: String, table: String,
                               schema: StructType, doTruncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side, before any task launches: overwrite clears prior
    // payload files so a re-run never mixes generations
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (doTruncate && fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    new PgCopyWriterFactory(path, schema.fields.map(_.dataType))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // one \COPY line per COMMITTED part file (commit messages, not a
    // directory listing — a concurrent writer's files are not ours to
    // manifest); sorted for a deterministic, diffable manifest
    val parts = messages.collect { case PgCopyCommit(f) => f }.sorted
    val sql = parts.map(f =>
      PgCopy.copySql(table, schema.fields.map(_.name).toSeq, s"$table/$f"))
      .mkString("", "\n", "\n")
    val manifest = new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + ".copy.sql")
    val fs = manifest.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(manifest, true)
    try out.write(sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    messages.collect { case PgCopyCommit(f) =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$f"), false)
    }
  }
}

private class PgCopyWriterFactory(path: String, types: Array[DataType])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new PgCopyDataWriter(path, types, partitionId, taskId)
}

/** Per-task COPY TEXT writer: streams encoded lines straight to the
  * part file (never buffers the partition), UTF-8, `\n` row
  * terminator per the COPY spec.
  */
private class PgCopyDataWriter(path: String, types: Array[DataType],
                               partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val fileName = f"part-$partitionId%05d-$taskId.txt"
  private val fs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(new org.apache.hadoop.conf.Configuration())
  private val out = fs.create(
    new org.apache.hadoop.fs.Path(s"$path/$fileName"), true)
  private var closed = false

  override def write(record: InternalRow): Unit = {
    val values = new Array[Any](types.length)
    var i = 0
    while (i < types.length) {
      values(i) = if (record.isNullAt(i)) null else record.get(i, types(i))
      i += 1
    }
    out.write((PgCopy.encodeLine(values, types) + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  override def commit(): WriterCommitMessage = {
    close()
    PgCopyCommit(fileName)
  }

  override def abort(): Unit = {
    close()
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/$fileName"), false)
  }

  override def close(): Unit =
    if (!closed) { closed = true; out.close() }
}
