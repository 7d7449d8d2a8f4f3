package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** In-repo Apache Iceberg v1 TABLE-FORMAT reader (+ a closed-form
  * composer for fixtures) — the last reference source format
  * (GCS2Postgres `README.md:11` "Iceberg") previously served by a
  * parquet-backed double. Everything here is the PUBLIC Iceberg table
  * spec (https://iceberg.apache.org/spec/): JSON table metadata, Avro
  * manifest lists and manifests, parquet data files. No connector jar
  * — the repo's own Avro machinery ([[AvroConv]]'s core-library
  * sibling usage) reads the metadata tree.
  *
  * Read path (the scale story):
  *  - `metadata/version-hint.text` (or max `vN.metadata.json`) names
  *    the current metadata — ONE tiny file read;
  *  - the metadata JSON names the current snapshot and its MANIFEST
  *    LIST — one small Avro file whose rows carry per-manifest
  *    partition-bound summaries (`field_summary.lower_bound/
  *    upper_bound`, the spec's single-value binary serialization);
  *  - a partition predicate prunes MANIFESTS against those bounds
  *    before any manifest is opened, then prunes FILES against each
  *    entry's own partition value — at 100 TB a point query reads the
  *    manifests of one partition, not the table's (this is the same
  *    metadata-pruning story as the persisted IVF index's dynamic
  *    partition pruning, done at the table-format layer);
  *  - only the surviving parquet data files enter the Spark scan
  *    (`spark.read.parquet(files…)` — self-describing, column-pruned,
  *    filter-pushed like any parquet scan).
  *
  * Manifest reading happens at PLANNING time on the driver —
  * deliberately: that is where Iceberg itself reads manifests, they
  * are metadata (KBs–MBs each), and after manifest-list pruning the
  * driver touches only the survivors. The DATA path is fully
  * distributed.
  *
  * Scope (spec subset, honest about it): format-version 1, N IDENTITY
  * partition fields of type string or long (conjunctive pruning),
  * parquet data files, append snapshots, no delete files. Unknown/
  * extra fields in the JSON are ignored; v2 tables and non-identity
  * transforms fail loudly rather than half-read.
  */
object Iceberg {

  private def om = new ObjectMapper()
  private def hconf = new Configuration()

  // ---------------------------------------------------------------
  // spec Avro schemas (v1 subset; field-id props as the spec requires)
  // ---------------------------------------------------------------

  /** manifest_entry with identity partition fields of the given
    * (name, type) pairs — types "string" | "long".
    */
  private[sources] def manifestEntrySchema(
      partFields: Seq[(String, String)]): Schema = {
    val pf = partFields.zipWithIndex.map { case ((n, t), i) =>
      s"""{"name":"$n","type":["null","$t"],
         |           "default":null,"field-id":${1000 + i}}""".stripMargin
    }.mkString(",\n          ")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |  {"name":"status","type":"int","field-id":0},
         |  {"name":"snapshot_id","type":["null","long"],"default":null,
         |   "field-id":1},
         |  {"name":"data_file","field-id":2,"type":{
         |    "type":"record","name":"r2","fields":[
         |      {"name":"file_path","type":"string","field-id":100},
         |      {"name":"file_format","type":"string","field-id":101},
         |      {"name":"partition","field-id":102,"type":{
         |        "type":"record","name":"r102","fields":[
         |          $pf]}},
         |      {"name":"record_count","type":"long","field-id":103},
         |      {"name":"file_size_in_bytes","type":"long","field-id":104},
         |      {"name":"lower_bounds","field-id":125,"default":null,
         |       "type":["null",{"type":"array","items":{
         |         "type":"record","name":"k126_v127","fields":[
         |           {"name":"key","type":"int","field-id":126},
         |           {"name":"value","type":"bytes","field-id":127}]}}]},
         |      {"name":"upper_bounds","field-id":128,"default":null,
         |       "type":["null",{"type":"array","items":{
         |         "type":"record","name":"k129_v130","fields":[
         |           {"name":"key","type":"int","field-id":129},
         |           {"name":"value","type":"bytes","field-id":130}]}}]}
         |  ]}}
         |]}""".stripMargin)
  }

  /** manifest_file (one manifest-list row), with the partition
    * field_summary array carrying the spec's binary bounds.
    */
  private[sources] val manifestFileSchema: Schema =
    new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string","field-id":500},
        |  {"name":"manifest_length","type":"long","field-id":501},
        |  {"name":"partition_spec_id","type":"int","field-id":502},
        |  {"name":"added_snapshot_id","type":["null","long"],
        |   "default":null,"field-id":503},
        |  {"name":"partitions","field-id":507,"default":null,
        |   "type":["null",{"type":"array","items":{
        |     "type":"record","name":"r508","fields":[
        |       {"name":"contains_null","type":"boolean","field-id":509},
        |       {"name":"lower_bound","type":["null","bytes"],
        |        "default":null,"field-id":510},
        |       {"name":"upper_bound","type":["null","bytes"],
        |        "default":null,"field-id":511}
        |  ]}}]}
        |]}""".stripMargin)

  // ---------------------------------------------------------------
  // single-value binary serialization (spec appendix D)
  // ---------------------------------------------------------------

  private[sources] def boundBytes(v: Any): Array[Byte] = v match {
    case s: String => s.getBytes(UTF_8)
    case l: Long =>
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(l).array()
    case other => throw new IllegalArgumentException(
      s"unsupported partition bound type ${other.getClass.getSimpleName}")
  }

  private[sources] def boundValue(b: Array[Byte], ptype: String): Any =
    ptype match {
      case "string" => new String(b, UTF_8)
      case "long" => java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      case other => throw new IllegalArgumentException(
        s"unsupported partition type $other")
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case _ => throw new IllegalArgumentException(s"uncomparable: $a vs $b")
  }

  // ---------------------------------------------------------------
  // reader
  // ---------------------------------------------------------------

  final case class TableMeta(
      formatVersion: Int,
      version: Int,                   // metadata file number (vN)
      location: String,               // location recorded in metadata
      root: String,                   // where the table actually sits
      columns: Seq[String],           // schema field names, spec order
      fieldIds: Map[String, Int],     // column name -> spec field id
      partFields: Seq[(String, String)], // identity partition (name, type)
      currentSnapshotId: Long,
      snapshots: Seq[(Long, String)], // (snapshot-id, manifest-list)
      manifestList: String) {         // SELECTED snapshot's manifest list
    /** Relocation support: the spec records absolute file URIs, so a
      * table moved wholesale (the annIndex stage→publish rename, a
      * bucket migration) carries stale prefixes — any recorded path
      * under the metadata `location` is rebased onto the actual root.
      */
    def rebase(p: String): String = {
      // compare scheme-free: composers record hadoop URIs ("file:/x"),
      // the location/table root are often bare paths
      def bare(s: String) =
        if (s.startsWith("file:")) s.substring(5) else s
      val (q, loc, r) = (bare(p), bare(location), bare(root))
      if (loc.nonEmpty && loc != r && q.startsWith(loc))
        r + q.substring(loc.length)
      else p
    }
  }

  /** One field_summary: inclusive [lower, upper] for a partition
    * field (None = no bound recorded — conservatively unprunable).
    */
  final case class FieldBounds(lower: Option[Any], upper: Option[Any],
                               containsNull: Boolean)

  final case class ManifestInfo(
      path: String,
      bounds: Seq[FieldBounds]) // per partition field, spec order

  /** Resolve and parse the CURRENT table metadata: version-hint.text
    * when present (the spec's file-system-catalog convention), else
    * the max-numbered `vN.metadata.json`. Pass `asOf` to select a
    * historical snapshot (TIME TRAVEL — every snapshot's manifest list
    * stays addressable in the metadata, so reading yesterday's table
    * is picking yesterday's snapshot id, no data movement).
    */
  def currentMetadata(tableDir: String,
                      asOf: Option[Long] = None): TableMeta = {
    val metaDir = new HPath(s"$tableDir/metadata")
    val fs = metaDir.getFileSystem(hconf)
    val hint = new HPath(metaDir, "version-hint.text")
    val version =
      if (fs.exists(hint)) {
        val in = fs.open(hint)
        try new String(in.readAllBytes(), UTF_8).trim.toInt
        finally in.close()
      } else {
        val vs = fs.listStatus(metaDir).map(_.getPath.getName)
          .flatMap { n =>
            val m = "v(\\d+)\\.metadata\\.json".r.findFirstMatchIn(n)
            m.map(_.group(1).toInt)
          }
        require(vs.nonEmpty, s"no vN.metadata.json under $metaDir")
        vs.max
      }
    val mf = new HPath(metaDir, s"v$version.metadata.json")
    val in = fs.open(mf)
    val root = try om.readTree(in.readAllBytes()) finally in.close()

    val fv = root.path("format-version").asInt(-1)
    require(fv == 1,
      s"iceberg: format-version $fv not supported (v1 subset reader)")
    val schema = root.path("schema")
    val columns = schema.path("fields").elements().asScala
      .map(_.path("name").asText()).toSeq
    val types = schema.path("fields").elements().asScala
      .map(f => f.path("id").asInt() ->
        (f.path("name").asText(), f.path("type").asText())).toMap

    val spec = root.path("partition-spec")
    require(spec.isArray && spec.size() >= 1,
      "iceberg: need at least one partition field")
    val partFields = spec.elements().asScala.map { pf =>
      require(pf.path("transform").asText() == "identity",
        s"iceberg: only identity transform supported, " +
          s"got ${pf.path("transform").asText()}")
      val (pname, ptypeRaw) = types(pf.path("source-id").asInt())
      val ptype = ptypeRaw match {
        case "string" => "string"
        case "long" | "int" => "long"
        case other => throw new IllegalArgumentException(
          s"iceberg: unsupported partition column type $other")
      }
      (pname, ptype)
    }.toSeq

    val currentId = root.path("current-snapshot-id").asLong()
    val snaps = root.path("snapshots").elements().asScala.map(s =>
      (s.path("snapshot-id").asLong(),
        s.path("manifest-list").asText())).toSeq
    val snapId = asOf.getOrElse(currentId)
    val list = snaps.collectFirst { case (id, l) if id == snapId => l }
      .getOrElse(throw new IllegalArgumentException(
        s"iceberg: snapshot $snapId not in snapshots list " +
          s"(have: ${snaps.map(_._1).mkString(", ")})"))
    val fieldIds = schema.path("fields").elements().asScala
      .map(f => f.path("name").asText() -> f.path("id").asInt()).toMap
    TableMeta(fv, version, root.path("location").asText(tableDir),
      tableDir, columns, fieldIds, partFields, currentId, snaps, list)
  }

  /** The manifest list: per-manifest paths + partition-bound
    * summaries, read driver-side (one small Avro file).
    */
  def manifestList(meta: TableMeta): Seq[ManifestInfo] =
    readAvro(meta.rebase(meta.manifestList)).map { r =>
      val parts = Option(r.get("partitions"))
        .map(_.asInstanceOf[java.util.List[GenericRecord]].asScala.toSeq)
        .getOrElse(Seq.empty)
      // one field_summary per partition field, spec order; a list
      // shorter than the spec leaves the tail unprunable
      val bounds = meta.partFields.zipWithIndex.map { case ((_, t), i) =>
        val summary = parts.lift(i)
        def bound(name: String): Option[Any] = summary.flatMap(s =>
          Option(s.get(name)).map(bb => boundValue(
            bufBytes(bb.asInstanceOf[java.nio.ByteBuffer]), t)))
        FieldBounds(bound("lower_bound"), bound("upper_bound"),
          summary.exists(_.get("contains_null").asInstanceOf[Boolean]))
      }
      ManifestInfo(r.get("manifest_path").toString, bounds)
    }

  final case class FileEntry(
      path: String,
      partition: Map[String, Any],        // partition field -> value
      longBounds: Map[Int, (Long, Long)]) // field id -> (lower, upper)

  /** Live (status != DELETED) data-file entries of one manifest, with
    * the per-file column bound maps (spec fields 125/128) decoded for
    * long columns — the file-skipping statistics.
    */
  def manifestEntries(manifestPath: String,
                      meta: TableMeta): Seq[FileEntry] =
    readAvro(meta.rebase(manifestPath))
      .filter(_.get("status").asInstanceOf[Int] != 2) // 2 = DELETED
      .map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        require(df.get("file_format").toString
          .equalsIgnoreCase("PARQUET"),
          s"iceberg: only parquet data files supported")
        val pRec = df.get("partition").asInstanceOf[GenericRecord]
        val pv = meta.partFields.flatMap { case (n, _) =>
          Option(pRec.get(n)).map {
            case u: org.apache.avro.util.Utf8 => n -> (u.toString: Any)
            case other => n -> other
          }
        }.toMap
        def kv(name: String): Map[Int, Long] =
          (df.getSchema.getField(name), df.get(name)) match {
            case (f, l) if f != null && l != null =>
              l.asInstanceOf[java.util.List[GenericRecord]].asScala.map {
                r => r.get("key").asInstanceOf[Int] ->
                  boundValue(bufBytes(r.get("value")
                    .asInstanceOf[java.nio.ByteBuffer]), "long")
                    .asInstanceOf[Long]
              }.toMap
            case _ => Map.empty
          }
        val lo = kv("lower_bounds"); val hi = kv("upper_bounds")
        val bounds = lo.keySet.intersect(hi.keySet)
          .map(k => k -> (lo(k), hi(k))).toMap
        FileEntry(meta.rebase(df.get("file_path").toString), pv, bounds)
      }

  /** Data files surviving an optional identity-partition equality
    * predicate, plus the pruning census for the plan-shape law:
    * (files, manifestsRead, manifestsTotal).
    */
  def prunedDataFiles(tableDir: String,
                      partitionEq: Option[String],
                      asOf: Option[Long] = None,
                      colRange: Option[(String, Long, Long)] = None,
                      partitionEqs: Map[String, String] = Map.empty)
      : (Seq[String], Int, Int) = {
    val meta = currentMetadata(tableDir, asOf)
    val mans = manifestList(meta)
    val fieldIdx = meta.partFields.map(_._1).zipWithIndex.toMap
    // `partitionEq` is single-value sugar for the FIRST partition
    // field; `partitionEqs` is the general multi-field predicate
    val wants0 = partitionEqs ++
      partitionEq.map(v => meta.partFields.head._1 -> v).toMap
    val wants: Map[String, Any] = wants0.map { case (n, v) =>
      val t = meta.partFields.collectFirst { case (pn, pt) if pn == n => pt }
        .getOrElse(throw new IllegalArgumentException(
          s"iceberg: '$n' is not a partition field of " +
            s"${meta.partFields.map(_._1).mkString(", ")}"))
      n -> (if (t == "long") v.toLong: Any else v: Any)
    }
    // manifest pruning: spec bounds are inclusive; a manifest whose
    // [lower, upper] window excludes a wanted value on ANY predicated
    // field is never opened (missing bounds keep it, conservatively)
    val survivors =
      if (wants.isEmpty) mans
      else mans.filter { m =>
        wants.forall { case (n, v) =>
          val b = m.bounds(fieldIdx(n))
          b.lower.forall(cmp(_, v) <= 0) && b.upper.forall(cmp(v, _) <= 0)
        }
      }
    // file-level: partition equality on every predicated field, then
    // COLUMN-STATS skipping — a file whose recorded [lower, upper]
    // window for the predicate column misses the wanted range is never
    // opened (files without stats are conservatively kept)
    val rangeId = colRange.map { case (name, _, _) =>
      meta.fieldIds.getOrElse(name, throw new IllegalArgumentException(
        s"iceberg: no column '$name' in table schema"))
    }
    val files = survivors.flatMap(m => manifestEntries(m.path, meta))
      .collect {
        case e if wants.forall { case (n, v) =>
            e.partition.get(n).contains(v)
          } &&
          colRange.forall { case (_, lo, hi) =>
            e.longBounds.get(rangeId.get)
              .forall { case (fLo, fHi) => fHi >= lo && fLo <= hi }
          } => e.path
      }
    (files, survivors.size, mans.size)
  }

  /** Scan the table's current snapshot as a DataFrame, optionally
    * pruned by identity-partition equalities (manifest-level AND
    * file-level pruning from metadata alone — no data file of another
    * partition is ever opened) and/or a long-column range against the
    * per-file stats. Column order follows the table schema.
    */
  def scan(spark: SparkSession, tableDir: String,
           partitionEq: Option[String] = None,
           asOf: Option[Long] = None,
           colRange: Option[(String, Long, Long)] = None,
           partitionEqs: Map[String, String] = Map.empty): DataFrame = {
    val meta = currentMetadata(tableDir, asOf)
    val (files, _, _) =
      prunedDataFiles(tableDir, partitionEq, asOf, colRange, partitionEqs)
    if (files.isEmpty)
      // a fully-pruned probe (or an empty table) is an EMPTY RESULT,
      // not an error — schema comes from the table metadata, exactly
      // what a catalog-backed reader would plan
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        sparkSchema(tableDir, meta))
    else {
      val base = spark.read.parquet(files: _*)
        .select(meta.columns.map(c => col(s"`$c`")): _*)
      // the stats prune skips FILES; the row-level filter (also pushed
      // into the surviving parquet scans) makes the result exact
      colRange.map { case (name, lo, hi) =>
        base.filter(col(s"`$name`").between(lo, hi))
      }.getOrElse(base)
    }
  }

  /** Spark schema from the table metadata's Iceberg types (the
    * composer's type map inverted) — used when no data file survives
    * pruning and the scan must still carry the table's shape.
    */
  private def sparkSchema(tableDir: String, meta: TableMeta)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val metaDir = new HPath(s"$tableDir/metadata")
    val fs = metaDir.getFileSystem(hconf)
    val in = fs.open(new HPath(metaDir, s"v${meta.version}.metadata.json"))
    val root = try om.readTree(in.readAllBytes()) finally in.close()
    def toSpark(t: String): DataType = t match {
      case "long"        => LongType
      case "int"         => IntegerType
      case "double"      => DoubleType
      case "float"       => FloatType
      case "string"      => StringType
      case "boolean"     => BooleanType
      case "date"        => DateType
      case "timestamptz" => TimestampType
      case "timestamp"   => TimestampNTZType
      case d if d.startsWith("decimal(") =>
        val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")")
          .split(",").map(_.trim.toInt)
        DecimalType(p, s)
      case other => throw new IllegalArgumentException(
        s"iceberg: unsupported column type $other")
    }
    StructType(root.path("schema").path("fields").elements().asScala.map {
      f => StructField(f.path("name").asText(),
        toSpark(f.path("type").asText()), nullable = true)
    }.toSeq)
  }

  /** Incremental (CDC-style) read: the rows ADDED between two
    * snapshots — the data files reachable from `toSnap` but not from
    * `fromSnap`. With append-only snapshots that is exactly the
    * appended rows, resolved from METADATA alone (two manifest-list
    * walks, no table scan), so a downstream consumer processes each
    * new snapshot at O(delta) — the read-side pairing of
    * [[graft.streaming.IcebergStream.appendIncremental]]'s
    * snapshot-per-batch sink.
    */
  def incrementalScan(spark: SparkSession, tableDir: String,
                      fromSnap: Long, toSnap: Long): DataFrame = {
    require(fromSnap < toSnap,
      s"incrementalScan needs fromSnap < toSnap, got $fromSnap..$toSnap")
    val meta = currentMetadata(tableDir, Some(toSnap))
    val fromFiles =
      prunedDataFiles(tableDir, None, Some(fromSnap))._1.toSet
    val newFiles = prunedDataFiles(tableDir, None, Some(toSnap))._1
      .filterNot(fromFiles)
    if (newFiles.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        sparkSchema(tableDir, meta))
    else
      spark.read.parquet(newFiles: _*)
        .select(meta.columns.map(c => col(s"`$c`")): _*)
  }

  // ---------------------------------------------------------------
  // closed-form composer (fixtures + the write side of the surface)
  // ---------------------------------------------------------------

  /** Compose a v1 Iceberg table from `df`, identity-partitioned on
    * `partCol` (string or long): per-partition parquet data dirs, one
    * manifest per partition (bounds = the partition value), a
    * manifest list with field summaries, `v1.metadata.json`, and
    * `version-hint.text`. Deterministic throughout (fixed timestamps,
    * name-derived UUID) so fixture builds are hash-stable.
    *
    * The composer collects only the DISTINCT PARTITION VALUES to the
    * driver — partition counts are bounded by design (this is the
    * same contract as any partitionBy sink); row data never leaves
    * the cluster.
    */
  def writeTable(df: DataFrame, tableDir: String, partCol: String,
                 sortBy: Option[String] = None): Unit =
    writeTablePartitioned(df, tableDir, Seq(partCol), sortBy)

  /** The general composer: N identity partition fields. */
  def writeTablePartitioned(df: DataFrame, tableDir: String,
                            partCols: Seq[String],
                            sortBy: Option[String] = None): Unit = {
    require(partCols.nonEmpty, "iceberg composer: need >= 1 partition col")
    val spark = df.sparkSession
    val partFields = partCols.map { c =>
      c -> (df.schema(c).dataType.typeName match {
        case "string" => "string"
        case "long" | "integer" => "long"
        case other => throw new IllegalArgumentException(
          s"iceberg composer: unsupported partition type $other")
      })
    }
    val listRecords = composeSnapshotManifests(df, tableDir, partFields,
      snapId = 1L, dataRoot = s"$tableDir/data", sortBy = sortBy)
    val listPath = s"$tableDir/metadata/snap-1-1.avro"
    writeAvro(listPath, manifestFileSchema, listRecords, Map.empty)

    // table metadata JSON (v1) + version hint
    val typeName: org.apache.spark.sql.types.DataType => String = {
      case org.apache.spark.sql.types.LongType      => "long"
      case org.apache.spark.sql.types.IntegerType   => "int"
      case org.apache.spark.sql.types.DoubleType    => "double"
      case org.apache.spark.sql.types.FloatType     => "float"
      case org.apache.spark.sql.types.StringType    => "string"
      case org.apache.spark.sql.types.BooleanType   => "boolean"
      case org.apache.spark.sql.types.DateType      => "date"
      case org.apache.spark.sql.types.TimestampType => "timestamptz"
      case org.apache.spark.sql.types.TimestampNTZType => "timestamp"
      case d: org.apache.spark.sql.types.DecimalType =>
        s"decimal(${d.precision}, ${d.scale})"
      case other => throw new IllegalArgumentException(
        s"iceberg composer: unsupported column type $other")
    }
    val fieldsJson = df.schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id": ${i + 1}, "name": "${f.name}", "required": false,
         | "type": "${typeName(f.dataType)}"}""".stripMargin
    }.mkString(",\n      ")
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft-iceberg:$tableDir".getBytes(UTF_8))
    val specJson = partCols.zipWithIndex.map { case (c, i) =>
      s"""{"name": "$c", "transform": "identity",
         |  "source-id": ${df.schema.fieldIndex(c) + 1},
         |  "field-id": ${1000 + i}}""".stripMargin
    }.mkString("[", ",\n ", "]")
    val metaJson =
      s"""{
         |  "format-version": 1,
         |  "table-uuid": "$uuid",
         |  "location": "$tableDir",
         |  "last-updated-ms": 1700000000000,
         |  "last-column-id": ${df.schema.fields.length},
         |  "schema": {"type": "struct", "fields": [
         |      $fieldsJson
         |  ]},
         |  "partition-spec": $specJson,
         |  "partition-specs": [{"spec-id": 0, "fields": $specJson}],
         |  "default-spec-id": 0,
         |  "properties": {},
         |  "current-snapshot-id": 1,
         |  "snapshots": [{
         |    "snapshot-id": 1,
         |    "timestamp-ms": 1700000000000,
         |    "summary": {"operation": "append"},
         |    "manifest-list": "$listPath"
         |  }]
         |}""".stripMargin
    writeText(s"$tableDir/metadata/v1.metadata.json", metaJson)
    writeText(s"$tableDir/metadata/version-hint.text", "1")
    // the fixture composer runs inside Spark jobs; keep spark referenced
    // for future multi-snapshot appends without API change
    locally(spark)
  }

  /** Append a new SNAPSHOT to an existing table (the third persisted-
    * artifact append of the round, beside the index trio): the new
    * shard's data files land under `data/snap<id>/`, its manifests are
    * written fresh, and the new manifest list carries the PRIOR
    * snapshot's manifest entries (rebased if the table moved) plus the
    * new ones — the spec's append pattern: existing manifests are
    * REUSED, never rewritten. Metadata goes out as v(N+1) with both
    * snapshots addressable, so `scan(asOf = oldId)` time-travels to
    * the pre-append table for free.
    */
  def appendToTable(df: DataFrame, tableDir: String,
                    sortBy: Option[String] = None): Unit = {
    val meta = currentMetadata(tableDir)
    require(df.schema.fieldNames.toSeq == meta.columns,
      s"iceberg append: columns ${df.schema.fieldNames.toSeq} != " +
        s"table schema ${meta.columns}")
    val newId = meta.snapshots.map(_._1).max + 1
    val newRecords = composeSnapshotManifests(df, tableDir,
      meta.partFields, snapId = newId,
      dataRoot = s"$tableDir/data/snap$newId", sortBy = sortBy)
    // prior snapshot's manifests ride into the new list unchanged
    // (paths rebased in case the table was relocated since the build)
    val oldRecords = readAvro(meta.rebase(meta.manifestList)).map { r =>
      val c = new GenericData.Record(manifestFileSchema)
      c.put("manifest_path", meta.rebase(r.get("manifest_path").toString))
      c.put("manifest_length", r.get("manifest_length"))
      c.put("partition_spec_id", r.get("partition_spec_id"))
      c.put("added_snapshot_id", r.get("added_snapshot_id"))
      c.put("partitions", r.get("partitions"))
      c
    }
    val listPath = s"$tableDir/metadata/snap-$newId-1.avro"
    writeAvro(listPath, manifestFileSchema, oldRecords ++ newRecords,
      Map.empty)

    // v(N+1) metadata: prior JSON with the snapshot appended — Jackson
    // round-trips unknown fields untouched
    val fs = new HPath(tableDir).getFileSystem(hconf)
    val oldMetaPath =
      new HPath(s"$tableDir/metadata/v${meta.version}.metadata.json")
    val in = fs.open(oldMetaPath)
    val root = try om.readTree(in.readAllBytes())
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    finally in.close()
    root.put("current-snapshot-id", newId)
    // `location` deliberately stays what the BUILD recorded: rebase
    // keys off it to heal the build's absolute paths after a
    // relocation, and the append's own paths (current-root prefix)
    // never match it. (One relocation covered; relocate-append-
    // relocate chains would need manifest rewrites — out of scope.)
    val snapNode = root.withArray[com.fasterxml.jackson.databind.node
      .ArrayNode]("snapshots").addObject()
    snapNode.put("snapshot-id", newId)
    snapNode.put("timestamp-ms", 1700000000000L + newId)
    snapNode.putObject("summary").put("operation", "append")
    snapNode.put("manifest-list", listPath)
    writeText(s"$tableDir/metadata/v${meta.version + 1}.metadata.json",
      om.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    writeText(s"$tableDir/metadata/version-hint.text",
      (meta.version + 1).toString)
  }

  /** Expire every snapshot except the current one — the spec's
    * `expire_snapshots` maintenance op, time travel's pair: history
    * metadata is dropped and any manifest list / manifest / data file
    * reachable ONLY from expired snapshots is deleted. With the
    * append-only composer every prior manifest is reused by the
    * current snapshot, so in practice this deletes the old manifest
    * LISTS and the time-travel entries; the reachability walk is still
    * done properly so an overwrite-capable future composer inherits
    * correct orphan deletion. Metadata goes out as v(N+1) with a
    * single-snapshot history.
    */
  def expireSnapshots(tableDir: String): Unit = {
    val meta = currentMetadata(tableDir)
    val fs = new HPath(tableDir).getFileSystem(hconf)
    val keepManifests = readAvro(meta.rebase(meta.manifestList))
      .map(r => meta.rebase(r.get("manifest_path").toString)).toSet
    val keepFiles = keepManifests.flatMap(mp =>
      manifestEntries(mp, meta).map(_.path))
    for ((id, list) <- meta.snapshots if id != meta.currentSnapshotId) {
      val lp = meta.rebase(list)
      if (fs.exists(new HPath(lp))) {
        val mans = readAvro(lp)
          .map(r => meta.rebase(r.get("manifest_path").toString))
        for (mp <- mans if !keepManifests.contains(mp)
             if fs.exists(new HPath(mp))) {
          for (fe <- manifestEntries(mp, meta)
               if !keepFiles.contains(fe.path))
            fs.delete(new HPath(fe.path), false)
          fs.delete(new HPath(mp), false)
        }
        fs.delete(new HPath(lp), false)
      }
    }
    // v(N+1): same metadata, history cut to the current snapshot
    val oldMetaPath =
      new HPath(s"$tableDir/metadata/v${meta.version}.metadata.json")
    val in = fs.open(oldMetaPath)
    val root = try om.readTree(in.readAllBytes())
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    finally in.close()
    val snapsNode = root.withArray[com.fasterxml.jackson.databind.node
      .ArrayNode]("snapshots")
    val keep = (0 until snapsNode.size()).map(snapsNode.get)
      .find(_.path("snapshot-id").asLong() == meta.currentSnapshotId)
      .getOrElse(throw new IllegalStateException(
        "current snapshot vanished from metadata"))
    snapsNode.removeAll()
    snapsNode.add(keep)
    writeText(s"$tableDir/metadata/v${meta.version + 1}.metadata.json",
      om.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    writeText(s"$tableDir/metadata/version-hint.text",
      (meta.version + 1).toString)
  }

  /** Write one snapshot's data dirs + per-partition manifests; returns
    * the manifest-list rows (with single-value binary bound
    * summaries). Shared by [[writeTable]] (snapshot 1, `data/`) and
    * [[appendToTable]] (snapshot N, `data/snapN/`).
    */
  private def composeSnapshotManifests(df0: DataFrame, tableDir: String,
                                       partFields: Seq[(String, String)],
                                       snapId: Long, dataRoot: String,
                                       sortBy: Option[String] = None)
      : Seq[GenericRecord] = {
    val fs = new HPath(tableDir).getFileSystem(hconf)
    // materialize the input once: the per-partition write loop below
    // filters this frame |values| times — without the barrier each
    // filter would recompute the upstream plan per partition value
    val df = df0.localCheckpoint(true)
    val partNames = partFields.map(_._1)
    val values = df
      .select(partNames.map(c => col(s"`$c`")): _*).distinct()
      .collect().map(r => partNames.indices.map(r.get))
      .sortBy(_.map(String.valueOf).mkString("/"))
    // data files: one dir per partition TUPLE, columns retained in the
    // files (identity partitioning; readers may take them from either)
    val entrySchema = manifestEntrySchema(partFields)
    val dataFileSch = entrySchema.getField("data_file").schema()
    val partSch = dataFileSch.getField("partition").schema()
    def asPartVal(v: Any): Any = v match {
      case n: Int => n.toLong
      case other => other
    }
    // (column name -> spec field id) for the stats maps — ids follow
    // the metadata schema's id = position + 1 rule
    val fieldIds = df.schema.fieldNames.zipWithIndex
      .map { case (n, i) => n -> (i + 1) }.toMap
    val loSch = dataFileSch.getField("lower_bounds").schema()
      .getTypes.get(1).getElementType
    val hiSch = dataFileSch.getField("upper_bounds").schema()
      .getTypes.get(1).getElementType
    val manifests = values.zipWithIndex.map { case (vs, i) =>
      val dataDir = dataRoot + partNames.zip(vs)
        .map { case (n, v) => s"/$n=$v" }.mkString
      val shard0 = partNames.zip(vs)
        .map { case (n, v) => col(s"`$n`") === v }
        .foldLeft(df)((d, p) => d.filter(p))
      // sort clustering (the spec's sort-order story): range-cluster
      // the shard on `sortBy` so each data file covers a DISJOINT
      // value window — that's what makes the per-file bound stats
      // written below actually skip files for range predicates
      val shard = sortBy.map(c =>
        shard0.repartitionByRange(4, col(s"`$c`"))).getOrElse(shard0)
      shard.write.mode("overwrite").parquet(dataDir)
      val parts = fs.listStatus(new HPath(dataDir))
        .filter(f => f.getPath.getName.endsWith(".parquet") &&
          !f.getPath.getName.startsWith("_"))
        .sortBy(_.getPath.getName)
      val entries = parts.map { f =>
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1) // ADDED
        e.put("snapshot_id", snapId)
        val d = new GenericData.Record(dataFileSch)
        d.put("file_path", f.getPath.toString)
        d.put("file_format", "PARQUET")
        val p = new GenericData.Record(partSch)
        partNames.zip(vs).foreach { case (n, v) =>
          p.put(n, asPartVal(v))
        }
        d.put("partition", p)
        d.put("record_count", parquetRowCount(f.getPath))
        d.put("file_size_in_bytes", f.getLen)
        // per-file column bounds from the parquet FOOTER (free — the
        // row-group stats are already there), long columns only
        val stats = footerLongStats(f.getPath)
        if (stats.nonEmpty) {
          def kvList(sch: Schema, pick: ((Long, Long)) => Long) = {
            val l = new java.util.ArrayList[GenericRecord]()
            stats.toSeq.sortBy(t => fieldIds(t._1)).foreach {
              case (name, mm) =>
                val r = new GenericData.Record(sch)
                r.put("key", fieldIds(name))
                r.put("value",
                  java.nio.ByteBuffer.wrap(boundBytes(pick(mm))))
                l.add(r)
            }
            l
          }
          d.put("lower_bounds", kvList(loSch, _._1))
          d.put("upper_bounds", kvList(hiSch, _._2))
        }
        e.put("data_file", d)
        e
      }
      val mPath = s"$tableDir/metadata/snap$snapId-m$i.avro"
      writeAvro(mPath, entrySchema, entries.toSeq,
        Map("partition-spec-id" -> "0"))
      val mLen = fs.getFileStatus(new HPath(mPath)).getLen
      (mPath, mLen, vs)
    }
    // manifest-list rows: one field_summary per partition field (spec
    // order), bounds = the single partition tuple this manifest covers
    val summarySch = manifestFileSchema.getField("partitions").schema()
      .getTypes.get(1).getElementType
    manifests.map { case (mPath, mLen, vs) =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", mPath)
      r.put("manifest_length", mLen)
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", snapId)
      val summaries = new java.util.ArrayList[GenericRecord]()
      vs.foreach { v =>
        val s = new GenericData.Record(summarySch)
        s.put("contains_null", false)
        val bb = java.nio.ByteBuffer.wrap(boundBytes(asPartVal(v)))
        s.put("lower_bound", bb.duplicate())
        s.put("upper_bound", bb.duplicate())
        summaries.add(s)
      }
      r.put("partitions", summaries)
      r
    }.toSeq
  }

  // ---------------------------------------------------------------
  // small IO helpers
  // ---------------------------------------------------------------

  private def readAvro(path: String): Seq[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](
      new FsInput(new HPath(path), hconf),
      new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toList finally r.close()
  }

  private def writeAvro(path: String, schema: Schema,
                        records: Seq[GenericRecord],
                        meta: Map[String, String]): Unit = {
    val fs = new HPath(path).getFileSystem(hconf)
    val out = fs.create(new HPath(path), true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(schema, out)
    try records.foreach(w.append) finally w.close()
  }

  private def writeText(path: String, text: String): Unit = {
    val fs = new HPath(path).getFileSystem(hconf)
    val out = fs.create(new HPath(path), true)
    try out.write(text.getBytes(UTF_8)) finally out.close()
  }

  private def bufBytes(bb: java.nio.ByteBuffer): Array[Byte] = {
    val d = bb.duplicate()
    val a = new Array[Byte](d.remaining())
    d.get(a)
    a
  }

  private def parquetRowCount(file: HPath): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(file, hconf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getRecordCount finally reader.close()
  }

  /** Per-file (min, max) for top-level INT64 columns, folded across
    * row groups from the parquet footer statistics — no data read.
    */
  private def footerLongStats(file: HPath): Map[String, (Long, Long)] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(file, hconf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      for (block <- reader.getFooter.getBlocks.asScala;
           c <- block.getColumns.asScala) {
        // ascribe away parquet's existential Statistics[T <: Comparable[T]]
        val st: org.apache.parquet.column.statistics.Statistics[_] =
          c.getStatistics
        if (c.getPath.size() == 1 &&
          c.getPrimitiveType.getPrimitiveTypeName ==
            PrimitiveTypeName.INT64 &&
          st != null && !st.isEmpty && st.hasNonNullValue) {
          val name = c.getPath.toDotString
          val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
          val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
          val cur = acc.get(name)
          acc(name) = (cur.fold(mn)(t => math.min(t._1, mn)),
            cur.fold(mx)(t => math.max(t._2, mx)))
        }
      }
      acc.toMap
    } finally reader.close()
  }
}
