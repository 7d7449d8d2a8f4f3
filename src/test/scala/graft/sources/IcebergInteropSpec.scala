package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** FOREIGN-writer interop fixtures: hand-composed metadata trees with
  * the shapes this repo's own composer never writes — v2 layout
  * (`schemas` + `current-schema-id`, `partition-specs`), no
  * version-hint, EXISTING/DELETED status entries, explicit and
  * INHERITED v2 sequence numbers over NON-monotone snapshot ids, null
  * snapshot_id entries, non-8-byte column bounds, null partition
  * values in delete manifests. The reader already guards each of
  * these; this suite makes the guarantees regression-proof against a
  * byte-level fixture matrix instead of self-composed tables.
  */
class IcebergInteropSpec extends SparkSpec {

  // v2 manifest_entry schema WITH the sequence_number field (id 3) a
  // foreign writer records — this repo's composer omits it
  private def entrySchemaV2: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"snapshot_id","type":["null","long"],"default":null,
      |   "field-id":1},
      |  {"name":"sequence_number","type":["null","long"],"default":null,
      |   "field-id":3},
      |  {"name":"data_file","field-id":2,"type":{
      |    "type":"record","name":"r2","fields":[
      |      {"name":"content","type":"int","default":0,"field-id":134},
      |      {"name":"equality_ids","default":null,"field-id":135,
      |       "type":["null",{"type":"array","items":"int"}]},
      |      {"name":"file_path","type":"string","field-id":100},
      |      {"name":"file_format","type":"string","field-id":101},
      |      {"name":"partition","field-id":102,"type":{
      |        "type":"record","name":"r102","fields":[
      |          {"name":"part","type":["null","string"],
      |           "default":null,"field-id":1000}]}},
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

  // v2 manifest_file schema WITH the list-level sequence_number (515)
  private def listSchemaV2: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string","field-id":500},
      |  {"name":"manifest_length","type":"long","field-id":501},
      |  {"name":"partition_spec_id","type":"int","field-id":502},
      |  {"name":"content","type":"int","default":0,"field-id":517},
      |  {"name":"sequence_number","type":["null","long"],"default":null,
      |   "field-id":515},
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

  /** Write rows as ONE parquet file; returns its absolute path. */
  private def oneParquet(dir: String, name: String,
                         df: org.apache.spark.sql.DataFrame): String = {
    val out = s"$dir/$name"
    df.coalesce(1).write.mode("overwrite").parquet(out)
    new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_"))
      .head.getAbsolutePath
  }

  private def entry(schema: Schema, status: Int, snapId: java.lang.Long,
                    seq: java.lang.Long, path: String, content: Int,
                    part: String, nRows: Long,
                    eqIds: Seq[Int] = Seq.empty,
                    bounds: Map[Int, Array[Byte]] = Map.empty)
      : GenericRecord = {
    val e = new GenericData.Record(schema)
    e.put("status", status)
    e.put("snapshot_id", snapId)
    if (schema.getField("sequence_number") != null)
      e.put("sequence_number", seq)
    val dfSch = schema.getField("data_file").schema()
    val d = new GenericData.Record(dfSch)
    d.put("content", content)
    if (eqIds.nonEmpty) {
      val ids = new java.util.ArrayList[Integer]()
      eqIds.foreach(i => ids.add(i))
      d.put("equality_ids", ids)
    }
    d.put("file_path", path)
    d.put("file_format", "PARQUET")
    val p = new GenericData.Record(
      dfSch.getField("partition").schema())
    if (part != null) p.put("part", part) // null partition value stays null
    d.put("partition", p)
    d.put("record_count", nRows)
    d.put("file_size_in_bytes", 1L)
    if (bounds.nonEmpty) {
      def kv(fname: String) = {
        val sch = dfSch.getField(fname).schema().getTypes.get(1)
          .getElementType
        val l = new java.util.ArrayList[GenericRecord]()
        bounds.toSeq.sortBy(_._1).foreach { case (k, v) =>
          val r = new GenericData.Record(sch)
          r.put("key", k)
          r.put("value", java.nio.ByteBuffer.wrap(v))
          l.add(r)
        }
        l
      }
      d.put("lower_bounds", kv("lower_bounds"))
      d.put("upper_bounds", kv("upper_bounds"))
    }
    e.put("data_file", d)
    e
  }

  private def listRow(schema: Schema, path: String, content: Int,
                      seq: java.lang.Long): GenericRecord = {
    val r = new GenericData.Record(schema)
    r.put("manifest_path", path)
    r.put("manifest_length", 1L)
    r.put("partition_spec_id", 0)
    r.put("content", content)
    if (schema.getField("sequence_number") != null)
      r.put("sequence_number", seq)
    r.put("added_snapshot_id", null)
    r.put("partitions", null)
    r
  }

  /** v2-layout metadata JSON a foreign writer would publish: schemas +
    * current-schema-id, partition-specs + default-spec-id, RANDOM
    * (non-monotone) snapshot ids, no properties, no version-hint.
    */
  private def writeMetaV2(dir: String,
                          snaps: Seq[(Long, String, String)]): Unit = {
    val snapJson = snaps.map { case (id, op, list) =>
      s"""{"snapshot-id": $id, "timestamp-ms": 1,
         | "summary": {"operation": "$op"}, "manifest-list": "$list"}"""
        .stripMargin
    }.mkString("[", ",\n", "]")
    val json =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "00000000-0000-0000-0000-000000000000",
         |  "location": "$dir",
         |  "last-updated-ms": 1,
         |  "last-column-id": 2,
         |  "schemas": [{"schema-id": 5, "type": "struct", "fields": [
         |    {"id": 1, "name": "k", "required": false, "type": "long"},
         |    {"id": 2, "name": "part", "required": false,
         |     "type": "string"}]}],
         |  "current-schema-id": 5,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "part", "transform": "identity",
         |     "source-id": 2, "field-id": 1000}]}],
         |  "default-spec-id": 0,
         |  "current-snapshot-id": ${snaps.last._1},
         |  "snapshots": $snapJson
         |}""".stripMargin
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/metadata"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
      json.getBytes("UTF-8"))
    // deliberately NO version-hint.text: the max-vN fallback resolves
  }

  private def rows(part: String, ks: Range) = {
    import spark.implicits._
    ks.map(k => (k.toLong, part)).toDF("k", "part")
  }

  test("EXISTING/DELETED status entries: ADDED and EXISTING files are " +
       "read, DELETED entries are skipped — over a v2-layout metadata " +
       "tree with no version-hint") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_interop_status").toString
    val fA = oneParquet(dir, "fa", rows("A", 0 until 5))   // ADDED
    val fB = oneParquet(dir, "fb", rows("B", 10 until 15)) // EXISTING
    val fC = oneParquet(dir, "fc", rows("C", 20 until 25)) // DELETED
    val sch = entrySchemaV2
    val mPath = s"$dir/metadata/m1.avro"
    Iceberg.writeAvro(mPath, sch, Seq(
      entry(sch, 1, 9001L, 1L, fA, 0, "A", 5),
      entry(sch, 0, null, 1L, fB, 0, "B", 5),  // EXISTING, null snap id
      entry(sch, 2, 9001L, 1L, fC, 0, "C", 5)), Map.empty)
    val lPath = s"$dir/metadata/l1.avro"
    Iceberg.writeAvro(lPath, listSchemaV2,
      Seq(listRow(listSchemaV2, mPath, 0, 1L)), Map.empty)
    writeMetaV2(dir, Seq((9001L, "append", lPath)))
    val got = Iceberg.scan(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = ((0 until 5).map(k => (k.toLong, "A")) ++
      (10 until 15).map(k => (k.toLong, "B"))).toSet
    assert(got === want,
      "ADDED + EXISTING read, DELETED skipped")
  }

  test("explicit v2 sequence numbers over NON-monotone snapshot ids: " +
       "equality deletes apply in sequence order, not snapshot-id " +
       "order — old rows retire, same-sequence rows survive") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_interop_seq").toString
    // F1 (seq 1, snapshot 9001) holds the OLD versions; F2 (seq 2,
    // snapshot 37 — a SMALLER id!) the new; delete D (seq 2) retires
    // strictly-older files only
    val f1 = oneParquet(dir, "f1", rows("old", 0 until 5))
    val f2 = oneParquet(dir, "f2", rows("new", 0 until 5))
    import spark.implicits._
    val fd = oneParquet(dir, "fd",
      (0 until 5).map(_.toLong).toDF("k"))
    val sch = entrySchemaV2
    val m1 = s"$dir/metadata/m1.avro"
    Iceberg.writeAvro(m1, sch,
      Seq(entry(sch, 1, 9001L, 1L, f1, 0, "old", 5)), Map.empty)
    val m2 = s"$dir/metadata/m2.avro"
    Iceberg.writeAvro(m2, sch,
      Seq(entry(sch, 1, 37L, 2L, f2, 0, "new", 5)), Map.empty)
    val md = s"$dir/metadata/md.avro"
    // the delete manifest's partition values are NULL (deletes span
    // partitions) — a foreign shape the entry reader must tolerate
    Iceberg.writeAvro(md, sch,
      Seq(entry(sch, 1, 37L, 2L, fd, 2, null, 5, eqIds = Seq(1))),
      Map.empty)
    val l2 = s"$dir/metadata/l2.avro"
    Iceberg.writeAvro(l2, listSchemaV2, Seq(
      listRow(listSchemaV2, m1, 0, 1L),
      listRow(listSchemaV2, m2, 0, 2L),
      listRow(listSchemaV2, md, 1, 2L)), Map.empty)
    writeMetaV2(dir,
      Seq((9001L, "append", l2.replace("l2", "l2")),
        (37L, "overwrite", l2)))
    val got = Iceberg.scan(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === (0 until 5).map(k => (k.toLong, "new")).toSet,
      "seq-1 rows retired by the seq-2 delete; seq-2 rows survive")
  }

  test("INHERITED sequence numbers: entries with null sequence_number " +
       "and null snapshot_id inherit the manifest-list row's sequence " +
       "(the spec's inheritance rule) — same delete outcome") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_interop_inherit").toString
    val f1 = oneParquet(dir, "f1", rows("old", 0 until 5))
    val f2 = oneParquet(dir, "f2", rows("new", 0 until 5))
    import spark.implicits._
    val fd = oneParquet(dir, "fd", (0 until 5).map(_.toLong).toDF("k"))
    val sch = entrySchemaV2
    val m1 = s"$dir/metadata/m1.avro"
    // null snapshot_id AND null sequence_number: inheritance only
    Iceberg.writeAvro(m1, sch,
      Seq(entry(sch, 1, null, null, f1, 0, "old", 5)), Map.empty)
    val m2 = s"$dir/metadata/m2.avro"
    Iceberg.writeAvro(m2, sch,
      Seq(entry(sch, 1, null, null, f2, 0, "new", 5)), Map.empty)
    val md = s"$dir/metadata/md.avro"
    Iceberg.writeAvro(md, sch,
      Seq(entry(sch, 1, null, null, fd, 2, null, 5, eqIds = Seq(1))),
      Map.empty)
    val l2 = s"$dir/metadata/l2.avro"
    Iceberg.writeAvro(l2, listSchemaV2, Seq(
      listRow(listSchemaV2, m1, 0, 1L),
      listRow(listSchemaV2, m2, 0, 2L),
      listRow(listSchemaV2, md, 1, 2L)), Map.empty)
    writeMetaV2(dir, Seq((9001L, "append", l2), (37L, "overwrite", l2)))
    val got = Iceberg.scan(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === (0 until 5).map(k => (k.toLong, "new")).toSet)
  }

  test("NO sequence numbers + non-monotone snapshot ids + equality " +
       "deletes = LOUD refusal (the snapshot-id fallback would merge " +
       "deletes in the wrong order on a foreign table)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_interop_loud").toString
    val f1 = oneParquet(dir, "f1", rows("old", 0 until 5))
    import spark.implicits._
    val fd = oneParquet(dir, "fd", (0 until 5).map(_.toLong).toDF("k"))
    // the repo's OWN entry schema: no sequence_number field anywhere
    val sch = Iceberg.manifestEntrySchema(Seq(
      Iceberg.PartField("part", "part", "identity", "string", "string")))
    val m1 = s"$dir/metadata/m1.avro"
    Iceberg.writeAvro(m1, sch, Seq(
      entry(sch, 1, 9001L, null, f1, 0, "old", 5)), Map.empty)
    val md = s"$dir/metadata/md.avro"
    Iceberg.writeAvro(md, sch, Seq(
      entry(sch, 1, 37L, null, fd, 2, null, 5, eqIds = Seq(1))),
      Map.empty)
    val l2 = s"$dir/metadata/l2.avro"
    Iceberg.writeAvro(l2, Iceberg.manifestFileSchema, Seq(
      listRow(Iceberg.manifestFileSchema, m1, 0, null),
      listRow(Iceberg.manifestFileSchema, md, 1, null)), Map.empty)
    writeMetaV2(dir, Seq((9001L, "append", l2), (37L, "overwrite", l2)))
    val e = intercept[IllegalArgumentException] {
      Iceberg.scan(spark, dir).collect()
    }
    assert(e.getMessage.contains("sequence"),
      s"expected the sequence-order refusal, got: ${e.getMessage}")
  }

  test("non-8-byte column bounds (int/string) are skipped, never " +
       "misdecoded: a file whose stats can't be read as longs stays " +
       "conservatively UNPRUNED and scans exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_interop_bounds").toString
    val fA = oneParquet(dir, "fa", rows("A", 0 until 5))
    val sch = entrySchemaV2
    val intBound = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(999).array()
    val strBound = "zz".getBytes("UTF-8")
    val mPath = s"$dir/metadata/m1.avro"
    // field 1 (k) carries a 4-BYTE INT bound (foreign writer, int
    // column stats); field 2 a string bound — both must be skipped
    Iceberg.writeAvro(mPath, sch, Seq(
      entry(sch, 1, 9001L, 1L, fA, 0, "A", 5,
        bounds = Map(1 -> intBound, 2 -> strBound))), Map.empty)
    val lPath = s"$dir/metadata/l1.avro"
    Iceberg.writeAvro(lPath, listSchemaV2,
      Seq(listRow(listSchemaV2, mPath, 0, 1L)), Map.empty)
    writeMetaV2(dir, Seq((9001L, "append", lPath)))
    // a range probe far outside the bogus int bound must KEEP the
    // file (stats unusable -> conservative) and return exact rows
    val got = Iceberg.scan(spark, dir, colRange = Some(("k", 0L, 2L)))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === (0 until 3).map(k => (k.toLong, "A")).toSet)
    val (files, _, _) = Iceberg.prunedDataFiles(dir, None,
      colRange = Some(("k", 1000000L, 2000000L)))
    assert(files.size === 1,
      "unusable bounds keep the file, never misprune it")
  }
}
