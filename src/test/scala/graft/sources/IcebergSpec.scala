package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Iceberg v1 reader laws: round trip through a spec-composed table,
  * metadata-only partition pruning (strict subset of manifests AND
  * files), relocation rebasing, version resolution, and loud v2
  * rejection.
  */
class IcebergSpec extends SparkSpec {

  private def fixture(): (String, org.apache.spark.sql.DataFrame) = {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .where(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_shipdate"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_spec").toString
    Iceberg.writeTable(df, dir, "l_returnflag")
    (dir, df)
  }

  test("round trip: a spec-composed v1 table scans back row-identical " +
       "through the metadata walk (hint -> metadata -> manifest list -> " +
       "manifests -> parquet)") {
    val (dir, df) = fixture()
    val back = Iceberg.scan(spark, dir)
    assert(back.schema.fieldNames.toSeq === df.schema.fieldNames.toSeq)
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
  }

  test("metadata-only partition pruning: an identity-partition equality " +
       "probe opens a STRICT subset of manifests and files, and returns " +
       "exactly the partition slice") {
    val (dir, df) = fixture()
    val (allFiles, allRead, allTotal) = Iceberg.prunedDataFiles(dir, None)
    val (rFiles, rRead, rTotal) = Iceberg.prunedDataFiles(dir, Some("R"))
    assert(allRead === allTotal, "no predicate -> every manifest read")
    assert(rTotal === allTotal)
    assert(rRead < allTotal,
      s"pruning must skip manifests: read $rRead of $allTotal")
    assert(rFiles.toSet.subsetOf(allFiles.toSet) &&
      rFiles.size < allFiles.size)
    val got = Iceberg.scan(spark, dir, Some("R"))
      .collect().map(_.toSeq).toSet
    val want = df.filter(col("l_returnflag") === "R")
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got === want)
    // a value outside every bound window prunes ALL manifests — and a
    // fully-pruned SCAN is an empty frame with the table schema, not
    // an error
    val (zFiles, zRead, _) = Iceberg.prunedDataFiles(dir, Some("Z"))
    assert(zFiles.isEmpty && zRead === 0)
    val empty = Iceberg.scan(spark, dir, Some("Z"))
    assert(empty.count() === 0L)
    assert(empty.schema.fieldNames.toSeq === df.schema.fieldNames.toSeq)
  }

  test("relocation: moving the whole table directory rebases the " +
       "absolute URIs recorded in metadata (manifest list, manifests, " +
       "data files)") {
    val (dir, df) = fixture()
    val moved = java.nio.file.Paths.get(dir + "_moved")
    java.nio.file.Files.move(java.nio.file.Paths.get(dir), moved)
    val back = Iceberg.scan(spark, moved.toString)
    assert(back.count() === df.count())
  }

  test("version resolution: version-hint.text wins; without it the max " +
       "vN.metadata.json is current") {
    val (dir, df) = fixture()
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"))
    assert(Iceberg.scan(spark, dir).count() === df.count())
  }

  test("format-version 3 and unsupported transforms are rejected " +
       "loudly, never half-read") {
    val (dir, _) = fixture()
    val metaPath = java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json")
    // the composer wrote via Hadoop's checksummed local FS; rewriting
    // with nio invalidates the .crc sidecar — drop it
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/metadata/.v1.metadata.json.crc"))
    val v1 = new String(java.nio.file.Files.readAllBytes(metaPath), "UTF-8")
    java.nio.file.Files.write(metaPath,
      v1.replace("\"format-version\": 1", "\"format-version\": 3")
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      Iceberg.currentMetadata(dir)
    }
    assert(e.getMessage.contains("format-version"))
    java.nio.file.Files.write(metaPath,
      v1.replace("\"transform\": \"identity\"", "\"transform\": \"void\"")
        .getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      Iceberg.currentMetadata(dir)
    }
    assert(e2.getMessage.contains("transform"))
  }

  test("snapshot append + time travel: appendToTable reuses the prior " +
       "manifests in the new list, the current scan sees the union, " +
       "asOf=1 sees exactly the pre-append table, and pruning still " +
       "skips manifests across both snapshots") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_shipdate"))
    val a = df.where(col("l_orderkey") % 40 === 0)
    val b = df.where(col("l_orderkey") % 20 === 0 &&
      col("l_orderkey") % 40 =!= 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_app_spec").toString
    Iceberg.writeTable(a, dir, "l_returnflag")
    val m1 = Iceberg.manifestList(Iceberg.currentMetadata(dir))
      .map(_.path).toSet
    Iceberg.appendToTable(b, dir)
    val meta2 = Iceberg.currentMetadata(dir)
    assert(meta2.version === 2 && meta2.currentSnapshotId === 2L)
    assert(meta2.snapshots.map(_._1).toSet === Set(1L, 2L))
    // the prior snapshot's manifests ride into the new list VERBATIM
    val m2 = Iceberg.manifestList(meta2).map(_.path).toSet
    assert(m1.subsetOf(m2) && m2.size > m1.size)
    // current scan = union; asOf(1) = pre-append table exactly
    val union = df.where(col("l_orderkey") % 20 === 0)
      .collect().map(_.toSeq).toSet
    assert(Iceberg.scan(spark, dir).collect().map(_.toSeq).toSet === union)
    assert(Iceberg.scan(spark, dir, asOf = Some(1L))
      .collect().map(_.toSeq).toSet === a.collect().map(_.toSeq).toSet)
    // pruning spans both snapshots' manifests
    val (files, read, total) = Iceberg.prunedDataFiles(dir, Some("R"))
    assert(read < total && files.nonEmpty)
    val got = Iceberg.scan(spark, dir, Some("R"))
      .collect().map(_.toSeq).toSet
    assert(got === df.where(col("l_orderkey") % 20 === 0 &&
      col("l_returnflag") === "R").collect().map(_.toSeq).toSet)
    // relocation after build+append still reads (one-move contract)
    val moved = java.nio.file.Paths.get(dir + "_moved")
    java.nio.file.Files.move(java.nio.file.Paths.get(dir), moved)
    assert(Iceberg.scan(spark, moved.toString).count() === union.size)
  }

  test("column-stats file skipping: a sort-clustered table prunes data " +
       "files whose [lower, upper] window misses a range predicate, " +
       "results stay exact, and an unclustered table degrades to " +
       "no-skip (conservative) with the same exact results") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .where(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    val keys = df.select(col("l_orderkey")).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    val (lo, hi) = (keys(keys.length / 8), keys(keys.length / 4))
    val want = df.filter(col("l_orderkey").between(lo, hi))
      .collect().map(_.toSeq).toSet
    // sorted build: files carry disjoint key windows -> real skipping
    val sDir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_stats_spec").toString
    Iceberg.writeTable(df, sDir, "l_returnflag",
      sortBy = Some("l_orderkey"))
    val (all, _, _) = Iceberg.prunedDataFiles(sDir, None)
    val (hit, _, _) = Iceberg.prunedDataFiles(sDir, None,
      colRange = Some(("l_orderkey", lo, hi)))
    assert(hit.nonEmpty && hit.size < all.size,
      s"stats must skip files: ${hit.size} of ${all.size}")
    val got = Iceberg.scan(spark, sDir,
        colRange = Some(("l_orderkey", lo, hi)))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    // unknown predicate column fails loudly
    intercept[IllegalArgumentException] {
      Iceberg.prunedDataFiles(sDir, None,
        colRange = Some(("nope", 0L, 1L)))
    }
    // unsorted build: overlapping windows keep every file, result exact
    val uDir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_nostat_spec").toString
    Iceberg.writeTable(df, uDir, "l_returnflag")
    val gotU = Iceberg.scan(spark, uDir,
        colRange = Some(("l_orderkey", lo, hi)))
      .collect().map(_.toSeq).toSet
    assert(gotU === want)
  }

  test("expireSnapshots cuts history to the current snapshot: the " +
       "current scan is unchanged, the expired snapshot's manifest list " +
       "is deleted, and time travel to it fails loudly") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    val a = df.where(col("l_orderkey") % 40 === 0)
    val b = df.where(col("l_orderkey") % 20 === 0 &&
      col("l_orderkey") % 40 =!= 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_exp_spec").toString
    Iceberg.writeTable(a, dir, "l_returnflag")
    Iceberg.appendToTable(b, dir)
    val oldList = Iceberg.currentMetadata(dir, asOf = Some(1L)).manifestList
    val before = Iceberg.scan(spark, dir).count()
    Iceberg.expireSnapshots(dir)
    val meta = Iceberg.currentMetadata(dir)
    assert(meta.version === 3 && meta.snapshots.map(_._1) === Seq(2L))
    assert(Iceberg.scan(spark, dir).count() === before)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(oldList)))
    intercept[IllegalArgumentException] {
      Iceberg.scan(spark, dir, asOf = Some(1L))
    }
  }

  test("long-typed identity partition: composer bounds + reader pruning " +
       "work on a numeric partition column") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .where(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_linenumber") % 4).as("bucket"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_long_spec").toString
    Iceberg.writeTable(df, dir, "bucket")
    val back = Iceberg.scan(spark, dir)
    assert(back.collect().map(_.toSeq).toSet ===
      df.collect().map(_.toSeq).toSet)
    val (files, read, total) = Iceberg.prunedDataFiles(dir, Some("0"))
    assert(read < total && files.nonEmpty)
    assert(Iceberg.scan(spark, dir, Some("0")).collect().map(_.toSeq).toSet
      === df.where(col("bucket") === 0).collect().map(_.toSeq).toSet)
  }

  test("multi-field identity partitions: a two-column spec composes, " +
       "round-trips, appends, and prunes on either field or both " +
       "(conjunctive bounds)") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .where(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        (col("l_linenumber") % 3).cast("long").as("bucket"))
    val a = df.where(col("l_orderkey") % 20 === 0)
    val b = df.where(col("l_orderkey") % 20 =!= 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_multi_spec").toString
    Iceberg.writeTablePartitioned(a, dir, Seq("l_returnflag", "bucket"))
    Iceberg.appendToTable(b, dir)
    val meta = Iceberg.currentMetadata(dir)
    assert(meta.partFields.map(f => (f.name, f.resType)) ===
      Seq(("l_returnflag", "string"), ("bucket", "long")))
    assert(meta.partFields.forall(_.isIdentity))
    assert(Iceberg.scan(spark, dir).collect().map(_.toSeq).toSet ===
      df.collect().map(_.toSeq).toSet)
    val (fAll, _, total) = Iceberg.prunedDataFiles(dir, None)
    val (f1, r1, _) = Iceberg.prunedDataFiles(dir, Some("R"))
    val (f2, r2, _) = Iceberg.prunedDataFiles(dir, None,
      partitionEqs = Map("bucket" -> "1"))
    val (f3, r3, _) = Iceberg.prunedDataFiles(dir, None,
      partitionEqs = Map("l_returnflag" -> "R", "bucket" -> "1"))
    assert(r1 < total && r2 < total, "each single-field probe prunes")
    assert(r3 <= math.min(r1, r2), "conjunction prunes at least as hard")
    assert(f3.toSet === f1.toSet.intersect(f2.toSet))
    val got = Iceberg.scan(spark, dir,
        partitionEqs = Map("l_returnflag" -> "R", "bucket" -> "1"))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got === df
      .where(col("l_returnflag") === "R" && col("bucket") === 1)
      .collect().map(_.toSeq).toSet)
    // a non-partition column in the predicate map fails loudly
    intercept[IllegalArgumentException] {
      Iceberg.prunedDataFiles(dir, None,
        partitionEqs = Map("l_orderkey" -> "1"))
    }
  }

  test("facade routing: SourceFormat.Iceberg reads through the in-repo " +
       "walker, with iceberg.partitionEq as the pruning option") {
    import graft.engine.{JobSpec, Readers, SourceFormat}
    val (dir, df) = fixture()
    val full = Readers.read(spark, JobSpec(source = dir, target = "t",
      format = Some(SourceFormat.Iceberg)))
    assert(full.count() === df.count())
    val pruned = Readers.read(spark, JobSpec(source = dir, target = "t",
      format = Some(SourceFormat.Iceberg),
      options = Map("iceberg.partitionEq" -> "A")))
    assert(pruned.count() ===
      df.filter(col("l_returnflag") === "A").count())
    // the full pruning surface rides the option map (YAML-drivable):
    // conjunctive multi-field equality, time travel, long-column range
    val eqs = Readers.read(spark, JobSpec(source = dir, target = "t",
      format = Some(SourceFormat.Iceberg),
      options = Map("iceberg.partitionEqs" -> "l_returnflag=R")))
    assert(eqs.count() === df.filter(col("l_returnflag") === "R").count())
    val asOf = Readers.read(spark, JobSpec(source = dir, target = "t",
      format = Some(SourceFormat.Iceberg),
      options = Map("iceberg.asOf" -> "1")))
    assert(asOf.count() === df.count())
    val keys = df.select(col("l_orderkey"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    val (lo, hi) = (keys.head, keys(keys.length / 2))
    val ranged = Readers.read(spark, JobSpec(source = dir, target = "t",
      format = Some(SourceFormat.Iceberg),
      options = Map("iceberg.colRange" -> s"l_orderkey:$lo:$hi")))
    assert(ranged.count() ===
      df.filter(col("l_orderkey").between(lo, hi)).count())
    val srcRanged = Readers.read(spark, JobSpec(source = dir, target = "t",
      format = Some(SourceFormat.Iceberg),
      options = Map("iceberg.sourceRange" -> "l_returnflag:A:N")))
    assert(srcRanged.count() ===
      df.filter(col("l_returnflag").between("A", "N")).count())
  }

  test("snapshot TAGS (v2 refs): tagSnapshot pins a named table state " +
       "that survives retention — expiry keeps the tagged snapshot " +
       "while untagged history inside the trim window is dropped") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    val a = df.where(col("l_orderkey") % 40 === 0)
    val b = df.where(col("l_orderkey") % 40 === 20)
    val c = df.where(col("l_orderkey") % 40 === 10)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_tags").toString
    Iceberg.writeTable(a, dir, "l_returnflag")
    Iceberg.tagSnapshot(dir, "train-run-1") // pins snapshot 1
    Iceberg.appendToTable(b, dir)           // snapshot 2 (untagged)
    Iceberg.appendToTable(c, dir)           // snapshot 3 (current)
    Iceberg.expireSnapshots(dir, retainLast = 1)
    val meta = Iceberg.currentMetadata(dir)
    assert(meta.refs === Map("train-run-1" -> 1L))
    assert(meta.snapshots.map(_._1).sorted === Seq(1L, 3L),
      "tagged snapshot 1 survives, untagged snapshot 2 expires")
    // time travel BY NAME reproduces the pinned training state exactly
    val pinned = Iceberg.scan(spark, dir,
        asOf = Some(meta.refs("train-run-1")))
      .collect().map(_.toSeq).toSet
    assert(pinned === a.collect().map(_.toSeq).toSet)
    // the current scan sees everything; the expired boundary is gone
    assert(Iceberg.scan(spark, dir).count() ===
      a.count() + b.count() + c.count())
    intercept[IllegalArgumentException] {
      Iceberg.scan(spark, dir, asOf = Some(2L)).collect()
    }
    // tagging an unknown snapshot is refused
    intercept[IllegalArgumentException] {
      Iceberg.tagSnapshot(dir, "nope", Some(99L))
    }
  }

  test("DROP COLUMN is metadata-only and a re-added column of the same " +
       "name gets a FRESH field id that never resurrects dropped data " +
       "(the spec's id-reuse prohibition)") {
    val (dir, df) = fixture()
    val oldId = Iceberg.currentMetadata(dir).fieldIds("l_quantity")
    Iceberg.dropColumn(dir, "l_quantity")
    val dropped = Iceberg.scan(spark, dir)
    assert(!dropped.schema.fieldNames.contains("l_quantity"))
    assert(dropped.count() === df.count(), "drop never loses rows")
    // re-add under the same display name: fresh id, all-NULL in every
    // pre-add file even though those files physically carry the bytes
    Iceberg.addColumn(dir, "l_quantity", "double")
    val meta2 = Iceberg.currentMetadata(dir)
    assert(meta2.fieldIds("l_quantity") > oldId, "fresh field id")
    assert(meta2.fileColumn("l_quantity") !== "l_quantity",
      "fresh physical name — old files must not resolve")
    val readd = Iceberg.scan(spark, dir)
    assert(readd.filter(col("l_quantity").isNotNull).count() === 0L,
      "re-added column reads NULL, never the dropped data")
    // appends after the re-add carry values; old rows stay NULL
    Iceberg.appendToTable( // re-added column sits at the schema's end
      df.limit(5).drop("l_quantity").withColumn("l_quantity", lit(999.5)),
      dir)
    val after = Iceberg.scan(spark, dir)
    assert(after.filter(col("l_quantity") === 999.5).count() === 5L)
    assert(after.filter(col("l_quantity").isNull).count() === df.count())
    // dropping a partition source column or the last column is refused
    intercept[IllegalArgumentException] {
      Iceberg.dropColumn(dir, "l_returnflag")
    }
  }

  test("TYPE PROMOTION (int->long, float->double) is metadata-only: " +
       "pre-promotion files read back as the widened type, appends " +
       "write it natively, and a narrowing 'promotion' is refused") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType}
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .where(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey"),
        col("l_linenumber").cast("int").as("l_linenumber"),
        col("l_quantity").cast("float").as("l_quantity"),
        col("l_extendedprice").cast(DecimalType(12, 2)).as("l_price"),
        col("l_returnflag"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_promote").toString
    Iceberg.writeTable(df, dir, "l_returnflag")
    val before = Iceberg.scan(spark, dir)
    assert(before.schema("l_linenumber").dataType === IntegerType)
    assert(before.schema("l_quantity").dataType === FloatType)
    assert(before.schema("l_price").dataType === DecimalType(12, 2))
    Iceberg.promoteColumn(dir, "l_linenumber", "long")
    Iceberg.promoteColumn(dir, "l_quantity", "double")
    Iceberg.promoteColumn(dir, "l_price", "decimal(18, 2)")
    val wide = Iceberg.scan(spark, dir)
    assert(wide.schema("l_linenumber").dataType === LongType)
    assert(wide.schema("l_quantity").dataType === DoubleType)
    assert(wide.schema("l_price").dataType === DecimalType(18, 2))
    // values are the exact widened originals (int->long is lossless,
    // float->double widens the same IEEE value, decimal keeps scale)
    val want = df
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        col("l_quantity").cast("double"),
        col("l_price").cast(DecimalType(18, 2)), col("l_returnflag"))
      .collect().map(_.toSeq).toSet
    assert(wide.collect().map(_.toSeq).toSet === want)
    // post-promotion appends write the wide types; the union scans
    Iceberg.appendToTable(
      df.limit(3)
        .select(col("l_orderkey") + 1000000L,
          col("l_linenumber").cast("long"),
          col("l_quantity").cast("double"),
          col("l_price").cast(DecimalType(18, 2)), col("l_returnflag"))
        .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_price",
          "l_returnflag"),
      dir)
    assert(Iceberg.scan(spark, dir).count() === df.count() + 3)
    // narrowing and sideways moves are refused loudly
    intercept[IllegalArgumentException] {
      Iceberg.promoteColumn(dir, "l_orderkey", "int")
    }
    intercept[IllegalArgumentException] {
      Iceberg.promoteColumn(dir, "l_returnflag", "long")
    }
    intercept[IllegalArgumentException] { // scale change is NOT legal
      Iceberg.promoteColumn(dir, "l_price", "decimal(20, 4)")
    }
  }

  test("metadata history: every bump appends a metadata-log entry " +
       "naming its predecessor file (the spec's table-history chain " +
       "foreign tooling walks), last-updated-ms advances " +
       "deterministically, and snapshot summaries carry the spec's " +
       "added-data-files / added-records counts matching the write") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val (dir, df) = fixture()
    def metaRoot(v: Int) = om.readTree(
      new java.io.File(s"$dir/metadata/v$v.metadata.json"))
    // v1 (build): summary counts match the composed write exactly
    val v1 = metaRoot(1)
    val s1 = v1.path("snapshots").get(0).path("summary")
    assert(s1.path("added-records").asText().toLong === df.count())
    val (allFiles, _, _) = Iceberg.prunedDataFiles(dir, None)
    assert(s1.path("added-data-files").asText().toLong ===
      allFiles.size.toLong)
    // v2 (append): the log's single entry names v1; the new
    // snapshot's counts are the APPENDED shard's, not the table's
    val extra = spark.read.parquet(sf() + "/lineitem.parquet")
      .where(col("l_orderkey") % 20 === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_shipdate"))
    Iceberg.appendToTable(extra, dir)
    val v2 = metaRoot(2)
    val log2 = v2.path("metadata-log")
    assert(log2.size() === 1)
    assert(log2.get(0).path("metadata-file").asText()
      .endsWith("v1.metadata.json"))
    val snaps2 = v2.path("snapshots")
    val s2 = snaps2.get(snaps2.size() - 1).path("summary")
    assert(s2.path("operation").asText() === "append")
    assert(s2.path("added-records").asText().toLong === extra.count())
    val (files2, _, _) = Iceberg.prunedDataFiles(dir, None)
    assert(s2.path("added-data-files").asText().toLong ===
      (files2.size - allFiles.size).toLong)
    // v3 (metadata-only rename): the log CHAINS — v3 appends v2
    // after v1's entry — and last-updated-ms advances monotonically
    Iceberg.renameColumn(dir, "l_quantity", "qty")
    val v3 = metaRoot(3)
    val log3 = v3.path("metadata-log")
    assert(log3.size() === 2)
    assert(log3.get(1).path("metadata-file").asText()
      .endsWith("v2.metadata.json"))
    assert(v3.path("last-updated-ms").asLong() >
      v2.path("last-updated-ms").asLong())
    // the chain is pure bookkeeping: the table still scans exactly
    val back = Iceberg.scan(spark, dir)
    assert(back.count() === df.count() + extra.count())
    assert(back.schema.fieldNames.contains("qty"))
  }
}
