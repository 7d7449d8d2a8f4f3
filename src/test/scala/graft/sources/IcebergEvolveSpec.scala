package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Partition-spec EVOLUTION laws: a table re-partitioned mid-life
  * keeps every already-committed manifest decodable (and prunable)
  * under the spec it was written with, lays new snapshots out under
  * the new default, probes prune per-spec with row filters recovering
  * exactness where a spec lacks (or transforms) the probed column,
  * and compaction migrates the whole layout to the new default.
  * Write/read devices: `Iceberg.evolvePartitionSpec` +
  * per-manifest `partition_spec_id` resolution.
  */
class IcebergEvolveSpec extends SparkSpec {

  private def orders = spark.read.parquet(sf() + "/orders.parquet")
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"))

  /** identity(o_orderstatus) build of slice A, evolve to
    * day(o_orderdate), append slice B under the new layout.
    */
  private def evolvedFixture(): (String,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val a = orders.where(col("o_orderkey") % 4 === 0)
    val b = orders.where(col("o_orderkey") % 4 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_evolve").toString
    Iceberg.writeTable(a, dir, "o_orderstatus")
    Iceberg.evolvePartitionSpec(dir, Seq(("o_orderdate", "day")))
    Iceberg.appendToTable(b, dir)
    (dir, a, b)
  }

  test("evolution is metadata-only and layout-splitting: the new spec " +
       "becomes the default, OLD manifests keep spec 0 / NEW manifests " +
       "carry spec 1, and the full scan is the exact union") {
    val (dir, a, b) = evolvedFixture()
    val meta = Iceberg.currentMetadata(dir)
    assert(meta.defaultSpecId === 1)
    assert(meta.specs.keySet === Set(0, 1))
    assert(meta.specs(0).map(f => (f.sourceCol, f.transform)) ===
      Seq(("o_orderstatus", "identity")))
    assert(meta.specs(1).map(f => (f.sourceCol, f.transform)) ===
      Seq(("o_orderdate", "day")))
    val mans = Iceberg.manifestList(meta).filter(_.content == 0)
    assert(mans.exists(_.specId == 0) && mans.exists(_.specId == 1),
      s"expected manifests of both specs, got ${mans.map(_.specId)}")
    val got = Iceberg.scan(spark, dir).collect().map(_.toSeq).toSet
    val want = a.unionAll(b).collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("probes prune PER SPEC: an o_orderstatus equality prunes the " +
       "spec-0 manifests (strict subset) while keeping every spec-1 " +
       "manifest, a day-window sourceRange prunes the spec-1 side, and " +
       "both results are exact via the residual row filter") {
    val (dir, a, b) = evolvedFixture()
    val meta = Iceberg.currentMetadata(dir)
    val mans = Iceberg.manifestList(meta).filter(_.content == 0)
    val n0 = mans.count(_.specId == 0)
    val n1 = mans.count(_.specId == 1)
    // equality on the OLD spec's source: every spec-1 manifest is
    // conservatively kept, so pruning must come from the spec-0 side
    val (_, readF, totalF) = Iceberg.prunedDataFiles(
      dir, None, partitionEqs = Map("o_orderstatus" -> "F"))
    assert(totalF === n0 + n1)
    assert(readF < totalF && readF >= n1,
      s"status probe: read $readF of $totalF (spec0=$n0 spec1=$n1)")
    val gotF = Iceberg.scan(spark, dir,
        partitionEqs = Map("o_orderstatus" -> "F"))
      .collect().map(_.toSeq).toSet
    assert(gotF === a.unionAll(b).where(col("o_orderstatus") === "F")
      .collect().map(_.toSeq).toSet)
    // day window on the NEW spec's source: spec-0 manifests are all
    // kept, spec-1 manifests prune against their day bounds
    val lo = "1995-02-01"; val hi = "1995-02-14"
    val (_, readD, totalD) = Iceberg.prunedDataFiles(
      dir, None, sourceRange = Some(("o_orderdate", lo, hi)))
    assert(totalD === n0 + n1)
    assert(readD < totalD && readD >= n0,
      s"day probe: read $readD of $totalD (spec0=$n0 spec1=$n1)")
    val gotD = Iceberg.scan(spark, dir,
        sourceRange = Some(("o_orderdate", lo, hi)))
      .collect().map(_.toSeq).toSet
    assert(gotD.nonEmpty)
    assert(gotD === a.unionAll(b)
      .where(col("o_orderdate").between(
        lit(lo).cast("timestamp"), lit(hi).cast("timestamp")))
      .collect().map(_.toSeq).toSet)
    // a column NO spec in the history partitions by is a typo, not a
    // coarse probe — loud refusal
    intercept[IllegalArgumentException] {
      Iceberg.prunedDataFiles(dir, None,
        partitionEqs = Map("o_totalprice" -> "1"))
    }
  }

  test("compaction is the layout migration: after compactTable every " +
       "data manifest carries the NEW default spec, the day probe " +
       "prunes the whole table, the old-spec probe stays exact " +
       "(row-filtered), and nothing changes any answer") {
    val (dir, a, b) = evolvedFixture()
    val want = a.unionAll(b).collect().map(_.toSeq).toSet
    Iceberg.compactTable(spark, dir)
    val meta = Iceberg.currentMetadata(dir)
    val mans = Iceberg.manifestList(meta).filter(_.content == 0)
    assert(mans.nonEmpty && mans.forall(_.specId == 1),
      s"post-compact spec ids: ${mans.map(_.specId).distinct}")
    assert(Iceberg.scan(spark, dir).collect().map(_.toSeq).toSet === want)
    val (_, readD, totalD) = Iceberg.prunedDataFiles(
      dir, None, sourceRange = Some(("o_orderdate",
        "1995-02-01", "1995-02-14")))
    assert(readD < totalD, s"post-compact day probe: $readD of $totalD")
    val gotF = Iceberg.scan(spark, dir,
        partitionEqs = Map("o_orderstatus" -> "F"))
      .collect().map(_.toSeq).toSet
    assert(gotF === a.unionAll(b).where(col("o_orderstatus") === "F")
      .collect().map(_.toSeq).toSet)
  }

  test("bare-v1 interop: evolving a foreign table that carries ONLY " +
       "the deprecated top-level partition-spec materializes it as " +
       "spec 0 first — old manifests keep decoding (and pruning) " +
       "under it instead of misreading through the new default") {
    val a = orders.where(col("o_orderkey") % 4 === 0)
    val b = orders.where(col("o_orderkey") % 4 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_barev1").toString
    Iceberg.writeTable(a, dir, "o_orderstatus")
    // strip the table to the bare-v1 shape a minimal foreign writer
    // produces: top-level partition-spec only
    val mp = java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(mp))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    root.remove("partition-specs")
    root.remove("default-spec-id")
    java.nio.file.Files.write(mp, om.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root).getBytes("UTF-8"))
    // drop the Hadoop-FS checksum sibling the out-of-band edit broke
    java.nio.file.Files.deleteIfExists(
      mp.resolveSibling(".v1.metadata.json.crc"))
    assert(Iceberg.currentMetadata(dir).specs.keySet === Set(0))
    Iceberg.evolvePartitionSpec(dir, Seq(("o_orderdate", "day")))
    Iceberg.appendToTable(b, dir)
    val meta = Iceberg.currentMetadata(dir)
    assert(meta.specs.keySet === Set(0, 1))
    assert(meta.specs(0).map(f => (f.sourceCol, f.transform)) ===
      Seq(("o_orderstatus", "identity")))
    // the old-spec probe still prunes spec-0 manifests AND returns
    // the exact slice — the misdecode would surface right here
    val gotF = Iceberg.scan(spark, dir,
        partitionEqs = Map("o_orderstatus" -> "F"))
      .collect().map(_.toSeq).toSet
    assert(gotF === a.unionAll(b).where(col("o_orderstatus") === "F")
      .collect().map(_.toSeq).toSet)
    val (_, read, total) = Iceberg.prunedDataFiles(
      dir, None, partitionEqs = Map("o_orderstatus" -> "F"))
    assert(read < total)
  }

  test("guards: a partition source of ANY spec (old or new) refuses " +
       "rename and drop — old manifests must stay decodable — and a " +
       "renamed column cannot become a new spec's source") {
    val (dir, _, _) = evolvedFixture()
    // o_orderstatus is only a source of the RETIRED spec 0 — still
    // protected (its manifests still decode by it)
    intercept[IllegalArgumentException] {
      Iceberg.renameColumn(dir, "o_orderstatus", "status")
    }
    intercept[IllegalArgumentException] {
      Iceberg.dropColumn(dir, "o_orderstatus")
    }
    intercept[IllegalArgumentException] {
      Iceberg.renameColumn(dir, "o_orderdate", "odate")
    }
    // a renamed NON-partition column: files keep the old physical
    // name, so it cannot source a new spec in this subset
    Iceberg.renameColumn(dir, "o_custkey", "cust")
    intercept[IllegalArgumentException] {
      Iceberg.evolvePartitionSpec(dir, Seq(("cust", "bucket[4]")))
    }
  }
}
