package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.IcebergBucketHash

/** Non-identity partition transforms (bucket[N], truncate[W], year,
  * month, day, hour): the PUBLIC spec's published test vectors pin the
  * hash and ordinal arithmetic, write==probe laws pin that the
  * composer's layout column and the planner's probe transform agree
  * bit-for-bit, and strict-subset pruning laws (the q_iceberg_prune
  * device) pin that point AND range probes prune at the manifest level
  * before any data file opens.
  */
class IcebergTransformSpec extends SparkSpec {

  test("spec test vectors: murmur3_x86_32 hashes and transform " +
       "ordinals match the Iceberg spec's published appendix values") {
    // hash vectors (spec Appendix B: 32-bit Murmur3, seed 0)
    assert(IcebergBucketHash.hashLong(34L) === 2017239379)
    assert(IcebergBucketHash.murmur3(
      "iceberg".getBytes("UTF-8")) === 1210000089)
    assert(IcebergBucketHash.hashLong(17486L) === -653330422) // date
    assert(IcebergBucketHash.hashLong(1510871468000000L)
      === -2047944441) // timestamp micros 2017-11-16T22:31:08
    // transform ordinals (spec Partition Transforms examples)
    def f(tr: String, srcType: String) =
      Iceberg.PartField.of("p", "c", tr, srcType)
    assert(Iceberg.transformValue(f("day", "date"), "2017-11-16")
      === 17486)
    assert(Iceberg.transformValue(f("year", "date"), "2017-11-16")
      === 47)
    assert(Iceberg.transformValue(f("month", "date"), "2017-11-16")
      === 574)
    assert(Iceberg.transformValue(
      f("hour", "timestamp"), "2017-11-16 22:31:08") === 419686)
    assert(Iceberg.transformValue(f("truncate[10]", "long"), "1") === 0L)
    assert(Iceberg.transformValue(f("truncate[10]", "long"), "-1")
      === -10L)
    assert(Iceberg.transformValue(f("truncate[3]", "string"), "iceberg")
      === "ice")
    assert(Iceberg.transformValue(f("bucket[16]", "long"), "34")
      === (2017239379 & Int.MaxValue) % 16)
    // unsupported transforms and source types fail loudly
    intercept[IllegalArgumentException] {
      Iceberg.PartField.of("p", "c", "void", "long")
    }
    intercept[IllegalArgumentException] {
      Iceberg.PartField.of("p", "c", "hour", "date")
    }
    intercept[IllegalArgumentException] {
      Iceberg.PartField.of("p", "c", "truncate[4]", "timestamp")
    }
  }

  test("write==probe agreement: for every transform the composer's " +
       "recorded partition values equal the driver-side probe " +
       "transform of the source values (both prune paths share one " +
       "arithmetic)") {
    import spark.implicits._
    val df = Seq(
      (34L, "iceberg", "2017-11-16 22:31:08"),
      (-1L, "alpha", "1995-03-07 01:02:03"),
      (1234567L, "zebra", "2001-08-01 00:00:00"))
      .toDF("k", "s", "t_raw")
      .withColumn("ts", col("t_raw").cast("timestamp")).drop("t_raw")
    for ((src, tr, probes) <- Seq(
        ("k", "bucket[16]", Seq("34", "-1", "1234567")),
        ("k", "truncate[100]", Seq("34", "-1", "1234567")),
        ("s", "bucket[8]", Seq("iceberg", "alpha", "zebra")),
        ("s", "truncate[2]", Seq("iceberg", "alpha", "zebra")),
        ("ts", "year", Seq("2017-11-16 22:31:08", "1995-03-07 01:02:03")),
        ("ts", "month", Seq("2017-11-16 22:31:08")),
        ("ts", "day", Seq("2017-11-16 22:31:08", "2001-08-01 00:00:00")),
        ("ts", "hour", Seq("2017-11-16 22:31:08")))) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_ice_tr_${tr.takeWhile(_ != '[')}")
        .toString
      Iceberg.writeTableTransformed(df, dir, Seq((src, tr)))
      val meta = Iceberg.currentMetadata(dir)
      val pf = meta.partFields.head
      assert(pf.transform === tr && pf.sourceCol === src)
      // every recorded partition value is the probe transform of SOME
      // source value, and each probe maps into the recorded set
      val recorded = Iceberg.manifestList(meta)
        .flatMap(m => Iceberg.manifestEntries(m.path, meta))
        .flatMap(_.partition.get(pf.name)).toSet
      val probed = probes.map(Iceberg.transformValue(pf, _)).toSet
      assert(probed.subsetOf(recorded),
        s"$tr: probed $probed not within recorded $recorded")
      // and a point probe returns exactly the matching source rows
      val want = df.filter(col(src) === lit(probes.head)
          .cast(df.schema(src).dataType))
        .collect().map(_.toSeq).toSet
      val got = Iceberg.scan(spark, dir,
          partitionEqs = Map(src -> probes.head))
        .collect().map(_.toSeq).toSet
      assert(got === want, s"$tr: probe ${probes.head}")
    }
  }

  test("bucket[N] pruning law: a point probe on the source key opens " +
       "a STRICT subset of manifests and files and returns exactly " +
       "the key's rows") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .where(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ice_bucket").toString
    Iceberg.writeTableTransformed(df, dir, Seq(("l_orderkey", "bucket[8]")))
    val (allFiles, allRead, allTotal) = Iceberg.prunedDataFiles(dir, None)
    assert(allRead === allTotal && allTotal >= 8,
      s"expected >= 8 bucket manifests, got $allTotal")
    val key = df.select(min(col("l_orderkey")))
      .collect().head.getLong(0)
    val (kFiles, kRead, kTotal) =
      Iceberg.prunedDataFiles(dir, None,
        partitionEqs = Map("l_orderkey" -> key.toString))
    assert(kTotal === allTotal)
    assert(kRead < allTotal,
      s"bucket probe must prune manifests: read $kRead of $allTotal")
    assert(kFiles.toSet.subsetOf(allFiles.toSet) &&
      kFiles.size < allFiles.size)
    // exactness: the probe's scan filters the bucket down to the key
    val got = Iceberg.scan(spark, dir,
        partitionEqs = Map("l_orderkey" -> key.toString))
      .collect().map(_.toSeq).toSet
    val want = df.filter(col("l_orderkey") === key)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got === want)
  }

  test("day transform pruning law: point AND range probes on the " +
       "source timestamp open strict subsets of manifests/files and " +
       "return exactly the window's rows") {
    val df = spark.read.parquet(sf() + "/orders.parquet")
      .where(col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ice_days").toString
    Iceberg.writeTableTransformed(df, dir, Seq(("o_orderdate", "day")))
    val (allFiles, _, allTotal) = Iceberg.prunedDataFiles(dir, None)
    assert(allTotal >= 30, s"expected >= 30 day manifests, got $allTotal")
    // point probe: one actual timestamp value (the testdata carries
    // time-of-day components — a probe is "source == value", so the
    // value must exist; the DAY transform still prunes to its day)
    val probeTs = df
      .filter(col("o_orderdate") >= lit("1995-02-01").cast("timestamp"))
      .select(date_format(min(col("o_orderdate")),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect().head.getString(0)
    val (dFiles, dRead, _) = Iceberg.prunedDataFiles(dir, None,
      partitionEqs = Map("o_orderdate" -> probeTs))
    assert(dRead < allTotal && dFiles.size < allFiles.size)
    val gotDay = Iceberg.scan(spark, dir,
        partitionEqs = Map("o_orderdate" -> probeTs))
      .collect().map(_.toSeq).toSet
    val wantDay = df.filter(col("o_orderdate") ===
        lit(probeTs).cast("timestamp"))
      .collect().map(_.toSeq).toSet
    assert(gotDay.nonEmpty && gotDay === wantDay)
    // range probe: a two-week window through the order-preserving
    // transform ([lo, hi] maps to [day(lo), day(hi)])
    val (rFiles, rRead, _) = Iceberg.prunedDataFiles(dir, None,
      sourceRange = Some(("o_orderdate", "1995-02-01", "1995-02-14")))
    assert(rRead < allTotal,
      s"range probe must prune manifests: read $rRead of $allTotal")
    assert(rFiles.toSet.subsetOf(allFiles.toSet) &&
      rFiles.size < allFiles.size)
    assert(dFiles.toSet.subsetOf(rFiles.toSet),
      "the point day's files sit inside the range window's")
    val gotR = Iceberg.scan(spark, dir,
        sourceRange = Some(("o_orderdate", "1995-02-01", "1995-02-14")))
      .collect().map(_.toSeq).toSet
    val wantR = df.filter(col("o_orderdate").between(
        lit("1995-02-01").cast("timestamp"),
        lit("1995-02-14").cast("timestamp")))
      .collect().map(_.toSeq).toSet
    assert(gotR.nonEmpty && gotR === wantR)
    // a range on a bucket field is refused (not order-preserving)
    val bdir = java.nio.file.Files
      .createTempDirectory("graft_ice_bucket_rng").toString
    Iceberg.writeTableTransformed(df, bdir, Seq(("o_orderkey", "bucket[4]")))
    intercept[IllegalArgumentException] {
      Iceberg.prunedDataFiles(bdir, None,
        sourceRange = Some(("o_orderkey", "1", "100")))
    }
  }

  test("transformed tables compose with the full lifecycle: append, " +
       "upsert, deleteWhere, compaction — the scan stays closed-form " +
       "at every stage") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    val a = df.where(col("l_orderkey") % 40 === 0)
    val b = df.where(col("l_orderkey") % 40 === 20)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ice_tr_life").toString
    Iceberg.writeTableTransformed(a, dir, Seq(("l_orderkey", "bucket[4]")))
    Iceberg.appendToTable(b, dir)
    assert(Iceberg.scan(spark, dir).count() === a.count() + b.count())
    val up = a.limit(7).withColumn("l_quantity", lit(777.0))
    Iceberg.upsertTable(up, dir, Seq("l_orderkey", "l_linenumber"))
    assert(Iceberg.scan(spark, dir)
      .filter(col("l_quantity") === 777.0).count() === 7L)
    Iceberg.deleteWhere(spark, dir, col("l_quantity") === 777.0)
    assert(Iceberg.scan(spark, dir)
      .filter(col("l_quantity") === 777.0).count() === 0L)
    val before = Iceberg.scan(spark, dir).collect().map(_.toSeq).toSet
    Iceberg.compactTable(spark, dir)
    val after = Iceberg.scan(spark, dir).collect().map(_.toSeq).toSet
    assert(after === before, "compaction never changes answers")
    // pruning still works after the rewrite
    val key = a.select(min(col("l_orderkey"))).collect().head.getLong(0)
    val (_, read, total) = Iceberg.prunedDataFiles(dir, None,
      partitionEqs = Map("l_orderkey" -> key.toString))
    assert(read < total, s"post-compaction probe read $read of $total")
  }
}
