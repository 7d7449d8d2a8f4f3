package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iceberg composer scale harness (PLANS.md evidence): composes the
  * same frame as a 3-tuple and a 101-tuple identity-partitioned
  * table, reporting SPARK JOB COUNT and wall seconds for each — the
  * round-13 law is jobs(101 tuples) == jobs(3 tuples) (one partitionBy
  * write + one distributed footer-stats job), where the round-12
  * composer ran one write job per tuple plus a driver footer walk.
  * Also times appendToTable and deleteWhere on the wide table.
  *
  * Usage: scripts/run.sh graft.tools.IceScale /root/testdata/sf0.01
  */
object IceScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))

    def run(tag: String, mod: Int, sortBy: Option[String]): String = {
      val df = li.withColumn("k", (col("l_orderkey") % mod).cast("long"))
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_icescale_$tag").toString + "/tbl"
      val group = s"icescale-$tag"
      spark.sparkContext.setJobGroup(group, group, false)
      val t0 = System.nanoTime()
      graft.sources.Iceberg.writeTable(df, dir, "k", sortBy = sortBy)
      val secs = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      val jobs = spark.sparkContext.statusTracker
        .getJobIdsForGroup(group).length
      val meta = graft.sources.Iceberg.currentMetadata(dir)
      val tuples = graft.sources.Iceberg.manifestList(meta).size
      println(f"$tag%-14s tuples=$tuples%4d jobs=$jobs%2d wall=$secs%6.2fs")
      dir
    }

    run("tuples3", 3, None)
    val wide = run("tuples101", 101, None)
    run("tuples101sort", 101, Some("l_orderkey"))

    // append + v2 delete on the 101-tuple table
    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$tag%-14s wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    timed("append") {
      graft.sources.Iceberg.appendToTable(
        li.withColumn("k", (col("l_orderkey") % 101).cast("long"))
          .where(col("l_linenumber") === 1), wide)
    }
    timed("deleteWhere") {
      graft.sources.Iceberg.deleteWhere(spark, wide,
        col("l_quantity") > 45.0)
    }
    timed("scanAfterDel") {
      println("rows=" + graft.sources.Iceberg.scan(spark, wide).count())
    }

    // ---- realistic day-partition cardinality: day(o_orderdate) over
    //      the FULL orders table (~2400 daily tuples over the TPC-H
    //      date range) — the shape a real lakehouse table has. Checks
    //      the one-write-job law at 20x the 101-tuple census and
    //      measures the driver-side manifest-composition tail. ----
    {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderdate"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_icescale_days").toString + "/tbl"
      val group = "icescale-days"
      spark.sparkContext.setJobGroup(group, group, false)
      val t0 = System.nanoTime()
      graft.sources.Iceberg.writeTableTransformed(orders, dir,
        Seq(("o_orderdate", "day")))
      val secs = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      val jobs = spark.sparkContext.statusTracker
        .getJobIdsForGroup(group).length
      val meta = graft.sources.Iceberg.currentMetadata(dir)
      val tuples = graft.sources.Iceberg.manifestList(meta).size
      println(f"daysFull       tuples=$tuples%4d jobs=$jobs%2d " +
        f"wall=$secs%6.2fs")
      val t1 = System.nanoTime()
      val (_, read, total) = graft.sources.Iceberg.prunedDataFiles(dir,
        None, sourceRange = Some(("o_orderdate",
          "1996-02-01", "1996-02-14")))
      println(f"daysFullProbe  read=$read%4d of $total%4d " +
        f"wall=${(System.nanoTime() - t1) / 1e9}%6.2fs")
    }

    // ---- stacked-upsert merge-on-read depth (the CDC-feed shape):
    //      one anti-join tier per equality-delete commit until
    //      compaction folds them. Measures scan wall + executed-plan
    //      anti-join count at 1/10/25/50 stacked upserts, then after
    //      one compactTable — the evidence behind the compactEvery
    //      knob's default guidance. ----
    {
      val base = li.where(col("l_orderkey") % 4 === 0)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_icescale_ups").toString + "/tbl"
      graft.sources.Iceberg.writeTable(base, dir, "l_returnflag")
      def measure(tag: String): Unit = {
        val t0 = System.nanoTime()
        val scan = graft.sources.Iceberg.scan(spark, dir)
        val rows = scan.count()
        val wall = (System.nanoTime() - t0) / 1e9
        // AQE: read the final plan AFTER execution
        val plan = scan.queryExecution.executedPlan.toString
        val tiers = "LeftAnti".r.findAllIn(plan).length
        println(f"$tag%-14s rows=$rows%8d antiJoins=$tiers%3d " +
          f"scanWall=$wall%6.2fs")
      }
      var done = 0
      for (k <- Seq(1, 10, 25, 50)) {
        while (done < k) {
          // rotating key slices: each commit retires a different sliver
          val batch = base
            .where(col("l_orderkey") % 200 === (done % 50) * 4)
            .withColumn("l_quantity", col("l_quantity") + done + 1.0)
          graft.sources.Iceberg.upsertTable(batch, dir,
            Seq("l_orderkey", "l_linenumber"))
          done += 1
        }
        measure(s"upserts$k")
      }
      timed("compact") {
        graft.sources.Iceberg.compactTable(spark, dir)
      }
      measure("postCompact")
    }

    // ---- branch staging depth (the WAP shape): 50 commits staged on
    //      a branch, then one fastForward publish. Measures the
    //      staged-append cost (== a main append: base-list copy +
    //      composer), the STATELESS parent-walk depth check at depth
    //      50 (what appendStaged runs per batch), and the publish
    //      (one metadata commit regardless of staged volume). ----
    {
      val base = li.where(col("l_orderkey") % 4 === 0)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_icescale_wap").toString + "/tbl"
      graft.sources.Iceberg.writeTable(base, dir, "l_returnflag")
      graft.sources.Iceberg.createBranch(dir, "staging")
      timed("stage50") {
        for (i <- 1 to 50) {
          val batch = li.where(col("l_orderkey") % 4 === 1 &&
            col("l_orderkey") % 200 === (i * 4 + 1) % 200)
          graft.sources.Iceberg.appendToTable(batch, dir,
            branch = Some("staging"))
        }
      }
      val t1 = System.nanoTime()
      val m = graft.sources.Iceberg.currentMetadata(dir)
      var cur = m.refs("staging"); var depth = 0
      while (cur != m.currentSnapshotId && m.parents.contains(cur)) {
        cur = m.parents(cur); depth += 1
      }
      println(f"depthWalk      depth=$depth%3d " +
        f"wall=${(System.nanoTime() - t1) / 1e9}%6.2fs")
      timed("publish") {
        graft.sources.Iceberg.fastForward(dir, "staging")
      }
      timed("scanPublished") {
        println("rows=" + graft.sources.Iceberg.scan(spark, dir).count())
      }
    }
    spark.stop()
  }
}
