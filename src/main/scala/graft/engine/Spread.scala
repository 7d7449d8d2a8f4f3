package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate,
  Join, RepartitionOperation, Sort, Window}

/** Scan-parallelism guard for compute-heavy narrow stages.
  *
  * Spark sizes scan tasks by bytes (`spark.sql.files.maxPartitionBytes`),
  * which is right for I/O-bound scans but wrong for CPU-bound per-row
  * work over small-on-disk inputs: a few-MB parquet file arrives as ONE
  * task, and a shingling/hashing/quantization pass then runs on one core
  * of the whole cluster. Parquet row-group granularity means lowering
  * maxPartitionBytes cannot split such a file, so the fix is an explicit
  * round-robin repartition to cluster parallelism.
  *
  * The repartition is gated, not unconditional:
  *   - inputs already at least as parallel as the cluster pass through
  *     untouched — at 100 TB a table arrives as tens of thousands of
  *     splits and this helper is a provable no-op (no extra shuffle);
  *   - tiny inputs (< `minBytes` by plan statistics, e.g. dimension
  *     tables destined for a broadcast) pass through untouched — the
  *     shuffle would cost more than the compute it parallelizes.
  *
  * The shuffled payload is the raw input (docs/vectors), which is orders
  * of magnitude smaller than the exploded intermediates (shingle posting
  * lists, quantized products) produced AFTER the repartition.
  */
object Spread {

  /** Hash-repartition by `cols` at the session's shuffle-partition
    * count, EXPLICITLY. A count-less `repartition(cols…)` is eligible
    * for AQE partition coalescing, which is byte-based and therefore
    * blind to downstream per-row CPU: every few-MB memo barrier in the
    * engine (quantized vectors, posting lists, banded keys) was being
    * folded to 1-4 tasks that then carried the expensive scoring /
    * enumeration stage alone. The explicit count pins the pre-AQE
    * planner parallelism — the same value a groupBy on the key would
    * get — so co-partitioned consumers still reuse the exchange, and
    * the session conf keeps it cluster-tunable.
    */
  def byKey(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      cols: _*)

  /** Below this optimizer-estimated size, repartitioning is not worth a
    * shuffle (the input is dimension-table sized).
    */
  val MinBytes: Long = 256L * 1024

  /** Parallelism is estimated from the OPTIMIZED LOGICAL plan only —
    * never `df.rdd.getNumPartitions`, which finalizes the physical plan
    * and under AQE eagerly EXECUTES every upstream shuffle stage at
    * plan-build time (those stages would then run twice: once for the
    * probe, once in the real job).
    *
    *   - a plan containing any shuffle-inducing operator (aggregate,
    *     join, sort, window, distinct, explicit repartition) already
    *     emerges at `spark.sql.shuffle.partitions` parallelism — pass
    *     through untouched;
    *   - a narrow chain over a file scan parallelizes at roughly
    *     sizeInBytes / maxPartitionBytes tasks — if that estimate falls
    *     short of cluster parallelism, round-robin repartition (this is
    *     exactly the small-file single-row-group case Spread exists for).
    */
  def apply(df: DataFrame, minBytes: Long = MinBytes): DataFrame = {
    // streaming frames pass through: probing optimizedPlan would trip the
    // batch-only analysis check, and micro-batch parallelism is governed
    // by the source trigger options, not scan-task byte sizing. Narrow
    // operators built on Spread therefore compose on streams unchanged.
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val plan = df.queryExecution.optimizedPlan
    val bytes = plan.stats.sizeInBytes
    val alreadyShuffled = plan.exists {
      case _: Aggregate | _: Join | _: Sort | _: Window | _: Deduplicate |
           _: RepartitionOperation => true
      case _ => false
    }
    if (alreadyShuffled || bytes < minBytes) df
    else {
      val maxSplit = BigInt(
        spark.sessionState.conf.filesMaxPartitionBytes).max(BigInt(1))
      val estScanTasks = (bytes + maxSplit - 1) / maxSplit
      if (estScanTasks < target) df.repartition(target) else df
    }
  }
}
