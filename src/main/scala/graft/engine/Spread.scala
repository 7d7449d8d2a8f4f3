package graft.engine

import org.apache.spark.sql.DataFrame

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

  /** Below this optimizer-estimated size, repartitioning is not worth a
    * shuffle (the input is dimension-table sized).
    */
  val MinBytes: Long = 256L * 1024

  def apply(df: DataFrame, minBytes: Long = MinBytes): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= minBytes && df.rdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }
}
