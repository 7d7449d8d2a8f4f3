package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical anomaly detection over a grouped value column.
  *
  * The moments come from ONE exact-decimal aggregation pass (the q_stats
  * sum-of-squares machinery: decimal sums are associative, so partial
  * aggregation is safe and the derived mean/sd are the identical IEEE
  * doubles on any engine/partitioning). The tiny stats table is then
  * broadcast back over the facts — at 100 TB this is one scan plus a
  * map-side join; the facts are never re-shuffled.
  *
  * The same stats snapshot drives the streaming twin
  * (graft.streaming.EventStream.detectAnomalies): production refreshes
  * the snapshot with this batch aggregation on a schedule while the
  * stream scores each micro-batch against it statelessly.
  */
object Anomaly {

  /** Per-group (n, mean, sd) from exact decimal sums of `value`
    * (sample standard deviation). `value` must fit DECIMAL(18,6).
    */
  def groupStats(df: DataFrame, group: String, value: String): DataFrame = {
    val x = col(value).cast("decimal(18,6)")
    df.groupBy(col(group))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum((x * x).cast("decimal(28,12)")).cast("double").as("sxx"))
      .withColumn("mean", col("sx") / col("n"))
      .withColumn("sd",
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
          (col("n") - 1)))
      .select(col(group), col("n"), col("mean"), col("sd"))
  }

  /** Rows whose |z| exceeds `threshold` against the given stats
    * snapshot; emits the raw z column (callers round for display).
    */
  def zOutliers(df: DataFrame, stats: DataFrame, group: String,
                value: String, threshold: Double): DataFrame =
    df.join(broadcast(stats.select(col(group), col("mean"), col("sd"))),
        Seq(group))
      .withColumn("z", (col(value) - col("mean")) / col("sd"))
      .filter(abs(col("z")) > threshold)
}
