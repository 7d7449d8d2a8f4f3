package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection CLI: prints the formatted physical plan for the given
  * queries (default: a pushdown/broadcast-sensitive subset) so plan
  * regressions are visible. Usage:
  *   graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_filter", "q1_agg", "q_join_star", "q_topk",
        "ingest_lineitem", "q_join_range", "q_event_sliding",
        "q_dedup_lsh", "q_topk_agg")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
