package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Runtime row-level filtering: when a selective dimension predicate
  * exists, Spark can build a bloom filter from the dimension side and
  * push it into the fact scan (InjectRuntimeFilter) — at 100 TB this
  * prunes fact rows BEFORE the join shuffle, often by orders of
  * magnitude. The thresholds here only shrink the size gates to fire at
  * test scale; the rewrite itself is the stock optimizer rule.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim predicate injects a bloom filter into the fact side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: runtime filtering is what saves the shuffle
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = spark.read.parquet(sf() + "/lineitem.parquet")
      val sup = spark.read.parquet(sf() + "/supplier.parquet")
        .filter(col("s_suppkey") <= 3)
      val j = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("s_name")).count()
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p)
      // and the filtered plan still returns the right rows
      assert(j.collect().map(_.getLong(1)).sum > 0)
    }
  }

  test("without the rule the same join has no bloom probe (guard against " +
       "asserting vacuously)") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = spark.read.parquet(sf() + "/lineitem.parquet")
      val sup = spark.read.parquet(sf() + "/supplier.parquet")
        .filter(col("s_suppkey") <= 3)
      val p = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("s_name")).count()
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("might_contain"), p)
    }
  }
}
