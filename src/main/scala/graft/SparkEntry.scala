package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{JobSpec, Pipeline, Readers}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB-runnable oracle in
  * `oracleSql` (same column names, same deterministic ORDER BY). Numeric
  * policy for cross-engine hash-stability:
  *   - sums/avgs of doubles go through DECIMAL(18,2) (exact, associative)
  *     and are cast back to DOUBLE for a stable final representation;
  *   - event-time `ts` (parquet timestamp[ns]) is cast to µs TIMESTAMP on
  *     the DuckDB side to match Spark's read truncation;
  *   - every query ends in a total ORDER BY (ties broken by keys).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Readers.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full reference pipeline shape: scan → align/cast to a declared target
    * schema → deterministic result (SURVEY §7.1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("ingest_lineitem")(spark, "/root/testdata/sf0.001")

  /** Declared target schema for the flagship ingest (the reference's
    * information_schema probe, utils.go:96-123 — declared here, no live PG).
    * Exercises reorder + cast (double→decimal) + case-insensitive resolve.
    */
  private val lineitemTargetDdl =
    "l_orderkey BIGINT, l_linenumber INT, l_quantity DECIMAL(12,2), " +
    "l_extendedprice DECIMAL(12,2), l_returnflag STRING, l_shipdate TIMESTAMP"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- core ELT surface (reference R1-R11) ----
    "ingest_lineitem" -> ((s, dir) => {
      Pipeline.ingest(s, JobSpec(
          source = s"$dir/lineitem.parquet",
          target = "lineitem",
          targetSchemaDdl = Some(lineitemTargetDdl)))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- filter / projection (pushdown exercised) ----
    "q_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-02-01").cast("timestamp") &&
                col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- aggregation: TPC-H Q1 shape ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- join: star join with broadcast dims (TPC-H Q5 shape) ----
    "q_join_star" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders")
      val c  = t(s, dir, "customer")
      val n  = t(s, dir, "nation")
      val r  = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ---- sort + limit: distributed top-k (TakeOrderedAndProject) ----
    "q_topk" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
                 col("l_linenumber"))
        .limit(100)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "ingest_lineitem" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS DECIMAL(12,2)) AS l_quantity,
        |  CAST(l_extendedprice AS DECIMAL(12,2)) AS l_extendedprice,
        |  l_returnflag, CAST(l_shipdate AS TIMESTAMP) AS l_shipdate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-02-01'
        |  AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_star" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin
  )
}
