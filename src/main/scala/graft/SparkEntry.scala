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
    }),

    // ---- join: left semi (EXISTS) ----
    "q_join_semi" -> ((s, dir) => {
      val o  = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- join: left anti (NOT EXISTS) ----
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ---- join: left outer + agg (zero-preserving counts) ----
    "q_join_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast("decimal(18,2)")), lit(0))
            .cast("double").as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // ---- aggregation: exact distinct ----
    "q_agg_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- aggregation: rollup (grouping sets) ----
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
                 col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)
    }),

    // ---- window: ranked top-n per group ----
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
                col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    // ---- window: lag/lead over event time ----
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .filter(col("prev_price").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                col("prev_price"),
                (col("o_totalprice") - col("prev_price")).as("delta"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- window: running frame (rows unbounded preceding) ----
    "q_window_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 10)
        .withColumn("running_qty",
          sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                col("l_quantity"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
                 col("l_linenumber"))
        .drop("l_shipdate")
    }),

    // ---- set operations: intersect / except / union ----
    "q_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
      val both  = f.intersect(p).withColumn("tag", lit("both"))
      val onlyF = f.except(p).withColumn("tag", lit("only_f"))
      val onlyP = p.except(f).withColumn("tag", lit("only_p"))
      both.unionAll(onlyF).unionAll(onlyP)
        .select(col("tag"), col("o_custkey"))
        .orderBy(col("tag"), col("o_custkey"))
    }),

    // ---- scalar functions: string ----
    "q_scalar_str" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"),
          (col("p_size") % 7).as("size_mod"),
          floor(col("p_retailprice")).cast("long").as("price_floor"))
        .orderBy(col("p_partkey"))
    }),

    // ---- scalar functions: date/time ----
    "q_scalar_date" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate").cast("date"),
                   lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- JSON extraction ----
    "q_json" -> ((s, dir) => {
      t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .orderBy(col("event_id"))
    }),

    // ---- event-time tumbling window (batch; readStream-ready shape) ----
    "q_event_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          date_trunc("hour", col("ts")).as("hour_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
        .orderBy(col("hour_start"), col("event_type"))
    }),

    // ---- sessionization: gap > 30 min splits a session ----
    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gapUs = lit(30L * 60 * 1000000)
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
               unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
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
        |LIMIT 100""".stripMargin,

    "q_join_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_outer" ->
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status,
        |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_window_rank" ->
      """SELECT o_orderpriority,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |  o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  o_totalprice - lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS delta
        |FROM orders
        |QUALIFY prev_price IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_qty
        |FROM lineitem WHERE l_suppkey <= 10
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,

    "q_setops" ->
      """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     p AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM f INTERSECT SELECT * FROM p)
        |UNION ALL
        |SELECT 'only_f' AS tag, o_custkey FROM (SELECT * FROM f EXCEPT SELECT * FROM p)
        |UNION ALL
        |SELECT 'only_p' AS tag, o_custkey FROM (SELECT * FROM p EXCEPT SELECT * FROM f)
        |ORDER BY tag, o_custkey""".stripMargin,

    "q_scalar_str" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 8)) AS name_prefix,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  length(p_name) AS name_len,
        |  p_size % 7 AS size_mod,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_scalar_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  dayofmonth(o_orderdate) AS o_day,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_event_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
        |          PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events
        |), y AS (
        |  SELECT user_id, event_id, ts,
        |    sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
        |             THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM x
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}
