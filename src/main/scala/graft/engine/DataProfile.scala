package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table data profiling — the data-QUALITY sibling of the reference's
  * target-schema probe (GCS2Postgres `utils.go:96-123` asks what shape
  * the target wants; this asks what shape the data actually has): per
  * column, row/null/distinct counts and portable min/max
  * representations, the summary every ingest pipeline checks before
  * trusting a new drop (null explosions, cardinality collapse, domain
  * drift).
  *
  * ONE pass over the table: all per-column aggregates run in a single
  * aggregation (Spark plans the multi-column DISTINCTs via one Expand —
  * |columns|-fold map-side fan-out, no extra scans), and the per-column
  * result rows are exploded from that single row. `exact = false`
  * swaps COUNT(DISTINCT) for the HLL sketch — the 100 TB default,
  * where a ±2% cardinality is what you want from a profiler and the
  * Expand blow-up is what you don't.
  *
  * min/max representations are deliberately quantized to forms both
  * engines print identically (the oracle-portability policy):
  * integrals/strings/booleans verbatim, fractionals as
  * floor(1e6·x) (monotone, so min/max commute with the quantization),
  * timestamps at second precision.
  */
object DataProfile {

  private def repr(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => c.cast("string")
    case _: DecimalType => c.cast("string")
    case FloatType | DoubleType =>
      floor(c.cast("double") * lit(1000000.0)).cast("long").cast("string")
    case DateType => date_format(c, "yyyy-MM-dd")
    case _: TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case StringType => c
    case BooleanType => c.cast("string")
    case _ => lit(null).cast("string") // nested/binary: counts only
  }

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__nn_${f.name}"),
        (if (exact) countDistinct(c)
         else approx_count_distinct(c)).as(s"__nd_${f.name}"),
        min(c).as(s"__mn_${f.name}"),
        max(c).as(s"__mx_${f.name}"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_${f.name}")).as("n_nulls"),
        col(s"__nd_${f.name}").cast("long").as("n_distinct"),
        repr(col(s"__mn_${f.name}"), f.dataType).as("min_repr"),
        repr(col(s"__mx_${f.name}"), f.dataType).as("max_repr"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
