package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-load reconciliation: does the sink hold exactly what the source
  * produced? The reference only logs a row count (`copyCount`,
  * db.go:184); this verifies content, not just cardinality, with one
  * aggregation pass per side and O(1) driver state:
  *
  *   - rows: count(*)
  *   - checksum: sum of xxhash64 over the row's canonical string form —
  *     order-independent (sum is commutative) and partitioning-independent,
  *     so source and sink can be laid out completely differently.
  *
  * Columns are compared case-insensitively by name (the engine's
  * alignment semantics); compare AFTER alignment, i.e. against what was
  * actually written.
  */
object Reconcile {

  final case class Report(sourceRows: Long, sinkRows: Long,
                          sourceSum: BigDecimal, sinkSum: BigDecimal) {
    def ok: Boolean = sourceRows == sinkRows && sourceSum == sinkSum
  }

  private def fingerprint(df: DataFrame): (Long, BigDecimal) = {
    val cols = df.columns.sorted.toIndexedSeq
      .map(c => coalesce(col(c).cast("string"), lit("\u0000null")))
    // DECIMAL(38,0) accumulator: ~1e19-scale hashes over up to ~1e18 rows
    // cannot overflow, and ANSI mode (Spark 4 default) rejects a wrapping
    // long sum. The NUL-prefixed null sentinel cannot collide with data.
    val row = df.agg(count(lit(1)).as("n"),
      sum(xxhash64(cols: _*).cast("decimal(38,0)")).as("s")).head()
    (row.getLong(0),
      if (row.isNullAt(1)) BigDecimal(0) else BigDecimal(row.getDecimal(1)))
  }

  def compare(source: DataFrame, sink: DataFrame): Report = {
    // case-insensitive name alignment; fail loudly on column-set mismatch
    val srcCols = source.columns.map(_.toLowerCase).sorted.toSeq
    val snkCols = sink.columns.map(_.toLowerCase).sorted.toSeq
    require(srcCols == snkCols,
      s"column sets differ: source=$srcCols sink=$snkCols")
    val (sn, ss) = fingerprint(
      source.toDF(source.columns.map(_.toLowerCase).toIndexedSeq: _*))
    val (kn, ks) = fingerprint(
      sink.toDF(sink.columns.map(_.toLowerCase).toIndexedSeq: _*))
    Report(sn, kn, ss, ks)
  }
}
