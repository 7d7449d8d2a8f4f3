package graft.engine

import org.apache.spark.sql.SparkSession
import graft.sources.Iceberg

/** Executor for the `maintenance:` config section — the lakehouse
  * operations a production pipeline schedules right after ingest
  * (GCS2Postgres runs per-table ELT, db.go:188-220; this is the
  * table-format upkeep that has no reference analogue because the
  * reference's warehouse did it server-side). One entry = one
  * metadata-centric action on one Iceberg table:
  *
  *   - `compact`           (args: sort_by?)           — rewrite_data_files
  *   - `expire`            (args: retain_last)        — snapshot retention
  *   - `evolve_spec`       (args: spec "col:tr,...")  — re-partitioning
  *   - `create_branch`     (args: name, from?)        — WAP staging
  *   - `fast_forward`      (args: name)               — WAP publish
  *   - `tag`               (args: name, snapshot?)    — named pin
  *
  * `evolve_spec`'s transform strings are exactly the composer surface
  * (`identity`, `bucket[N]`, `truncate[W]`, `year/month/day/hour`).
  * Every op is a driver-side metadata commit except compact's one
  * distributed merge — the same scale contract as the underlying
  * calls.
  */
object Maintenance {

  final case class Result(spec: MaintenanceSpec,
                          error: Option[Throwable]) {
    def ok: Boolean = error.isEmpty
  }

  def runOne(spark: SparkSession, m: MaintenanceSpec): Unit = {
    def need(key: String): String = m.args.getOrElse(key,
      throw new IllegalArgumentException(
        s"maintenance ${m.op}: missing required arg '$key'"))
    m.op match {
      case "compact" =>
        Iceberg.compactTable(spark, m.table, m.args.get("sort_by"))
      case "expire" =>
        Iceberg.expireSnapshots(m.table, need("retain_last").toInt)
      case "evolve_spec" =>
        val specs = need("spec").split(",").toSeq.map { part =>
          part.split(":") match {
            case Array(src, tr) => (src.trim, tr.trim)
            case _ => throw new IllegalArgumentException(
              s"maintenance evolve_spec: bad spec entry '$part' " +
                "(want col:transform)")
          }
        }
        Iceberg.evolvePartitionSpec(m.table, specs)
      case "create_branch" =>
        Iceberg.createBranch(m.table, need("name"),
          m.args.get("from").map(_.toLong))
      case "fast_forward" =>
        Iceberg.fastForward(m.table, need("name"))
      case "tag" =>
        Iceberg.tagSnapshot(m.table, need("name"),
          m.args.get("snapshot").map(_.toLong))
      case other =>
        throw new IllegalArgumentException(
          s"maintenance: unknown op '$other' (know: compact, expire, " +
            "evolve_spec, create_branch, fast_forward, tag)")
    }
  }

  /** Run the list IN ORDER with per-entry failure isolation (the
    * Pipeline discipline): one failed action reports and the rest
    * still run — except that later ops on the SAME table after a
    * failure are skipped, since maintenance entries on one table are
    * usually a dependent sequence (branch → publish → trim).
    */
  def run(spark: SparkSession,
          specs: Seq[MaintenanceSpec]): Seq[Result] = {
    val failedTables = scala.collection.mutable.Set.empty[String]
    specs.map { m =>
      if (failedTables(m.table))
        Result(m, Some(new IllegalStateException(
          s"skipped: an earlier maintenance op on ${m.table} failed")))
      else
        scala.util.Try(runOne(spark, m)) match {
          case scala.util.Success(_) => Result(m, None)
          case scala.util.Failure(e) =>
            failedTables += m.table
            Result(m, Some(e))
        }
    }
  }
}
