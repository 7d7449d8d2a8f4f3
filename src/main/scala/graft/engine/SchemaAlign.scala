package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Target-schema alignment — the semantic core of the reference pipeline.
  *
  * Mirrors the reference's column reconciliation and per-value conversion
  * (GCS2Postgres `src/utils/utils.go:126-133` case-insensitive name
  * resolution, `src/db/db.go:162-171` projection by target schema with
  * missing-column NULL fill, `src/utils/utils.go:136-166` scalar casts),
  * re-expressed as a single Catalyst `Project` over `Cast`/`Alias`/`Literal`
  * so that column pruning pushes the projection into the source scan —
  * the reference instead transfers every column and drops row-by-row in Go.
  *
  * Scale note: this is a narrow (no-shuffle) transformation; at 100 TB it
  * pipelines partition-wise with zero extra passes, and unused source
  * columns are never read off parquet (`ReadSchema` pruning).
  */
object SchemaAlign {

  /** Resolve `name` against `df`'s columns case-insensitively (reference
    * `GetIndex`, utils.go:126-133). Returns the actual source column name.
    */
  def resolve(df: DataFrame, name: String): Option[String] =
    df.columns.find(_.equalsIgnoreCase(name))

  /** One aligned output column: source column cast to the target type, or a
    * typed NULL when the target column is absent from the source
    * (reference db.go:165-169).
    */
  def alignedColumn(df: DataFrame, name: String, dt: DataType): Column =
    resolve(df, name) match {
      case Some(src) => col(src).cast(dt).as(name)
      case None      => lit(null).cast(dt).as(name)
    }

  /** Project `df` onto `target`: target column order, target types,
    * case-insensitive name resolution, NULL fill for missing columns,
    * silent drop of extra source columns — exactly the reference's
    * consumer-side row loop (db.go:161-173), but declarative.
    */
  def align(df: DataFrame, target: StructType): DataFrame =
    df.select(target.fields.map { f: StructField =>
      alignedColumn(df, f.name, f.dataType)
    }.toIndexedSeq: _*)

  /** Strict variant: error out (per-table isolation, not process-fatal like
    * the reference's log.Fatalf) listing target columns with no source match
    * when `requireAll` is set.
    */
  def alignChecked(df: DataFrame, target: StructType,
                   requireAll: Boolean = false): DataFrame = {
    if (requireAll) {
      val missing = target.fields.map(_.name).filterNot(resolve(df, _).isDefined)
      require(missing.isEmpty,
        s"target columns missing from source: ${missing.mkString(", ")}")
    }
    align(df, target)
  }
}
