package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source facade — the engine's analogue of the reference's external-table
  * registration + schema inference (GCS2Postgres `src/db/db.go:25-56`).
  * Spark *is* the external-table engine: Parquet/ORC are self-describing,
  * CSV/JSON get `inferSchema`. Registration-as-view mirrors the reference's
  * idempotent table-id derivation from the file basename (db.go:23).
  */
object Readers {

  /** Table id = file basename minus extension (reference db.go:23). */
  def tableIdFor(source: String): String = {
    val base = source.split('/').last
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  def read(spark: SparkSession, job: JobSpec): DataFrame = {
    val fmt = job.resolvedFormat
    val reader = spark.read.options(job.options)
    fmt match {
      case SourceFormat.Parquet => readParquet(spark, job.source, job.options)
      case SourceFormat.Orc     => reader.orc(job.source)
      case SourceFormat.Csv =>
        reader.option("header", job.options.getOrElse("header", "true"))
          .option("inferSchema", job.options.getOrElse("inferSchema", "true"))
          .csv(job.source)
      case SourceFormat.Json    => reader.json(job.source)
      case SourceFormat.Text    => reader.text(job.source)
      case SourceFormat.Avro =>
        // the in-repo DSv2 connector (sync-split ranges + reader-schema
        // pruning) — no spark-avro module on this classpath
        reader.format("graft-avro").load(job.source)
      case SourceFormat.Iceberg =>
        // the in-repo table-format reader (graft.sources.Iceberg):
        // version-hint → metadata JSON → manifest list → manifests →
        // pruned parquet data files (merge-on-read when delete files
        // exist), all public Iceberg spec — no connector jar needed.
        // The full pruning surface rides the option map so YAML
        // pipelines drive it: `iceberg.partitionEq` (first-field
        // sugar), `iceberg.partitionEqs` ("k=v,k=v" conjunction),
        // `iceberg.asOf` (snapshot id — time travel),
        // `iceberg.colRange` ("col:lo:hi" long-column stats skip),
        // `iceberg.sourceRange` ("col:lo:hi" source-value window
        // pruned through order-preserving partition transforms —
        // day/month/year/truncate tables), `iceberg.ref` (named
        // tag/branch state by ref name).
        val eqs = job.options.get("iceberg.partitionEqs")
          .map(_.split(",").map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k.trim -> v.trim
          }.toMap).getOrElse(Map.empty[String, String])
        val range = job.options.get("iceberg.colRange").map { s =>
          val Array(c, lo, hi) = s.split(":")
          (c.trim, lo.trim.toLong, hi.trim.toLong)
        }
        val srcRange = job.options.get("iceberg.sourceRange").map { s =>
          val Array(c, lo, hi) = s.split(":")
          (c.trim, lo.trim, hi.trim)
        }
        // `iceberg.ref` reads a NAMED state — a tag's pinned snapshot
        // or a branch's (possibly unpublished) head
        val refAsOf = job.options.get("iceberg.ref").map { r =>
          val m = graft.sources.Iceberg.currentMetadata(job.source)
          m.refs.getOrElse(r.trim, throw new IllegalArgumentException(
            s"iceberg: no ref '${r.trim}' on ${job.source} " +
              s"(have: ${m.refs.keys.toSeq.sorted.mkString(", ")})"))
        }
        graft.sources.Iceberg.scan(spark, job.source,
          partitionEq = job.options.get("iceberg.partitionEq"),
          asOf = job.options.get("iceberg.asOf").map(_.trim.toLong)
            .orElse(refAsOf),
          colRange = range,
          partitionEqs = eqs,
          sourceRange = srcRange)
      case SourceFormat.Bigquery =>
        // Connector jar absent in this environment (offline coursier);
        // the call shape is the production wiring (`load` takes the
        // project.dataset.table id the reference-config parser emits).
        reader.format(fmt.sparkFormat).load(job.source)
      case SourceFormat.Jdbc =>
        reader.format("jdbc").load()
    }
  }

  /** Register-and-read: the full reference producer semantics — create the
    * "external table" (temp view named after the file stem) if absent, and
    * hand back the lazily-scanned relation (db.go:17-56).
    */
  def register(spark: SparkSession, job: JobSpec): DataFrame = {
    val df = read(spark, job)
    df.createOrReplaceTempView(tableIdFor(job.source))
    df
  }

  /** Load every TPC-H-ish testdata table under `sfDir` as a temp view. */
  val testTables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Resolved-plan cache for the immutable testdata tables: every
    * `spark.read.parquet` call re-lists the path and re-reads the footer
    * schema on the driver (~10-30 ms), and a 270-query bench calls
    * `table` thousands of times on the same ten paths. The cache holds
    * the LAZY analyzed DataFrame only — no rows; every action still
    * scans the parquet from disk. Keyed by session (tests build many
    * short-lived sessions whose catalogs must not leak into each other);
    * testdata dirs are immutable by contract, so staleness cannot arise.
    */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  /** Drop cache entries owned by stopped sessions — a cached DataFrame
    * strongly references its session, so without this a long-lived JVM
    * churning short-lived sessions (the test suite) would pin every
    * stopped session's state forever. Purge-on-access keeps the maps
    * bounded by the number of LIVE sessions with no listener wiring.
    */
  private def purgeStopped(): Unit = {
    tableCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    registeredDir.keySet.removeIf(s => s.sparkContext.isStopped)
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    purgeStopped()
    tableCache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      k => readParquet(spark, k._2))
  }

  /** Parquet reader resilient to TIMESTAMP(NANOS) columns, which Spark 4
    * rejects outright (PARQUET_TYPE_ILLEGAL). The footer of the first
    * data file names the nanos columns; those are read as raw longs
    * (`nanosAsLong`) and truncated to Spark's native microsecond
    * timestamps — same behavior as DuckDB's `CAST(ts AS TIMESTAMP)`, so
    * oracle comparisons line up.
    */
  /** Footer probe results per path — the probe is a driver-side file read
    * and every query re-opens the same testdata paths.
    */
  private val nanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  def readParquet(spark: SparkSession, path: String,
                  options: Map[String, String] = Map.empty): DataFrame = {
    val nanos = nanosCache.computeIfAbsent(path,
      p => nanosTimestampColumns(spark, p))
    // CONTRACT NOTE (deliberate session-wide set, never restored): the
    // flag cannot be scoped to this read — Spark re-reads it from the
    // session conf at every physical planning of the lazy DataFrame
    // (ParquetReadSupport re-converts the footer schema per scan), so a
    // set-and-restore here would make the returned frame throw
    // PARQUET_TYPE_ILLEGAL on its first action. Leaving it set is safe:
    // the flag only changes how TIMESTAMP(NANOS) parquet columns read
    // (raw long instead of hard error; non-nanos data is untouched),
    // and every library read path lands here, where nanos longs are
    // immediately truncated to microsecond timestamps below. The one
    // observable: a session that first reads a nanos file through this
    // reader and then calls spark.read.parquet DIRECTLY on another
    // nanos file gets raw longs instead of Spark 4's error — strictly
    // more permissive, never silently different values.
    if (nanos.nonEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.options(options).parquet(path)
    val denanosed = nanos.foldLeft(raw) { (df, c) =>
      // integer `div`, not `/` — double division would lose µs precision
      // on ~1.7e18 nanosecond values (> 2^53)
      df.withColumn(c, org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr(s"`$c` div 1000")))
    }
    normalizeNtz(denanosed)
  }

  /** Normalize every TIMESTAMP_NTZ column (top-level or nested) to the
    * session-local TimestampType. Parquet writers flip `isAdjustedToUTC`
    * freely (pandas/pyarrow default to naive timestamps); the reference
    * passes source-type drift through untouched
    * (GCS2Postgres `src/utils/utils.go:136-166`), and downstream
    * operators here (`unix_micros`, typed `java.sql.Timestamp` encoders)
    * want one canonical timestamp type. The session timezone is pinned
    * to UTC (build.sbt), so the NTZ wall-clock reading and the instant
    * reading coincide — the cast is value-preserving and matches DuckDB,
    * whose TIMESTAMP is naive.
    */
  def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    def strip(dt: DataType): DataType = dt match {
      case TimestampNTZType      => TimestampType
      case s: StructType         =>
        StructType(s.fields.map(f => f.copy(dataType = strip(f.dataType))))
      case a: ArrayType          => a.copy(elementType = strip(a.elementType))
      case m: MapType            =>
        m.copy(keyType = strip(m.keyType), valueType = strip(m.valueType))
      case other                 => other
    }
    val needed = df.schema.fields.filter(f => strip(f.dataType) != f.dataType)
    if (needed.isEmpty) df
    else needed.foldLeft(df) { (d, f) =>
      d.withColumn(f.name, d.col(s"`${f.name}`").cast(strip(f.dataType)))
    }
  }

  /** Top-level TIMESTAMP(NANOS) column names from the parquet footer of
    * the first data file under `path` (file or directory).
    */
  private def nanosTimestampColumns(spark: SparkSession,
                                    path: String): Seq[String] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    try {
      val hconf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(hconf)
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .find(f => f.getName.endsWith(".parquet") &&
              !f.getName.startsWith("_"))
            .getOrElse(return Nil)
        else p
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(file, hconf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
          case f if f.isPrimitive &&
            (f.getLogicalTypeAnnotation match {
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                t.getUnit == TimeUnit.NANOS
              case _ => false
            }) => f.getName
        }.toSeq
      } finally reader.close()
    } catch { case _: Exception => Nil }
  }

  /** The events table (TIMESTAMP(NANOS) `ts` handled by readParquet). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"$sfDir/events.parquet")

  /** Last directory registered per session: re-registering the same ten
    * views before every SQL query costs a catalog round-trip each — the
    * gate makes repeat calls (every SQL-family query in a bench pass)
    * free while a genuine dir switch still re-points every view.
    */
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registeredDir.get(spark) != sfDir) {
      testTables.foreach { t =>
        table(spark, sfDir, t).createOrReplaceTempView(t)
      }
      // recorded only AFTER every view registered: a mid-loop failure
      // must leave the gate open so the next call self-heals (the
      // pre-gate loop's behavior)
      registeredDir.put(spark, sfDir)
    }
}
