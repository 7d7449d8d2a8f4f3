package graft.engine

import org.apache.spark.sql.DataFrame

/** Sink facade — the engine's analogue of the reference's bulk PG COPY
  * (GCS2Postgres `src/db/db.go:175-180`). Where the reference buffers every
  * row in driver memory and pushes one COPY over a single connection
  * (db.go:160-180, db.go:151-155), Spark's JDBC writer opens one connection
  * PER PARTITION and streams `batchsize`-row batches — the shape that
  * survives 100 TB: sink parallelism scales with partition count and no
  * executor ever materializes more than its partition.
  */
object Sink {

  def write(df: DataFrame, target: String, cfg: SinkConfig): Unit =
    cfg.format match {
      case "parquet" if cfg.bucketBy.nonEmpty =>
        // bucketed layout: both sides of a join bucketed on the join key
        // with the same bucket count read back pre-partitioned — the join
        // plans with NO exchange. The 100 TB co-location tool for
        // repeatedly-joined fact tables. Bucketing requires a catalog
        // table (saveAsTable), not a bare path.
        require(cfg.numBuckets > 0, "bucketBy needs numBuckets > 0")
        df.write
          .bucketBy(cfg.numBuckets, cfg.bucketBy.head, cfg.bucketBy.tail: _*)
          .sortBy(cfg.bucketBy.head, cfg.bucketBy.tail: _*)
          .mode(cfg.mode)
          .format("parquet")
          .saveAsTable(target)
      case "parquet" =>
        val root = cfg.path.getOrElse(
          throw new IllegalArgumentException("parquet sink needs sink.path"))
        // hive-style partition layout: downstream filters on these
        // columns prune whole directories at planning time
        val writer =
          if (cfg.partitionBy.nonEmpty)
            df.write.partitionBy(cfg.partitionBy: _*)
          else df.write
        writer.mode(cfg.mode).parquet(s"$root/$target")
      case "iceberg" =>
        // table-format landing through the in-repo composer: first
        // write BUILDS the table (one partitionBy job + one
        // distributed footer-stats job), later appends COMMIT
        // snapshots that reuse prior manifests — the lakehouse ELT
        // target the `maintenance:` section then compacts/publishes/
        // trims. `partition_by` entries are `col` (identity) or
        // `col:transform` with the full composer transform surface
        // (bucket[N], truncate[W], year/month/day/hour).
        val root = cfg.path.getOrElse(
          throw new IllegalArgumentException("iceberg sink needs sink.path"))
        require(cfg.partitionBy.nonEmpty,
          "iceberg sink needs sink.partition_by " +
            "(entries: col or col:transform)")
        val specs = cfg.partitionBy.map { e =>
          e.split(":") match {
            case Array(src)     => (src.trim, "identity")
            case Array(src, tr) => (src.trim, tr.trim)
            case _ => throw new IllegalArgumentException(
              s"iceberg sink: bad partition_by entry '$e' " +
                "(want col or col:transform)")
          }
        }
        val dir = s"$root/$target"
        if (!graft.sources.Iceberg.tableExists(dir))
          graft.sources.Iceberg.writeTableTransformed(df, dir, specs)
        else cfg.mode match {
          case "append" => graft.sources.Iceberg.appendToTable(df, dir)
          case other => throw new IllegalArgumentException(
            s"iceberg sink: table $dir exists and mode '$other' is not " +
              "append — refusing (drop the table directory to rebuild, " +
              "or use deleteWhere/upsertTable for row-level changes)")
        }
      case "avro" =>
        // interchange landing in Avro container files via the in-repo
        // DSv2 (sources/AvroSource): one deflate-coded file per
        // partition, splittable on sync markers for whoever reads it
        // next. DSv2 has no catalog here, so the mode must be
        // append/overwrite — same rule as any path-based V2 sink.
        val root = cfg.path.getOrElse(
          throw new IllegalArgumentException("avro sink needs sink.path"))
        // DSv2 path sinks support only append/overwrite; anything else
        // (error/errorifexists/ignore) must fail loudly here — silently
        // coercing to overwrite would truncate data the job spec asked
        // us to protect
        require(cfg.mode == "append" || cfg.mode == "overwrite",
          s"avro sink supports mode append/overwrite, got '${cfg.mode}'")
        df.write.mode(cfg.mode).format("graft-avro").save(s"$root/$target")
      case "pgcopy" =>
        // The reference's landing step (db.go:175-180, pgx.CopyFrom)
        // re-expressed as payload files: one COPY TEXT file per upstream
        // partition plus a `<target>.copy.sql` manifest with the exact
        // `\COPY` command. No pg driver needed to produce or verify the
        // payload; loading is one psql invocation per file (parallel
        // COPY is the documented fast path for bulk Postgres loads).
        val root = cfg.path.getOrElse(
          throw new IllegalArgumentException("pgcopy sink needs sink.path"))
        PgCopy.copyLines(df).write.mode(cfg.mode).text(s"$root/$target")
        val dir = new org.apache.hadoop.fs.Path(s"$root/$target")
        val fs = dir.getFileSystem(
          df.sparkSession.sessionState.newHadoopConf())
        // one \COPY line per part file Spark actually wrote (names are
        // Spark-assigned, so the manifest is built from a directory
        // listing, not a guessed constant); files load in parallel, one
        // psql invocation per line
        val parts = fs.listStatus(dir).map(_.getPath.getName)
          .filter(_.startsWith("part-")).sorted
        val sql = parts.map(f =>
          PgCopy.copySql(target, df.columns.toSeq, s"$target/$f"))
          .mkString("", "\n", "\n")
        val manifest = new org.apache.hadoop.fs.Path(s"$root/$target.copy.sql")
        val out = fs.create(manifest, true)
        try out.write(sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      case "jdbc" =>
        // Production wiring (driver jar absent in this environment):
        // one connection per partition, batched inserts. `numPartitions`
        // caps sink-side connections when the upstream plan is very wide.
        df.write.format("jdbc")
          // secret://NAME placeholders resolve here (reference R14:
          // utils.go:70-87 fetched the PG password at startup)
          .option("url", Secrets.resolve(cfg.url.getOrElse(
            throw new IllegalArgumentException("jdbc sink needs sink.url"))))
          .option("dbtable", target)
          .option("batchsize", cfg.batchSize.toString)
          .option("isolationLevel", "NONE") // COPY-like throughput
          .mode(cfg.mode)
          .save()
      case other =>
        df.write.mode(cfg.mode).format(other)
          .save(cfg.path.map(p => s"$p/$target").getOrElse(target))
    }
}
