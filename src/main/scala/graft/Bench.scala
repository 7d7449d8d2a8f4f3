package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR and prints a compact JSON summary line
  * {"metric":"total","value":N,"unit":"sec",...} as the LAST stdout
  * line, with full per-query detail in BENCH_DETAIL.json.
  *
  * Each query is materialized through a `noop` datasource write — unlike
  * `count()`, that forces every output column through the full plan
  * (count() lets Catalyst drop final sorts and prune all columns, which
  * under-measures scan+compute).
  *
  * Repetitions: the FULL suite runs as `reps` complete passes
  * ($SPARK_GRAFT_BENCH_REPS or `-reps N`, default 2), and each query's
  * "min" is taken ACROSS passes — reps of the same query are separated
  * by the whole rest of the suite, never back-to-back. This is the
  * contention defense the back-to-back form lacked: the r5/r7/r8
  * driver captures were each poisoned by one transient machine-load
  * window inflating BOTH adjacent reps of the same few queries
  * (q_cube 23.56 s captured vs 1.48 s on every isolated re-run), which
  * min-of-N cannot repair. Interleaved, a window of any length shorter
  * than a full pass hits each query at most once and min survives.
  * "once" is each query's pass-1 (cold-plan) run — comparable to
  * earlier rounds.
  *
  * Output contract, sized for the driver's 2000-char stdout tail
  * capture (the round-1 and round-5 bench lines were head-truncated to
  * unparseable): the final line stays well under the window and carries
  * the totals plus the slowest queries; the full per-query map is
  * written to BENCH_DETAIL.json (repo root, env-overridable) and also
  * printed earlier in stdout for log scrapes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (reps, names) = {
      val i = args.indexOf("-reps")
      if (i >= 0) {
        require(i + 1 < args.length, "usage: Bench [-reps N] [query ...]")
        val v = args(i + 1)
        require(v.forall(_.isDigit) && v.nonEmpty,
          s"usage: Bench [-reps N] — N must be a positive integer, got '$v'")
        (v.toInt, args.take(i) ++ args.drop(i + 2))
      } else
        (sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt, args)
    }
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val spark = graft.engine.GraftSession.build("graft-bench",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // warm the JVM (codegen compiler, parquet reader, shuffle machinery,
    // sort + exchange paths) so the first measured query isn't charged
    // for session start-up or first-use JIT
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .orderBy("l_orderkey", "l_linenumber")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // optional args = query-name filter (dev iteration on hotspots);
    // the driver passes none and always measures the full set
    val selected =
      if (names.isEmpty) SparkEntry.queries
      else {
        val unknown = names.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty,
          s"unknown quer${if (unknown.length == 1) "y" else "ies"}: " +
            unknown.mkString(", "))
        SparkEntry.queries.filter { case (n, _) => names.contains(n) }
      }
    // (name, once, min, ok): rep 1 includes plan/codegen constants;
    // min-of-N is the steady state. A rep that throws marks the query
    // FAILED — its elapsed-to-failure is NOT a measurement, and recording
    // it as one would let a broken query post a fast "pass" and make a
    // broken round look complete (round-7 lesson: q_sessionize errored in
    // 0.05 s and counted in nq).
    val ordered = selected.toSeq.sortBy(_._1)
    val times = Array.fill(ordered.length)(
      Vector.empty[Double])
    val failedFlags = Array.fill(ordered.length)(false)
    for (pass <- 1 to reps; ((name, fn), idx) <- ordered.zipWithIndex) {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failedFlags(idx) = true
        System.err.println(
          s"[bench] $name failed (pass $pass): ${e.getMessage}")
      }
      times(idx) :+= (System.nanoTime() - t0) / 1e9
    }
    val results = ordered.zipWithIndex.map { case ((name, _), idx) =>
      (name, times(idx).head, times(idx).min, !failedFlags(idx))
    }
    val failedNames = results.collect { case (n, _, _, false) => n }
    val passed = results.collect { case (n, o, m, true) => (n, o, m) }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val detail = results.map { case (k, once, mn, ok) =>
      "\"" + k + "\":{\"once\":" + f2(once) + ",\"min\":" + f2(mn) +
        (if (ok) "" else ",\"failed\":true") + "}"
    }.mkString("{", ",", "}")
    // totals cover PASSED queries only — failed ones are listed, not summed
    val totalOnce = passed.map(_._2).sum
    val totalMin = passed.map(_._3).sum
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val detailLine =
      s"""{"metric":"detail","reps":$reps,"queries":$detail,"nfailed":${failedNames.length},"failed":$failedJson,"sf":"$sfDir"}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "/root/repo/BENCH_DETAIL.json")
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      try w.println(detailLine) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    // the 8 slowest (by min) ride inline in the summary so the capture
    // window alone still identifies hotspots
    val slow = passed.sortBy(-_._3).take(8).map { case (k, once, mn) =>
      "\"" + k + "\":{\"once\":" + f2(once) + ",\"min\":" + f2(mn) + "}"
    }.mkString("{", ",", "}")
    // "value" stays the round-comparable one-shot total; "value_min" is
    // the contamination-proof steady-state total; "nq" counts PASSED
    // queries so nq + nfailed = attempted
    val line =
      s"""{"metric":"total","value":${f3(totalOnce)},"unit":"sec","value_min":${f3(totalMin)},"reps":$reps,"nq":${passed.length},"nfailed":${failedNames.length},"failed":$failedJson,"slowest":$slow,"detail":"$detailPath","sf":"$sfDir"}"""
    spark.stop()
    // print detail first, the compact summary LAST after Spark's
    // shutdown logging, so the parseable line sits at the very end of
    // the captured tail
    println(detailLine)
    println(line)
  }
}
