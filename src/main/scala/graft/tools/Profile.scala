package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.SparkEntry

/** Perf triage CLI: run named queries N times in one JVM and print
  * per-repeat seconds plus per-run SHUFFLE volume and spill — separates
  * one-time planning/codegen constants (first run only) from real
  * per-run compute, and turns "is this one-shuffle?" plan reading into
  * measured bytes. Shuffle bytes per input row at sf0.1 is the number
  * that extrapolates to 100 TB; wall-clock at this SF mostly does not.
  * Usage:
  *   Profile <sfDir> <repeats> [-stages] <query...>   (no queries = all)
  *
  * With `-stages`, additionally prints per-STAGE attribution for the
  * final repeat of each query — executor run time, task count, shuffle
  * bytes, and the first call-site line — ranking which part of a
  * multi-operator chain (e.g. the q_corpus_pipeline capstone) owns the
  * wall clock.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val stageMode = args.contains("-stages")
    val names = {
      val qs = args.drop(2).filterNot(_ == "-stages").toSeq
      if (qs.nonEmpty) qs else SparkEntry.queries.keys.toSeq.sorted
    }
    val spark = graft.engine.GraftSession.build("graft-profile",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val shufWrite = new AtomicLong; val shufRead = new AtomicLong
    val spilled = new AtomicLong
    final case class StageRow(id: Int, name: String, runMs: Long,
                              tasks: Int, shufW: Long, shufR: Long)
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          stages.add(StageRow(s.stageInfo.stageId,
            s.stageInfo.name.linesIterator.next(),
            m.executorRunTime, s.stageInfo.numTasks,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead))
        }
      }
    })
    // same warmup as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    def mb(v: Long): String = f"${v / 1048576.0}%8.1f"
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val stats = (1 to reps).map { _ =>
        ListenerBridge.waitUntilEmpty(spark.sparkContext)
        stages.clear()
        val (w0, r0, s0) = (shufWrite.get, shufRead.get, spilled.get)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        ListenerBridge.waitUntilEmpty(spark.sparkContext)
        (secs, shufWrite.get - w0, shufRead.get - r0, spilled.get - s0)
      }
      val times = stats.map(s => f"${s._1}%6.2f").mkString(" ")
      val last = stats.last // steady-state repeat
      println(f"$name%-24s $times  shufW=${mb(last._2)}MB " +
        f"shufR=${mb(last._3)}MB spill=${mb(last._4)}MB")
      if (stageMode) {
        // stages of the FINAL repeat only (queue cleared per query)
        import scala.jdk.CollectionConverters._
        val rows = stages.asScala.toSeq.sortBy(-_.runMs).take(12)
        rows.foreach { st =>
          println(f"    stage ${st.id}%4d ${st.runMs / 1000.0}%8.1f " +
            f"cpu-s  tasks=${st.tasks}%4d shufW=${mb(st.shufW)}MB " +
            f"shufR=${mb(st.shufR)}MB  ${st.name.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
