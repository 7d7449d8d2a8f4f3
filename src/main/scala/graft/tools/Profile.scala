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
  *   Profile <sfDir> <repeats> <query...>   (no queries = all)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.engine.GraftSession.build("graft-profile",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val shufWrite = new AtomicLong; val shufRead = new AtomicLong
    val spilled = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
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
    }
    spark.stop()
  }
}
