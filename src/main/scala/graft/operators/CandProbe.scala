package graft.operators

import org.apache.spark.sql.functions._

/** Diagnostic (not part of the query surface): counts each prefix-filter
  * candidate arm for the ensemble at a given corpus, to attribute
  * super-linear shuffle growth to a specific arm before optimizing it.
  * Usage: CandProbe <sfDir> [tauJ=0.3] [tauC=0.5]
  */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tauJ = if (args.length > 1) args(1).toDouble else 0.3
    val tauC = if (args.length > 2) args(2).toDouble else 0.5
    val spark = graft.engine.GraftSession.build("graft-candprobe",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = graft.engine.Readers.table(spark, sfDir, "documents")
    val (nJac, nCon, nUniq) = Dedup.ensembleCandStats(docs, tauJ, tauC)
    println(s"""{"sf":"$sfDir","jaccard_arm":$nJac,""" +
      s""""containment_arm":$nCon,"unique_pairs":$nUniq}""")
    spark.stop()
  }
}
