package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableHash.stableHash60

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything is keyed on a stable content hash, never on RNG or row
  * position: the same row lands in the same fold on every run, every
  * engine, every partitioning — which is what makes train/val/test
  * splits reproducible and join-stable at 100 TB (a re-run or a
  * repartition cannot move examples across the split boundary).
  * All operators are narrow per-row filters — no shuffle.
  */
object Sampling {

  /** Deterministic fold id in [0, folds): 60-bit stable hash of the key
    * modulo folds (hash is non-negative by construction).
    */
  def foldId(key: Column, folds: Int): Column =
    stableHash60(key.cast("string")) % folds

  /** Reproducible train/holdout split: rows with fold < trainFolds go to
    * train, the rest to holdout. Disjoint and exhaustive by construction.
    */
  def splitByHash(df: DataFrame, key: Column, folds: Int,
                  trainFolds: Int): (DataFrame, DataFrame) = {
    val f = foldId(key, folds)
    (df.filter(f < trainFolds), df.filter(f >= trainFolds))
  }

  /** Deterministic uniform downsample: keep num/den of rows by key hash. */
  def sampleByHash(df: DataFrame, key: Column, num: Int, den: Int): DataFrame =
    df.filter(foldId(key, den) < num)

  /** Stratified deterministic sample: per-stratum keep rates (num out of
    * `den` folds), e.g. Map("en" -> 5) with defaultNum 2, den 10 keeps
    * 50% of English rows and 20% of everything else — the standard
    * language/source rebalancing step when mixing training corpora.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Int], defaultNum: Int,
                       den: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultNum)) { case (acc, (value, num)) =>
      when(stratum === value, lit(num)).otherwise(acc)
    }
    df.filter(foldId(key, den) < rate)
  }
}
