package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: replicate the small side `salt` times and
  * scatter the big side's hot keys across the replicas, so one hot key
  * spreads over `salt` reducers instead of melting one.
  *
  * AQE's skew-join splitting (on by default) handles sort-merge skew at
  * runtime; salting remains the explicit tool when (a) the skew is in an
  * aggregation upstream of the join, or (b) the join is broadcast-free
  * and a single key exceeds a whole executor. Correctness: any salt
  * assignment is valid for big-side-preserving join types — every
  * big-side row still meets every matching small-side row exactly once
  * (the small side is replicated across all salt values). Right/full
  * outer are rejected: an unmatched small-side ROW would surface once
  * per salt replica.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti", "cross")
        .contains(joinType.toLowerCase),
      s"saltedJoin cannot preserve right/full outer semantics (the " +
        s"small side is replicated $salt times); got '$joinType'")
    // deterministic spread: hash the whole big-side row (not just the key,
    // which is constant within a hot group)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salt))
        .cast("int"))
    val smallSalted = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigSalted.join(smallSalted, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
