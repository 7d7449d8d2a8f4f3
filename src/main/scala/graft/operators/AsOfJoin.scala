package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent right
  * row with rightTs <= leftTs within the same key group (direction
  * "backward", the default) or the earliest right row with
  * rightTs >= leftTs ("forward") — the standard temporal-join primitive
  * (market data, feature lookups, attribution / next-touch lookups).
  *
  * Spark has no native as-of join; the naive range-join (non-equi
  * condition) degenerates to a per-key cross product. This implementation
  * uses the union+window formulation instead:
  *
  *   1. union both sides tagged (right=0, left=1), one row each;
  *   2. one window over (keys) ordered by (ts, tag, tieBreak) computes
  *      `last(right payload, ignoreNulls)` up to the current row;
  *   3. keep left rows — each now carries the latest right payload at or
  *      before its timestamp (NULL when none: left-join semantics).
  *
  * "forward" is the same machinery with the time axis reversed (ts
  * descending), so "last preceding in sort order" becomes "nearest at or
  * after".
  *
  * Cost: ONE shuffle by key (the window), linear scan per key group — at
  * 100 TB this is a single exchange of left+right, no join explosion.
  * Ties: rights sort before lefts at the same instant (<=/>= semantics);
  * among equal right timestamps `tieBreak` decides — backward takes the
  * LARGEST tieBreak (last wins), forward the SMALLEST (first wins).
  */
object AsOfJoin {

  /** "nearest" picks whichever of the backward/forward matches is closer
    * in time (ties -> backward, the point-in-time-safe side). Both
    * directional passes share ONE exchange: the second window re-sorts
    * within the same hash partitioning, so the cost stays a single
    * shuffle of left+right. Requires a ts type with subtraction
    * (timestamp -> interval, or numeric).
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               keys: Seq[String], leftTs: String, rightTs: String,
               rightPayload: Seq[String], suffix: String = "_r",
               tieBreak: Option[String] = None,
               direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq
    val payStruct = struct(
      (col(rightTs).as("__ts_r") +: rightPayload.map(col)): _*)
    val rightPrepped = right
      // a NULL right timestamp can never be "at or before"/"after" any
      // left ts — but Spark's NULLS FIRST ascending order would sort it
      // to the window's front, where the running last(ignoreNulls) turns
      // it into a phantom match for every early left row. Drop up front.
      .filter(col(rightTs).isNotNull)
      .select((keys.map(col) :+ col(rightTs).as("__ts") :+
        lit(0).as("__tag") :+
        tieBreak.map(col).getOrElse(lit(0L)).cast("long").as("__tb") :+
        payStruct.as("__rpay")): _*)
    val nullPay = lit(null).cast(
      rightPrepped.schema("__rpay").dataType.catalogString)
    val leftPrepped = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__tb", lit(0L))
      .withColumn("__rpay", nullPay)
      .select((keys.map(col) ++ Seq(col("__ts"), col("__tag"), col("__tb"),
        col("__rpay")) ++ leftCols.filterNot(keys.contains).map(col)): _*)
    val rightAligned = rightPrepped
      .select((keys.map(col) ++ Seq(col("__ts"), col("__tag"), col("__tb"),
        col("__rpay")) ++ leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val backwardOrd = Seq(col("__ts").asc, col("__tag").asc, col("__tb").asc)
    // reversed time axis; equal-ts rights still precede the left
    val forwardOrd = Seq(col("__ts").desc, col("__tag").asc, col("__tb").desc)
    def win(ordering: Seq[Column]) = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = leftPrepped.unionByName(rightAligned)
    val matched = direction match {
      case "backward" => unioned.withColumn("__match",
        last(col("__rpay"), ignoreNulls = true).over(win(backwardOrd)))
      case "forward" => unioned.withColumn("__match",
        last(col("__rpay"), ignoreNulls = true).over(win(forwardOrd)))
      case _ => // nearest: both passes, then the closer side (tie: backward)
        unioned
          .withColumn("__mb",
            last(col("__rpay"), ignoreNulls = true).over(win(backwardOrd)))
          .withColumn("__mf",
            last(col("__rpay"), ignoreNulls = true).over(win(forwardOrd)))
          .withColumn("__match",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when((col("__ts") - col("__mb.__ts_r")) <=
                    (col("__mf.__ts_r") - col("__ts")), col("__mb"))
              .otherwise(col("__mf")))
    }
    val out = matched.filter(col("__tag") === 1).select(
      (leftCols.map(col) :+
        col("__match.__ts_r").as(s"$rightTs$suffix")) ++
        rightPayload.map(c => col(s"__match.$c").as(s"$c$suffix")): _*)
    out
  }
}
