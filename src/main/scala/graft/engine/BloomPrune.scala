package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter join pruning — the runtime-filter pattern Spark's
  * own `InjectRuntimeFilter` applies, exposed as a composable operator:
  * build a bloom over the (selective) dimension keys, apply it map-side at
  * the fact scan, then let the exact join remove the false positives.
  *
  * At 100 TB the win is shuffle volume: non-matching fact rows are dropped
  * at the scan, BEFORE the join exchange, for the cost of one broadcast-
  * sized byte array. Correctness never depends on the bloom (it only
  * over-approximates the key set), so oracle results equal the plain join.
  *
  * Uses the native Catalyst `BloomFilterAggregate`/`BloomFilterMightContain`
  * pair (codegen'd, the same expressions Spark's optimizer injects) via the
  * graftbridge — they are not in the public function registry. The
  * dimension aggregate is executed eagerly (one tiny job, the analogue of
  * the optimizer's scalar-subquery execution) and shipped as a literal.
  */
object BloomPrune {

  /** Serialized bloom filter over `xxhash64(key)` of `dim`'s rows. */
  def bloomOf(dim: DataFrame, key: Column, expectedItems: Long,
              numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    dim.select(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Map-side membership pre-filter: might_contain(bloom, xxhash64(key)).
    * `bloom` ships as a literal (analysis requires a foldable/subquery
    * bloom side), so the predicate stays inside whole-stage codegen.
    */
  def mightContain(bloom: Array[Byte], factKey: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(factKey))))

  /** Bloom-pruned left-semi join of `fact` against `dim` on
    * fact(factKey) = dim(dimKey): bloom pre-filter + exact semi join.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long = 1000000L,
               numBits: Long = 8000000L): DataFrame = {
    val bf = bloomOf(dim, col(dimKey), expectedItems, numBits)
    fact.filter(mightContain(bf, col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }
}
