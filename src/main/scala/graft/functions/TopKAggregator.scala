package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator: keeps the k largest (score, id)
  * pairs, ties broken by smaller id.
  *
  * This is the scale-friendly alternative to
  * `row_number().over(Window.partitionBy(g).orderBy(desc(score))) <= k`:
  * the window form shuffles and SORTS every row of every group; the
  * aggregator form partial-aggregates map-side, so the shuffle carries at
  * most k pairs per group per map task — at 100 TB that's the difference
  * between a full-data sort and a tiny bounded-state merge.
  *
  * Usage:
  * {{{
  *   val topk = new TopKAggregator(5).toColumn
  *   ds.groupByKey(_.qid).agg(topk(...))   // typed API
  * }}}
  */
class TopKAggregator(k: Int, distinctIds: Boolean = false)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0)

  /** Descending by score, then ascending id — matches the window form's
    * `orderBy(desc(score), id)`.
    */
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** With `distinctIds`, a (score, id) whose id is already held keeps
    * whichever copy scores better — lets callers feed a
    * with-multiplicity pair stream (e.g. LSH candidates sharing several
    * bands) WITHOUT a corpus-wide dropDuplicates shuffle first; the
    * buffer is ≤ k entries so the membership scan is constant-time.
    * (LSH callers emit equal scores per id, where replace == drop; the
    * replace makes the aggregator order-independent for any caller.)
    */
  private def insert(buf: Seq[(Long, Long)], v: (Long, Long)): Seq[(Long, Long)] = {
    val held = if (distinctIds) buf.indexWhere(_._2 == v._2) else -1
    if (held >= 0)
      if (better(v, buf(held))) buf.updated(held, v).sortWith(better) else buf
    else if (buf.size < k) (buf :+ v).sortWith(better)
    else if (better(v, buf.last)) (buf.init :+ v).sortWith(better)
    else buf
  }

  override def zero: Seq[(Long, Long)] = Vector.empty
  override def reduce(buf: Seq[(Long, Long)], v: (Long, Long)): Seq[(Long, Long)] =
    insert(buf, v)
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf
  // kryo: the buffer is opaque intermediate state; callers consume the
  // typed Dataset result directly
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long)]]
}
