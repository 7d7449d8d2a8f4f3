package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 10:00:05"), 1L),
    ("A", ts("2024-01-01 10:00:00"), 2L),  // exactly at a quote
    ("A", ts("2024-01-01 09:00:00"), 3L),  // before any quote
    ("B", ts("2024-01-01 10:00:10"), 4L)
  ).toDF("sym", "t", "trade_id")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0, 10L),
    ("A", ts("2024-01-01 10:00:03"), 101.0, 11L),
    ("B", ts("2024-01-01 10:00:09"), 200.0, 12L)
  ).toDF("sym", "t", "px", "qid")

  private def run() = AsOfJoin.asOfJoin(
    trades, quotes, keys = Seq("sym"), leftTs = "t", rightTs = "t",
    rightPayload = Seq("px", "qid"), suffix = "_q", tieBreak = Some("qid"))
    .collect().map(r => r.getAs[Long]("trade_id") ->
      Option(r.getAs[Any]("px_q"))).toMap

  test("a NULL right timestamp never matches (no NULLS-FIRST phantom)") {
    val nullQuotes = quotes.unionByName(
      Seq(("A", null.asInstanceOf[Timestamp], 999.0, 13L))
        .toDF("sym", "t", "px", "qid"))
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = AsOfJoin.asOfJoin(
        trades, nullQuotes, keys = Seq("sym"), leftTs = "t", rightTs = "t",
        rightPayload = Seq("px", "qid"), suffix = "_q",
        tieBreak = Some("qid"), direction = dir)
        .collect().map(r => r.getAs[Long]("trade_id") ->
          Option(r.getAs[Any]("px_q"))).toMap
      // trade 3 (09:00, before any quote): backward must stay NULL —
      // the NULL-ts row must not become its match; and 999.0 must not
      // appear anywhere in any direction
      if (dir == "backward") assert(out(3L).isEmpty, s"$dir: ${out(3L)}")
      assert(!out.values.flatten.exists(_ == 999.0), s"$dir: $out")
    }
  }

  test("picks latest right at-or-before each left, null when none") {
    val m = run()
    assert(m(1L).contains(101.0))  // 10:00:05 -> quote at 10:00:03
    assert(m(2L).contains(100.0))  // equal instants match (<= semantics)
    assert(m(3L).isEmpty)          // no prior quote -> left-join null
    assert(m(4L).contains(200.0))  // key isolation: B sees only B quotes
  }

  test("left row count is preserved (no fan-out)") {
    val out = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "t", "t",
      Seq("px"), tieBreak = Some("qid"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq ==
      Seq("sym", "t", "trade_id", "t_r", "px_r"))
  }

  test("nearest: closer side wins, equidistant ties go backward, " +
       "one-sided rows still match") {
    val left = Seq(
      ("A", ts("2024-01-01 10:00:10"), 1L),  // quotes at :07(d3) :12(d2)
      ("A", ts("2024-01-01 09:00:00"), 2L),  // only later quotes exist
      ("B", ts("2024-01-01 10:00:10"), 3L),  // quotes at :08(d2) :12(d2)
      ("C", ts("2024-01-01 10:00:10"), 4L)   // only earlier quote
    ).toDF("sym", "t", "trade_id")
    val right = Seq(
      ("A", ts("2024-01-01 10:00:07"), 1.0, 20L),
      ("A", ts("2024-01-01 10:00:12"), 2.0, 21L),
      ("B", ts("2024-01-01 10:00:08"), 3.0, 22L),
      ("B", ts("2024-01-01 10:00:12"), 4.0, 23L),
      ("C", ts("2024-01-01 10:00:01"), 5.0, 24L)
    ).toDF("sym", "t", "px", "qid")
    val m = AsOfJoin.asOfJoin(left, right, Seq("sym"), "t", "t",
      Seq("px"), suffix = "_q", tieBreak = Some("qid"),
      direction = "nearest")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        r.getAs[Any]("px_q")).toMap
    assert(m(1L) == 2.0)  // forward :12 (d=2) beats backward :07 (d=3)
    assert(m(2L) == 1.0)  // nothing before -> earliest after
    assert(m(3L) == 3.0)  // equidistant -> backward wins
    assert(m(4L) == 5.0)  // nothing after -> latest before
  }

  test("tie between equal right timestamps resolved by tieBreak (last wins)") {
    val dupQuotes = quotes.unionAll(
      Seq(("A", ts("2024-01-01 10:00:03"), 999.0, 13L))
        .toDF("sym", "t", "px", "qid"))
    val m = AsOfJoin.asOfJoin(trades, dupQuotes, Seq("sym"), "t", "t",
      Seq("px", "qid"), suffix = "_q", tieBreak = Some("qid"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        r.getAs[Any]("px_q")).toMap
    assert(m(1L) == 999.0)  // qid 13 > qid 11 at the same instant
  }
}
