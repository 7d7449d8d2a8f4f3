package graft.operators

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property check: the union+window as-of join equals the naive
  * brute-force definition (argmax over rightTs <= leftTs per key) on
  * random inputs.
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen: Gen[(String, Int, Long)] = for {
    key <- Gen.oneOf("a", "b", "c")
    t <- Gen.choose(0, 50)
    id <- Gen.choose(0L, 1000L)
  } yield (key, t, id)

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("as-of join == brute-force argmax on random data") {
    val prop = Prop.forAll(
      Gen.listOfN(12, rowGen), Gen.listOfN(12, rowGen)) { (ls, rs) =>
      // unique right ids so the tieBreak is total
      val rights = rs.zipWithIndex
        .map { case ((k, t, _), i) => (k, t, i.toLong) }
      val lefts = ls.zipWithIndex
        .map { case ((k, t, _), i) => (k, t, 10000L + i) }
      val leftDf = lefts.map { case (k, t, id) => (k, ts(t), id) }
        .toDF("k", "t", "lid")
      val rightDf = rights.map { case (k, t, id) => (k, ts(t), id) }
        .toDF("k", "t", "rid")
      val got = AsOfJoin.asOfJoin(leftDf, rightDf, Seq("k"), "t", "t",
          Seq("rid"), tieBreak = Some("rid"))
        .select("lid", "rid_r").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      val want = lefts.map { case (k, t, lid) =>
        val cands = rights.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(c => (c._2, c._3))._3))
      }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("forward as-of join == brute-force argmin on random data") {
    val prop = Prop.forAll(
      Gen.listOfN(12, rowGen), Gen.listOfN(12, rowGen)) { (ls, rs) =>
      val rights = rs.zipWithIndex
        .map { case ((k, t, _), i) => (k, t, i.toLong) }
      val lefts = ls.zipWithIndex
        .map { case ((k, t, _), i) => (k, t, 10000L + i) }
      val leftDf = lefts.map { case (k, t, id) => (k, ts(t), id) }
        .toDF("k", "t", "lid")
      val rightDf = rights.map { case (k, t, id) => (k, ts(t), id) }
        .toDF("k", "t", "rid")
      val got = AsOfJoin.asOfJoin(leftDf, rightDf, Seq("k"), "t", "t",
          Seq("rid"), tieBreak = Some("rid"), direction = "forward")
        .select("lid", "rid_r").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      // earliest right at-or-after; equal timestamps -> SMALLEST rid
      val want = lefts.map { case (k, t, lid) =>
        val cands = rights.filter(r => r._1 == k && r._2 >= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.minBy(c => (c._2, c._3))._3))
      }.toMap
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
