package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws for NFC normalization: composition, idempotence, ASCII
  * identity, and the dedup motivation (decomposed and precomposed
  * spellings key identically after normalization). All fixture
  * literals are \u escapes — source encoding must not decide which
  * normalization form a test string is in.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("composes decomposed sequences, is idempotent, identity on " +
       "ASCII, null-safe") {
    val rows = Seq(
      Some("caf\u0065\u0301"), // DECOMPOSED e + combining acute
      Some("caf\u00e9"),       // already composed
      Some("\u0041\u030A"),    // A + combining ring -> U+00C5
      Some("plain ascii"),
      None).toDF("t")
    val out = rows.select(NfcNormalize(col("t")).as("n"),
        length(col("t")).as("lr"), length(NfcNormalize(col("t"))).as("ln"))
      .collect()
    assert(out(0).getString(0) == "caf\u00e9" &&
      out(0).getInt(1) == 5 && out(0).getInt(2) == 4)
    assert(out(1).getString(0) == "caf\u00e9" && out(1).getInt(2) == 4)
    assert(out(2).getString(0) == "\u00c5" && out(2).getInt(2) == 1)
    assert(out(3).getString(0) == "plain ascii")
    assert(out(4).isNullAt(0))
    // idempotence
    val twice = rows.filter(col("t").isNotNull)
      .select((NfcNormalize(NfcNormalize(col("t"))) ===
        NfcNormalize(col("t"))).as("eq")).as[Boolean].collect()
    assert(twice.forall(identity))
  }

  test("the dedup motivation: decomposed and precomposed spellings of " +
       "the same text collide only after normalization") {
    val docs = Seq(
      (1L, "resum\u0065\u0301 attached"), // decomposed
      (2L, "resum\u00e9 attached"))       // precomposed
      .toDF("doc_id", "text")
    val raw = docs.groupBy(col("text")).count().count()
    val norm = docs.groupBy(NfcNormalize(col("text"))).count().count()
    assert(raw == 2L && norm == 1L)
  }
}
