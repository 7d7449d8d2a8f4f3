package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws for NFKC compatibility normalization: the folds themselves,
  * idempotence, ASCII identity, NFKC ⊇ NFC, and the dedup motivation —
  * exact dedup after NFKC collapses the fullwidth/ligature twins that
  * NFC alone keeps distinct. All fixture literals are \u escapes
  * (the NfcNormalizeSpec rule): source encoding must not decide which
  * form a test string is in.
  */
class NfkcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("folds fullwidth, ligatures, circled and superscript digits; " +
       "includes canonical composition; idempotent; ASCII identity; " +
       "null-safe") {
    val rows = Seq(
      Some("\uFF21\uFF22\uFF23"),  // fullwidth ABC
      Some("\uFB01le"),            // fi-ligature + le
      Some("\u2460"),              // circled one
      Some("\u00B2"),              // superscript two
      Some("caf\u0065\u0301"),     // DECOMPOSED e + combining acute
      Some("plain ascii"),
      None).toDF("t")
    val out = rows.select(NfkcNormalize(col("t")).as("n")).collect()
    assert(out(0).getString(0) == "ABC")
    assert(out(1).getString(0) == "file")
    assert(out(2).getString(0) == "1")
    assert(out(3).getString(0) == "2")
    assert(out(4).getString(0) == "caf\u00e9") // NFKC composes too
    assert(out(5).getString(0) == "plain ascii")
    assert(out(6).isNullAt(0))
    val twice = rows.filter(col("t").isNotNull)
      .select((NfkcNormalize(NfkcNormalize(col("t"))) ===
        NfkcNormalize(col("t"))).as("eq")).as[Boolean].collect()
    assert(twice.forall(identity))
  }

  test("the dedup law: exact dedup after NFKC collapses the fullwidth/" +
       "ligature twins that NFC alone keeps distinct") {
    val docs = Seq(
      (1L, "\uFF21\uFF22\uFF23 report attached"), // fullwidth spelling
      (2L, "ABC report attached"),                // ASCII spelling
      (3L, "\uFB01le the \uFB02ight plan"),       // ligature spelling
      (4L, "file the flight plan"))               // ASCII spelling
      .toDF("doc_id", "text")
    val raw = docs.groupBy(col("text")).count().count()
    val nfc = docs.groupBy(NfcNormalize(col("text"))).count().count()
    val nfkc = docs.groupBy(NfkcNormalize(col("text"))).count().count()
    // NFC preserves compatibility forms: the twins stay distinct
    assert(raw == 4L && nfc == 4L)
    // NFKC is the keying normalization: both twin pairs collapse
    assert(nfkc == 2L)
  }

  test("the YAML stage runs it: nfkc_normalize + exact_dedup keeps one " +
       "copy per visible spelling") {
    import graft.engine.CurationPipeline
    val docs = Seq(
      (1L, "\uFF21\uFF22\uFF23 report"),
      (2L, "ABC report"),
      (3L, "unrelated doc")).toDF("doc_id", "text")
    val out = Seq(
      CurationPipeline.Stage("nfkc_normalize", Map.empty),
      CurationPipeline.Stage("exact_dedup", Map.empty))
      .foldLeft(docs)((df, st) =>
        CurationPipeline.applyStage(df, st, Some(spark)))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L), ids) // min-id copy kept per key
  }
}
