package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization (UAX #15 compatibility composition) —
  * [[NfcNormalize]]'s compatibility-folding sibling and what production
  * dedup pipelines actually key on: real web text spells the SAME
  * visible content in fullwidth forms (ＡＢＣ vs ABC), typographic
  * ligatures (ﬁle vs file), circled/superscript digits (①, ²) and
  * other compatibility variants that NFC deliberately preserves. NFKC
  * folds them all to the canonical spelling, so exact dedup, shingles,
  * blocklists and tokenizer vocabularies see ONE key per visible
  * string. Folding is lossy by design (② and 2 become equal) — run it
  * for KEYING, keep NFC for display text.
  *
  * Backed by the JDK's `java.text.Normalizer` (the standard UAX #15
  * algorithm + UCD compatibility mappings). Same fast path as NFC:
  * `isNormalized` is a scan with no allocation, true for virtually all
  * real text, so the rewrite allocates only on rows that actually
  * carry compatibility forms.
  */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfkcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NfkcNormalize.normalize($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NfkcNormalize = copy(child = newChild)
}

object NfkcNormalize {
  import java.text.Normalizer

  /** Static kernel shared by eval and codegen. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFKC))
  }

  /** Column-level API. */
  def apply(text: Column): Column =
    ColumnBridge.column(new NfkcNormalize(ColumnBridge.expression(text)))
}
