package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * codegen'd expression — the canonicalization step a multilingual
  * corpus pipeline runs BEFORE any text keying: the same visible text
  * arrives both precomposed (é = U+00E9) and decomposed (e + U+0301),
  * and without normalization exact dedup, shingle hashes, blocklists
  * and tokenizer vocabularies silently treat them as different
  * documents/words. Backed by the JDK's `java.text.Normalizer` (ICU
  * data, the standard algorithm); the DuckDB oracle's `nfc_normalize`
  * (utf8proc) implements the same UAX #15 mapping, which is what makes
  * the operator oracle-gateable.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually all real text (pure-ASCII passes a lookup-table
  * scan) — the rewrite allocates only on the rare decomposed row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static kernel shared by eval and codegen. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-level API. */
  def apply(text: Column): Column =
    ColumnBridge.column(new NfcNormalize(ColumnBridge.expression(text)))
}
