package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent token pairs of a string array, as one tight walk.
  *
  * Replaces the engine's bigram idiom
  * `zip_with(slice(ws,1,n-1), slice(ws,2,n-1), (a,b) => …)`: the
  * higher-order functions evaluate interpreted (CodegenFallback
  * lambdas) and the two slices copy the token array twice per row
  * before the zip allocates again. Both output shapes of the idiom are
  * provided — struct pairs for LM scoring joins and "a b"
  * concatenations for bigram tables — emitting exactly the rows the
  * HOF form emits, in order (empty and 1-token arrays yield an empty
  * array; a null element passes through as the HOF's struct/concat
  * would).
  */
case class AdjacentPairs(child: Expression, concatSep: Option[String])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got ${other.sql}")
  }

  override def dataType: DataType = concatSep match {
    case Some(_) => ArrayType(StringType, containsNull = true)
    case None => ArrayType(StructType(Seq(
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true))),
      containsNull = false)
  }
  override def prettyName: String = "adjacent_pairs"

  @transient private lazy val sepU: UTF8String =
    UTF8String.fromString(concatSep.getOrElse(""))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](n - 1)
    i = 0
    if (concatSep.isDefined) {
      while (i < n - 1) {
        // concat(a, sep, b): null if either side is null (concat's
        // null-in/null-out), matching the HOF lambda exactly
        out(i) =
          if (toks(i) == null || toks(i + 1) == null) null
          else UTF8String.concat(toks(i), sepU, toks(i + 1))
        i += 1
      }
    } else {
      while (i < n - 1) {
        val r = new GenericInternalRow(2)
        r.update(0, toks(i)); r.update(1, toks(i + 1))
        out(i) = r
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): AdjacentPairs = copy(child = newChild)
}

object AdjacentPairs {
  /** array<struct<a,b>> of adjacent elements. */
  def apply(ws: Column): Column =
    ColumnBridge.column(
      new AdjacentPairs(ColumnBridge.expression(ws), None))

  /** array<string> of adjacent elements joined by `sep`. */
  def concatenated(ws: Column, sep: String = " "): Column =
    ColumnBridge.column(
      new AdjacentPairs(ColumnBridge.expression(ws), Some(sep)))
}
