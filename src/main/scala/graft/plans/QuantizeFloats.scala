package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd integer quantization of a float embedding:
  * out[i] = floor(v[i] * scale) as long — identical values to the
  * higher-order form `transform(v, x => floor(x.cast(double) * scale))`
  * (float->double widening and the multiply are exact IEEE ops), but the
  * HOF lambda evaluates interpreted with a per-element closure call; this
  * is the prologue of every vector operator (dedup, ANN, centroids), so
  * it belongs inside whole-stage codegen next to `LongArrayDot`.
  *
  * NULL input -> NULL; NULL elements are rejected by type check (embedding
  * arrays are containsNull=false from parquet).
  */
case class QuantizeFloats(child: Expression, scale: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_floats"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // embeddings are dense; a null element is data corruption, not a
      // case to silently coerce
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$prettyName: null element at index $i")
      out(i) = math.floor(a.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) throw new IllegalArgumentException(
         |    "quantize_floats: null element at index " + $i);
         |  $out[$i] = (long) java.lang.Math.floor(
         |    (double) $c.getFloat($i) * $scale);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeFloats =
    copy(child = newChild)
}

object QuantizeFloats {
  def apply(v: Column, scale: Int = 1000): Column =
    ColumnBridge.column(
      new QuantizeFloats(ColumnBridge.expression(v), scale))
}
