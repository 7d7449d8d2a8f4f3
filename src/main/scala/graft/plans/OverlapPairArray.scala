package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** In-bucket pair enumeration for the naive overlap path: from one
  * shingle bucket's posting list `array<struct<doc_id: long, n>>`,
  * emit every unordered pair once as
  * `array<struct<d1, n1, d2, n2>>` with d1 = the smaller doc_id —
  * exactly the rows the nested higher-order
  * `flatten(transform(ds, x => transform(filter(ds, y => y.doc_id >
  * x.doc_id), ...)))` emits, in the same order.
  *
  * The HOF tower evaluates interpreted (lambdas are CodegenFallback)
  * and materializes the inner arrays, the outer array AND the
  * flattened copy per bucket; on the Σ df² pair stream that tower was
  * the dominant CPU term of every naive-path near-dup query. This is
  * one allocation per pair plus one output array, in a tight loop.
  */
case class OverlapPairArray(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private def elemType: StructType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.head.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRUCT<doc_id: BIGINT, n>> input, " +
        s"got ${other.sql}")
  }

  override def dataType: DataType = {
    val s = elemType
    ArrayType(StructType(Seq(
      StructField("d1", s(0).dataType, nullable = false),
      StructField("n1", s(1).dataType, nullable = false),
      StructField("d2", s(0).dataType, nullable = false),
      StructField("n2", s(1).dataType, nullable = false))),
      containsNull = false)
  }
  override def prettyName: String = "overlap_pair_array"

  @transient private lazy val nType: DataType = elemType(1).dataType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val ns = new Array[Any](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      ns(i) = row.get(1, nType)
      i += 1
    }
    val out = new java.util.ArrayList[Any](n * (n - 1) / 2)
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (ids(j) > ids(i)) {
          val r = new GenericInternalRow(4)
          r.update(0, ids(i)); r.update(1, ns(i))
          r.update(2, ids(j)); r.update(3, ns(j))
          out.add(r)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): OverlapPairArray = copy(child = newChild)
}

object OverlapPairArray {
  /** Column API: unordered (d1 < d2 by doc_id) pairs of a posting list. */
  def apply(ds: Column): Column =
    ColumnBridge.column(new OverlapPairArray(ColumnBridge.expression(ds)))
}
