package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The BPE greedy left-to-right non-overlapping merge rewrite, applied
  * for a LIST of merges in priority order, as one tight JVM pass per
  * merge over the symbol array.
  *
  * Replaces the Catalyst higher-order `aggregate` fold (Bpe.mergeFold):
  * HOF lambdas evaluate interpreted (CodegenFallback), and that fold
  * rebuilds the accumulator array per SYMBOL (`concat(acc, array(x))`)
  * — O(m²) allocations per word per merge. Here each merge is one O(m)
  * in-place walk; a k-merge replay (applyMerges) is one projection of k
  * walks instead of k checkpointed projections. Semantics are pinned
  * identical to the HOF fold by BpeSpec's equivalence law: the merged
  * text a+b can never equal `a` (b non-empty), so a freshly-merged
  * symbol is never consumed as the left half of the same pair — the
  * rewrite is the unique greedy left-to-right non-overlapping one.
  */
case class MergeListFold(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got ${other.sql}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "merge_list_fold"

  // one UTF8String materialization of the merge list per expression
  // instance (per plan), not per row
  @transient private lazy val mergesU: Array[(UTF8String, UTF8String,
      UTF8String)] =
    merges.iterator.map { case (a, b) =>
      (UTF8String.fromString(a), UTF8String.fromString(b),
        UTF8String.fromString(a + b))
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n0 = arr.numElements()
    var syms = new Array[UTF8String](n0)
    var i = 0
    while (i < n0) { syms(i) = arr.getUTF8String(i); i += 1 }
    var n = n0
    var mi = 0
    while (mi < mergesU.length && n > 1) {
      val (a, b, m) = mergesU(mi)
      // in-place: read head i, write head k <= i
      var k = 1
      i = 1
      while (i < n) {
        val cur = syms(i)
        val prev = syms(k - 1)
        if (prev != null && prev.equals(a) && cur != null && cur.equals(b))
          syms(k - 1) = m
        else { syms(k) = cur; k += 1 }
        i += 1
      }
      n = k
      mi += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = syms(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MergeListFold = copy(child = newChild)
}

object MergeListFold {
  /** Column API: replay `merges` (priority order) over a symbol array. */
  def apply(syms: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      new MergeListFold(ColumnBridge.expression(syms), merges))
}
