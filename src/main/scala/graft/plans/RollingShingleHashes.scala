package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd rolling polynomial hash over all character k-grams of a
  * string: output[i] = hash(s[i .. i+k-1]) for every window position.
  *
  * Hash is Horner over UTF-16 code units, base 131 mod 1e9+7 — the same
  * value any engine computes with a fold `(acc*131 + code) % p`, so the
  * DuckDB oracle replicates it with `list_reduce` (exact integer math,
  * no overflow: acc < 2^30, acc*131 + c < 2^38). ASCII corpus assumption:
  * code unit == codepoint (documented; the testdata is ASCII word soup).
  *
  * Why a custom expression: the built-in route (`transform(sequence(...),
  * i -> hash(substring(text, i, k)))`) is O(n*k) with a per-window string
  * allocation, evaluates the lambda interpreted OUTSIDE whole-stage
  * codegen, and with md5 pays a digest per window. This is the shingling
  * inner loop of every near-dup pass over a 100 TB corpus — here it is a
  * single O(n) rolling loop emitted INTO the generated code, zero
  * allocations beyond the output array.
  *
  * Returns an empty array for strings shorter than k; NULL for NULL input.
  */
case class RollingShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle width must be positive, got $k")

  private val P: Long = 1000000007L
  private val B: Long = 131L
  /** B^(k-1) mod P — the weight of the char leaving the window. */
  private val BK1: Long = {
    var r = 1L; var i = 1
    while (i < k) { r = r * B % P; i += 1 }
    r
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val m = math.max(n - k + 1, 0)
    val out = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < n && i < k) { h = (h * B + s.charAt(i)) % P; i += 1 }
    if (m > 0) out(0) = h
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * BK1 % P + P) % P
      h = (h * B + s.charAt(i)) % P
      out(i - k + 1) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length();
         |int $m = java.lang.Math.max($n - $k + 1, 0);
         |long[] $out = new long[$m];
         |long $h = 0L;
         |int $i = 0;
         |for (; $i < $n && $i < $k; $i++) {
         |  $h = ($h * ${B}L + $s.charAt($i)) % ${P}L;
         |}
         |if ($m > 0) $out[0] = $h;
         |for ($i = $k; $i < $n; $i++) {
         |  $h = ($h - $s.charAt($i - $k) * ${BK1}L % ${P}L + ${P}L) % ${P}L;
         |  $h = ($h * ${B}L + $s.charAt($i)) % ${P}L;
         |  $out[$i - $k + 1] = $h;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingShingleHashes =
    copy(child = newChild)
}

object RollingShingleHashes {
  /** Column-level API: array of rolling k-gram hashes of a string column. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(
      new RollingShingleHashes(ColumnBridge.expression(text), k))
}
