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
  * Hash is a DOUBLE-PRIME Horner over UTF-16 code units: two independent
  * rolling hashes h1 (base 131 mod 1e9+7) and h2 (base 137 mod 1e9+9),
  * combined as `h1 * (1e9+9) + h2` — a ~2^60 value space. A single
  * ~2^30 modulus is not enough at corpus scale: with billions of distinct
  * shingles, collisions become routine and inflate the inverted-index df
  * counts and Jaccard numerators, so borderline NON-duplicates can cross
  * tau and be wrongly dropped. Two independent moduli keep the O(n)
  * rolling loop while restoring the collision margin of a 60-bit space.
  *
  * Every intermediate stays well inside a signed 64-bit integer
  * (acc < 2^30, acc*137 + c < 2^38, combined < (1e9+7)*(1e9+9) ~ 2^60),
  * so any engine reproduces the exact values with integer folds — the
  * DuckDB oracle uses two `list_reduce` Horner folds and the same
  * combine (q_chargram_jaccard). ASCII corpus assumption: code unit ==
  * codepoint (documented; the testdata is ASCII word soup).
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

  import RollingShingleHashes.{P1, B1, P2, B2}

  /** B^(k-1) mod P — the weight of the char leaving each window. */
  private def leadWeight(b: Long, p: Long): Long = {
    var r = 1L; var i = 1
    while (i < k) { r = r * b % p; i += 1 }
    r
  }
  private val W1: Long = leadWeight(B1, P1)
  private val W2: Long = leadWeight(B2, P2)

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
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < n && i < k) {
      h1 = (h1 * B1 + s.charAt(i)) % P1
      h2 = (h2 * B2 + s.charAt(i)) % P2
      i += 1
    }
    if (m > 0) out(0) = h1 * P2 + h2
    i = k
    while (i < n) {
      h1 = (h1 - s.charAt(i - k) * W1 % P1 + P1) % P1
      h1 = (h1 * B1 + s.charAt(i)) % P1
      h2 = (h2 - s.charAt(i - k) * W2 % P2 + P2) % P2
      h2 = (h2 * B2 + s.charAt(i)) % P2
      out(i - k + 1) = h1 * P2 + h2
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
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length();
         |int $m = java.lang.Math.max($n - $k + 1, 0);
         |long[] $out = new long[$m];
         |long $h1 = 0L; long $h2 = 0L;
         |int $i = 0;
         |for (; $i < $n && $i < $k; $i++) {
         |  $h1 = ($h1 * ${B1}L + $s.charAt($i)) % ${P1}L;
         |  $h2 = ($h2 * ${B2}L + $s.charAt($i)) % ${P2}L;
         |}
         |if ($m > 0) $out[0] = $h1 * ${P2}L + $h2;
         |for ($i = $k; $i < $n; $i++) {
         |  $h1 = ($h1 - $s.charAt($i - $k) * ${W1}L % ${P1}L + ${P1}L) % ${P1}L;
         |  $h1 = ($h1 * ${B1}L + $s.charAt($i)) % ${P1}L;
         |  $h2 = ($h2 - $s.charAt($i - $k) * ${W2}L % ${P2}L + ${P2}L) % ${P2}L;
         |  $h2 = ($h2 * ${B2}L + $s.charAt($i)) % ${P2}L;
         |  $out[$i - $k + 1] = $h1 * ${P2}L + $h2;
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
  val P1: Long = 1000000007L
  val B1: Long = 131L
  val P2: Long = 1000000009L
  val B2: Long = 137L

  /** Column-level API: array of rolling k-gram hashes of a string column. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(
      new RollingShingleHashes(ColumnBridge.expression(text), k))
}
