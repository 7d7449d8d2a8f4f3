package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Codegen'd quantized-cosine threshold gate:
  * `dot(qv1,qv2) > 0 && dot² · tauDen² ≥ qn1 · qn2 · tauNum²` — ONE
  * dot-product evaluation per row.
  *
  * Why it exists: the Column-level gate
  * (`qcosineGate(LongArrayDot(a,b), …)` with DECIMAL(19) casts) is
  * correct but hostile to predicate pushdown — when Catalyst pushes the
  * filter into a join CONDITION (which it should: it prunes candidate
  * rows before they materialize), expression inlining makes the
  * condition evaluate the 64-element dot THREE times per candidate row
  * plus two BigDecimal multiplies (measured: 107 s of a 120M-candidate
  * LSH pass at sf1). This expression is one tight loop plus an
  * overflow-guarded long comparison: products that fit in 64 bits (any
  * sane quantization scale — dim 64 · scale 1000² ⇒ d ≤ 2^26) compare
  * as longs; larger values fall back to BigInteger in a cold static
  * helper. Same results as the decimal form on every input.
  */
case class QCosineGateExpr(qv1: Expression, qv2: Expression,
                           qn1: Expression, qn2: Expression,
                           tauNum: Int, tauDen: Int)
    extends QuaternaryExpression {

  require(tauNum >= 0 && tauDen > 0, s"bad tau $tauNum/$tauDen")

  override def first: Expression = qv1
  override def second: Expression = qv2
  override def third: Expression = qn1
  override def fourth: Expression = qn2

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arr(qv1.dataType) && arr(qv2.dataType) &&
      qn1.dataType == LongType && qn2.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (ARRAY<BIGINT>, ARRAY<BIGINT>, BIGINT, BIGINT)")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "qcosine_gate"

  override protected def nullSafeEval(a: Any, b: Any, n1: Any, n2: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L
    var i = 0
    while (i < n) { d += x.getLong(i) * y.getLong(i); i += 1 }
    QCosineGateExpr.gate(d, n1.asInstanceOf[Long], n2.asInstanceOf[Long],
      tauNum, tauDen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n1, n2) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $d = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $d += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = graft.plans.QCosineGateExpr.gate(
         |  $d, $n1, $n2, $tauNum, $tauDen);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): QCosineGateExpr =
    copy(qv1 = f, qv2 = s, qn1 = t, qn2 = q)
}

object QCosineGateExpr {

  /** d > 0 && d²·tauDen² ≥ qn1·qn2·tauNum², exact. Fast path in longs
    * when every product provably fits 63 bits; BigInteger otherwise.
    */
  def gate(d: Long, qn1: Long, qn2: Long, tauNum: Int, tauDen: Int): Boolean = {
    if (d <= 0) return false
    val den2 = tauDen.toLong * tauDen
    val num2 = tauNum.toLong * tauNum
    // d ≤ dMax ⇒ d·d ≤ Long.Max/den2; qn bounds likewise
    val dMax = math.sqrt(Long.MaxValue.toDouble / den2).toLong - 1
    val qMaxProd = if (num2 == 0) Long.MaxValue
      else Long.MaxValue / num2
    if (d <= dMax && qn1 >= 0 && qn2 >= 0 &&
      (qn1 == 0 || qn2 <= qMaxProd / math.max(qn1, 1L))) {
      d * d * den2 >= qn1 * qn2 * num2
    } else {
      import java.math.BigInteger
      val lhs = BigInteger.valueOf(d).pow(2)
        .multiply(BigInteger.valueOf(den2))
      val rhs = BigInteger.valueOf(qn1).multiply(BigInteger.valueOf(qn2))
        .multiply(BigInteger.valueOf(num2))
      lhs.compareTo(rhs) >= 0
    }
  }

  /** Column-level API. */
  def apply(qv1: Column, qv2: Column, qn1: Column, qn2: Column,
            tauNum: Int, tauDen: Int): Column =
    ColumnBridge.column(new QCosineGateExpr(
      ColumnBridge.expression(qv1), ColumnBridge.expression(qv2),
      ColumnBridge.expression(qn1), ColumnBridge.expression(qn2),
      tauNum, tauDen))
}
