package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi (min-cost) segmentation of a word under a unigram token
  * vocabulary — the E-step kernel of unigram-LM (SentencePiece-style)
  * tokenizer training (Kudo 2018, "Subword Regularization", hard-EM
  * variant: expectations from the single best segmentation).
  *
  * The vocabulary (tokens + integer costs, micro-nats) is embedded in
  * the expression instance — vocab-bounded by construction, built once
  * per EM iteration on the driver and shipped inside the serialized
  * plan exactly like [[MultiPatternCount]]'s automaton. The per-row DP
  * is O(len(word) x maxTokenLen) with a hash lookup per candidate —
  * one narrow map over the DISTINCT-WORD table (never the corpus), so
  * an EM iteration at 100 TB costs one pass over the vocabulary table.
  *
  * Determinism contract (oracle-replicated, DedupSpec-style law in
  * UnigramSpec): among all full segmentations the result minimizes
  * (total cost, then token count, then prefers the LONGER token at the
  * first differing position) — equivalently the first row of
  * `ORDER BY cost, ntok, list_transform(path, t -> -len(t))` over the
  * enumerated segmentations, which is what the DuckDB oracle runs.
  * The right-to-left DP realizes that order because the tie-break is
  * lexicographic left-to-right and two same-position candidates of
  * equal length are the same substring. Unsegmentable words (a char
  * absent from the vocab) yield NULL; trainers guarantee single-char
  * coverage so this marks data outside the training alphabet.
  */
case class UnigramSegment(child: Expression, tokens: Seq[String],
                          costs: Seq[Long])
    extends UnaryExpression {

  require(tokens.nonEmpty, "vocabulary must be non-empty")
  require(tokens.size == costs.size, "tokens/costs length mismatch")
  require(tokens.forall(_.nonEmpty), "tokens must be non-empty strings")
  require(tokens.distinct == tokens,
    s"duplicate tokens: ${tokens.diff(tokens.distinct).mkString(", ")}")

  @transient private lazy val costOf: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](tokens.size * 2)
    tokens.iterator.zip(costs.iterator).foreach { case (t, c) =>
      m.put(t, java.lang.Long.valueOf(c))
    }
    m
  }
  @transient private lazy val maxLen: Int = tokens.map(_.length).max

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_segment"

  /** Shared by the interpreted and generated paths (addReferenceObj
    * handle, same device as [[MultiPatternCount.countMatches]]).
    * Returns null when the word cannot be segmented from the vocab.
    */
  def segment(input: UTF8String): GenericArrayData = {
    val w = input.toString // distinct-word table: not the corpus hot path
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // right-to-left DP: best cost/ntok/first-token-length per suffix
    val INF = Long.MaxValue / 4
    val cost = new Array[Long](n + 1)
    val ntok = new Array[Int](n + 1)
    val pick = new Array[Int](n + 1) // chosen token length at position i
    cost(n) = 0L; ntok(n) = 0; pick(n) = 0
    var i = n - 1
    while (i >= 0) {
      cost(i) = INF; ntok(i) = Int.MaxValue; pick(i) = 0
      val lim = math.min(maxLen, n - i)
      var l = 1
      while (l <= lim) {
        if (cost(i + l) < INF) {
          val c = costOf.get(w.substring(i, i + l))
          if (c != null) {
            val cc = c.longValue + cost(i + l)
            val nn = ntok(i + l) + 1
            // strictly better, or equal (cost, ntok) with longer token
            // (l increases through the loop, so >= keeps the longest)
            if (cc < cost(i) || (cc == cost(i) &&
                (nn < ntok(i) || (nn == ntok(i) && l >= pick(i)))))
              { cost(i) = cc; ntok(i) = nn; pick(i) = l }
          }
        }
        l += 1
      }
      i -= 1
    }
    if (cost(0) >= INF) return null
    val out = new Array[Any](ntok(0))
    var p = 0; var k = 0
    while (p < n) {
      out(k) = UTF8String.fromString(w.substring(p, p + pick(p)))
      p += pick(p); k += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSeg", this,
      classOf[UnigramSegment].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.segment($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {
  /** Column-level API: best segmentation (array&lt;string&gt;) or NULL. */
  def apply(word: Column, tokens: Seq[String], costs: Seq[Long]): Column =
    ColumnBridge.column(
      new UnigramSegment(ColumnBridge.expression(word), tokens, costs))
}
