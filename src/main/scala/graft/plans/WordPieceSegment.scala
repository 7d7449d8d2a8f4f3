package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first WordPiece segmentation (Schuster &
  * Nakajima 2012; the BERT `WordpieceTokenizer` inference rule): at
  * each position take the LONGEST vocabulary piece that matches —
  * word-initial pieces match bare, word-internal ones via their
  * `##`-prefixed continuation form — and fail the WHOLE word to NULL
  * (the caller's `[UNK]`) if any position has no match. No global
  * backtracking: this is the published algorithm, not a best-path
  * search ([[UnigramSegment]] is the DP sibling).
  *
  * The piece vocabulary is embedded in the expression instance —
  * vocab-bounded by construction, shipped inside the serialized plan
  * like [[MultiPatternCount]]'s automaton — and the per-row scan is
  * O(len(word) x maxPieceLen) hash lookups over the DISTINCT-WORD
  * table, never the corpus.
  *
  * Determinism contract (oracle-replicated): the longest match at a
  * position is unique (two same-length matches of the same substring
  * are the same string), so the greedy walk is a single deterministic
  * path — the DuckDB twin materializes the per-(word, position)
  * longest-match successor table and walks it recursively.
  */
case class WordPieceSegment(child: Expression, pieces: Seq[String])
    extends UnaryExpression {

  require(pieces.nonEmpty, "piece vocabulary must be non-empty")
  require(pieces.forall(_.nonEmpty), "pieces must be non-empty strings")
  require(pieces.distinct == pieces,
    s"duplicate pieces: ${pieces.diff(pieces.distinct).mkString(", ")}")

  // split the vocabulary into word-initial and continuation lookups.
  // The literal piece "##" is a WORD-INITIAL piece (a corpus where
  // '##' is a frequent standalone word trains it — e.g. markdown), not
  // a continuation marker: the marker form is '##' + non-empty raw.
  @transient private lazy val initial: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.size * 2)
    pieces.iterator
      .filterNot(p => p.startsWith("##") && p.length > 2)
      .foreach(s.add)
    s
  }
  @transient private lazy val cont: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.size * 2)
    pieces.iterator.filter(p => p.startsWith("##") && p.length > 2)
      .map(_.substring(2)).foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int =
    pieces.iterator.map(p =>
      if (p.startsWith("##") && p.length > 2) p.length - 2
      else p.length).max

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wordpiece_segment"

  /** Shared by the interpreted and generated paths. Returns the piece
    * array (continuations carrying their `##` prefix) or null when the
    * greedy walk dead-ends (the word is `[UNK]`).
    */
  def segment(input: UTF8String): GenericArrayData = {
    val w = input.toString // distinct-word table: not the corpus hot path
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](4)
    var p = 0
    while (p < n) {
      val set = if (p == 0) initial else cont
      var l = math.min(maxLen, n - p)
      var hit = 0
      while (l >= 1 && hit == 0) {
        if (set.contains(w.substring(p, p + l))) hit = l else l -= 1
      }
      if (hit == 0) return null // no match at p: whole word is [UNK]
      val piece =
        if (p == 0) w.substring(0, hit)
        else "##" + w.substring(p, p + hit)
      out.add(UTF8String.fromString(piece))
      p += hit
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceSeg", this,
      classOf[WordPieceSegment].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.segment($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceSegment =
    copy(child = newChild)
}

object WordPieceSegment {
  /** Column-level API: greedy piece array (array&lt;string&gt;) or NULL
    * for `[UNK]` words.
    */
  def apply(word: Column, pieces: Seq[String]): Column =
    ColumnBridge.column(
      new WordPieceSegment(ColumnBridge.expression(word), pieces))
}
