package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd multi-pattern substring counter (Aho–Corasick): the total
  * number of occurrences, over ALL patterns, anywhere in the input —
  * overlapping occurrences included ("aa" occurs twice in "aaa"), each
  * pattern counted independently ("a" and "ab" both fire on "ab").
  *
  * This is the blocklist primitive of web-corpus curation (the C4-style
  * "badwords" filter): ONE automaton pass per document regardless of
  * how many patterns the list holds, vs one `contains`/`rlike` scan PER
  * PATTERN — at 100 TB and a few hundred patterns that is the
  * difference between 1 and hundreds of passes over every document.
  * The automaton (dense goto table + suffix-link-cumulated terminal
  * counts) is built once per expression instance on the driver and
  * ships inside the serialized plan; the per-row loop is O(len(text))
  * with two array reads per character.
  *
  * ASCII patterns only (same documented corpus assumption as
  * [[RollingShingleHashes]]): input characters outside [0,128) have no
  * transitions and reset matching to the root. NULL input -> NULL.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "pattern list must be non-empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")
  require(patterns.forall(_.forall(_ < 128)),
    "patterns must be ASCII (the documented corpus assumption)")
  require(patterns.distinct == patterns,
    s"duplicate patterns: ${patterns.diff(patterns.distinct).mkString(", ")}")

  // Dense-transition Aho–Corasick: delta(state)(char) is total (the BFS
  // folds failure links into the goto table), outCnt(state) = number of
  // patterns ending at the state OR at any state on its suffix chain.
  // Built lazily on first use per JVM (driver at plan time, each
  // executor after deserialization) — ~nodes*128 ints, trivial beside a
  // task's data.
  @transient private lazy val (delta: Array[Array[Int]], outCnt: Array[Int]) =
    MultiPatternCount.build(patterns)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "multi_pattern_count"

  /** The shared per-row loop — called from BOTH the interpreted path and
    * the generated code (via an addReferenceObj handle; the loop runs as
    * one JIT'd JVM method, no interpreted expression tree per row).
    */
  def countMatches(s: UTF8String): Long = {
    // walk the UTF-8 bytes directly — no per-row String allocation
    // (toString = copy + UTF-16 decode on the hot scan path). Patterns
    // are ASCII, so the byte walk is semantics-identical to a char
    // walk: every byte of a multi-byte UTF-8 sequence is >= 0x80
    // (negative as a signed byte) and resets matching to the root,
    // exactly as the non-ASCII char did.
    val n = s.numBytes
    var state = 0
    var hits = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      state = if (b >= 0) delta(state)(b) else 0
      hits += outCnt(state)
      i += 1
    }
    hits
  }

  override protected def nullSafeEval(input: Any): Any =
    countMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acMatcher", this,
      classOf[MultiPatternCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countMatches($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternCount {

  /** Classic BFS construction; returns (goto-with-failure table, terminal
    * counts cumulated along suffix links).
    */
  private[plans] def build(patterns: Seq[String]): (Array[Array[Int]], Array[Int]) = {
    val maxNodes = patterns.map(_.length).sum + 1
    val next = Array.fill(maxNodes, 128)(-1)   // trie edges
    val ends = new Array[Int](maxNodes)        // patterns ending here
    var nNodes = 1
    for (p <- patterns) {
      var s = 0
      for (ch <- p) {
        if (next(s)(ch) == -1) { next(s)(ch) = nNodes; nNodes += 1 }
        s = next(s)(ch)
      }
      ends(s) += 1
    }
    val fail = new Array[Int](nNodes)
    val outCnt = new Array[Int](nNodes)
    val delta = Array.ofDim[Int](nNodes, 128)
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 128) {
      val v = next(0)(c)
      if (v == -1) delta(0)(c) = 0
      else { delta(0)(c) = v; fail(v) = 0; queue.add(v) }
      c += 1
    }
    outCnt(0) = ends(0)
    while (!queue.isEmpty) {
      val u = queue.poll()
      outCnt(u) = ends(u) + outCnt(fail(u))
      c = 0
      while (c < 128) {
        val v = next(u)(c)
        if (v == -1) delta(u)(c) = delta(fail(u))(c)
        else { delta(u)(c) = v; fail(v) = delta(fail(u))(c); queue.add(v) }
        c += 1
      }
    }
    (delta.take(nNodes), outCnt)
  }

  /** Column-level API: total occurrences of any pattern in the text. */
  def apply(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      new MultiPatternCount(ColumnBridge.expression(text), patterns))
}
