package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy LZ77 match coverage — the deterministic core of the classic
  * compression-ratio quality filter (the C4/Gopher/RefinedWeb
  * "too-compressible boilerplate" screen): text that a dictionary
  * compressor collapses to almost nothing is template/boilerplate, not
  * prose. Instead of invoking a real compressor (whose emitted byte
  * count is library/version-specific and oracle-opaque), this measures
  * the thing the compressor exploits — the fraction of characters
  * covered by back-references — with ONE exactly-specified rule both
  * engines replay:
  *
  *   scan left to right; at position p take the LONGEST L in
  *   [minLen, maxLen] such that the codepoints at [p, p+L) also occur
  *   starting at some i < p (overlap with the region being matched is
  *   allowed, the standard LZ77 self-referential copy); if one exists,
  *   count L characters as matched and advance by L, else advance 1.
  *
  * Deterministic and engine-portable by construction: only match
  * LENGTHS matter (never which source position), all arithmetic is
  * integer, and positions are Unicode codepoints (both engines'
  * substr/length units). The DuckDB twin walks the identical rule as a
  * recursive CTE — valid(L) ⇔ instr(prefix-with-overlap, window) ≤ p.
  *
  * Scale shape: a narrow per-row map (no shuffle, stays inside
  * whole-stage codegen via the static kernel). Per row the hash-chain
  * parse is O(n · chain); documents are length-bounded, and a
  * production variant bounds the window like gzip — the rule here is
  * whole-doc because quality docs are short and the oracle replays it.
  */
case class LzMatchedChars(child: Expression, minLen: Int, maxLen: Int)
    extends UnaryExpression {

  require(minLen >= 2 && maxLen >= minLen,
    s"need 2 <= minLen <= maxLen, got ($minLen, $maxLen)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "lz_matched_chars"

  override protected def nullSafeEval(input: Any): Any =
    LzMatchedChars.matched(input.asInstanceOf[UTF8String], minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LzMatchedChars.matched($c, $minLen, " +
        s"$maxLen);")

  override protected def withNewChildInternal(
      newChild: Expression): LzMatchedChars = copy(child = newChild)
}

object LzMatchedChars {

  /** Static kernel shared by eval and codegen: total characters covered
    * by greedy longest matches (see class doc). Candidate sources are
    * found through a minLen-gram hash chain (gzip's device) and
    * verified by direct codepoint comparison, so hash collisions cannot
    * change the result — the chain is exhaustive over true minLen-gram
    * repeats, and any match of length >= minLen shares its first
    * minLen-gram with an earlier position in the chain.
    */
  def matched(s: UTF8String, minLen: Int, maxLen: Int): Long = {
    val str = s.toString
    val n16 = str.length
    if (n16 < minLen) return 0L
    // codepoint array: DuckDB substr/length count codepoints, so the
    // match units must too (ASCII fast path: char == codepoint)
    val cps = new Array[Int](str.codePointCount(0, n16))
    var ci = 0
    var si = 0
    while (si < n16) {
      val cp = str.codePointAt(si)
      cps(ci) = cp
      ci += 1
      si += Character.charCount(cp)
    }
    val n = cps.length
    if (n < minLen) return 0L
    // gram-keyed position chains: key = rolling hash of cps[i, i+minLen)
    val heads = new java.util.HashMap[Integer, IntChain]()
    def gramKey(i: Int): Int = {
      var h = 17
      var j = 0
      while (j < minLen) { h = h * 1000003 + cps(i + j); j += 1 }
      h
    }
    var total = 0L
    var p = 0
    var registered = 0 // positions [0, registered) are in the chains
    while (p < n) {
      // register every position that became a legal source since the
      // last step (skipped-over positions are sources too)
      while (registered < p && registered + minLen <= n) {
        val k = Integer.valueOf(gramKey(registered))
        val chain = heads.get(k)
        if (chain == null) heads.put(k, new IntChain(registered))
        else chain.add(registered)
        registered += 1
      }
      var best = 0
      if (p + minLen <= n) {
        val chain = heads.get(Integer.valueOf(gramKey(p)))
        if (chain != null) {
          val cap = math.min(maxLen, n - p)
          var idx = 0
          while (idx < chain.size && best < cap) {
            val i = chain.get(idx)
            // gzip's screen: extend only candidates that can beat the
            // current best (first mismatch check at offset `best`)
            if (best < minLen || cps(i + best) == cps(p + best)) {
              var l = 0
              while (l < cap && cps(i + l) == cps(p + l)) l += 1
              if (l > best) best = l
            }
            idx += 1
          }
        }
      }
      if (best >= minLen) { total += best; p += best }
      else p += 1
    }
    total
  }

  /** Growable int list (append-only candidate chain). */
  private final class IntChain(first: Int) {
    private var arr = new Array[Int](4)
    arr(0) = first
    var size: Int = 1
    def add(v: Int): Unit = {
      if (size == arr.length) arr = java.util.Arrays.copyOf(arr, size * 2)
      arr(size) = v
      size += 1
    }
    def get(i: Int): Int = arr(i)
  }

  /** Column-level API: matched-character count under greedy LZ77 with
    * the given match-length bounds.
    */
  def apply(text: Column, minLen: Int = 4, maxLen: Int = 32): Column =
    ColumnBridge.column(
      new LzMatchedChars(ColumnBridge.expression(text), minLen, maxLen))
}
