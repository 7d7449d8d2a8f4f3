package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct word-k-gram shingle hashes: value-identical to
  *
  * {{{ array_distinct(transform(sequence(1, n-k+1),
  *       i => stableHash60(array_join(slice(split(text, " "), i, k), " ")))) }}}
  *
  * (md5 of the space-joined window, first 15 hex chars parsed base-16 —
  * the engine-portable 60-bit hash every shingle oracle replicates), but
  * computed by one static Java kernel per row instead of five nested
  * interpreted higher-order expressions with a Catalyst closure call and
  * array allocation per window. The generated code calls the kernel
  * directly, so the expression pipelines inside whole-stage codegen.
  *
  * Exactness notes: tokenization replicates Spark `split(text, " ")`
  * (trailing empty tokens KEPT — Java's `String.split` drops them, so the
  * kernel splits manually); dedup preserves first-occurrence order like
  * `array_distinct`. Returns an empty array when there are fewer than k
  * tokens; NULL for NULL input.
  */
case class WordShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle width must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShingleHashes.compute($c, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {

  /** Row kernel, called from generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    // replicate Spark split(text, " "): every separator splits, trailing
    // empty tokens kept (Java's split(regex) would drop them)
    val str = s.toString
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') { toks.add(str.substring(start, i)); start = i + 1 }
      i += 1
    }
    toks.add(str.substring(start))
    val n = toks.size()
    val m = n - k + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(w + j))
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars base-16 = bytes 0..6 plus the high nibble of
      // byte 7 — exactly conv(substring(md5(x), 1, 15), 16, 10)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
      v = (v << 4) | ((digest(7) & 0xf0L) >> 4)
      seen.add(v)
      w += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(
      new WordShingleHashes(ColumnBridge.expression(text), k))
}
