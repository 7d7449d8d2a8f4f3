package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql("... long_array_dot(a, b)
  * ...")` works next to the Column API.
  *
  * Wire-up:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or: spark.sql.extensions=graft.plans.GraftExtensions (conf)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.longArrayDotDescriptor)
    ext.injectFunction(GraftExtensions.rollingShingleHashesDescriptor)
    ext.injectFunction(GraftExtensions.quantizeFloatsDescriptor)
    ext.injectFunction(GraftExtensions.wordShingleHashesDescriptor)
    ext.injectFunction(GraftExtensions.sortedIntersectDescriptor)
    ext.injectFunction(GraftExtensions.qcosineGateDescriptor)
    ext.injectFunction(GraftExtensions.multiPatternCountDescriptor)
  }
}

object GraftExtensions {
  private[plans] val longArrayDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("long_array_dot"),
    new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"long_array_dot takes 2 arguments, got ${children.length}")
      LongArrayDot(children.head, children(1))
    })

  private[plans] val rollingShingleHashesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_shingle_hashes"),
    new ExpressionInfo(classOf[RollingShingleHashes].getName,
      "rolling_shingle_hashes"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"rolling_shingle_hashes takes (text, k), got ${children.length} args")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"rolling_shingle_hashes k must be an INT literal, got $other")
      }
      RollingShingleHashes(children.head, k)
    })

  private[plans] val quantizeFloatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("quantize_floats"),
    new ExpressionInfo(classOf[QuantizeFloats].getName, "quantize_floats"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"quantize_floats takes (vector, scale), got ${children.length} args")
      val scale = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"quantize_floats scale must be an INT literal, got $other")
      }
      QuantizeFloats(children.head, scale)
    })

  private[plans] val wordShingleHashesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingle_hashes"),
    new ExpressionInfo(classOf[WordShingleHashes].getName,
      "word_shingle_hashes"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"word_shingle_hashes takes (text, k), got ${children.length} args")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"word_shingle_hashes k must be an INT literal, got $other")
      }
      WordShingleHashes(children.head, k)
    })

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an INT literal, got $other")
  }

  private[plans] val sortedIntersectDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_long_array_intersect_size"),
    new ExpressionInfo(classOf[SortedLongArrayIntersectSize].getName,
      "sorted_long_array_intersect_size"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"sorted_long_array_intersect_size takes 2 arguments, " +
          s"got ${children.length}")
      SortedLongArrayIntersectSize(children.head, children(1))
    })

  private[plans] val qcosineGateDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("qcosine_gate"),
    new ExpressionInfo(classOf[QCosineGateExpr].getName, "qcosine_gate"),
    (children: Seq[Expression]) => {
      require(children.length == 6,
        s"qcosine_gate takes (qv1, qv2, qn1, qn2, tauNum, tauDen), " +
          s"got ${children.length} args")
      QCosineGateExpr(children(0), children(1), children(2), children(3),
        intLit(children(4), "qcosine_gate tauNum"),
        intLit(children(5), "qcosine_gate tauDen"))
    })

  private[plans] val multiPatternCountDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("multi_pattern_count"),
    new ExpressionInfo(classOf[MultiPatternCount].getName,
      "multi_pattern_count"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"multi_pattern_count takes (text, array('p1', ...)), " +
          s"got ${children.length} args")
      // patterns must be a literal string array: the automaton is built
      // at plan time, not per row
      import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
      import org.apache.spark.unsafe.types.UTF8String
      val patterns = children(1) match {
        case CreateArray(elems, _) => elems.map {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"multi_pattern_count patterns must be non-NULL STRING " +
              s"literals, got $other")
        }
        case lit @ Literal(_, _) =>
          lit.eval() match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              (0 until a.numElements()).map { i =>
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  "multi_pattern_count patterns must be non-NULL STRING " +
                    s"literals, got NULL at position $i")
                a.getUTF8String(i).toString
              }
            case other => throw new IllegalArgumentException(
              s"multi_pattern_count patterns must be an ARRAY<STRING> " +
                s"literal, got $other")
          }
        case other => throw new IllegalArgumentException(
          s"multi_pattern_count patterns must be an ARRAY<STRING> " +
            s"literal, got $other")
      }
      MultiPatternCount(children.head, patterns)
    })

  /** Register on an existing session (tests, REPLs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    for ((id, _, builder) <- Seq(longArrayDotDescriptor,
        rollingShingleHashesDescriptor, quantizeFloatsDescriptor,
        wordShingleHashesDescriptor, sortedIntersectDescriptor,
        qcosineGateDescriptor, multiPatternCountDescriptor))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "scala_udf")
  }
}
