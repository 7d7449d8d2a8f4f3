package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg `bucket[N]` partition transform as a codegen'd scalar
  * expression: `(murmur3_x86_32(encoded value) & Int.MaxValue) % N`,
  * with the PUBLIC spec's single-value encodings (Appendix B):
  * int/long/date hash their 8-byte little-endian LONG form (so
  * bucket(34: int) == bucket(34L) — the spec's cross-type guarantee),
  * strings hash their UTF-8 bytes. Seed 0, standard murmur3_x86_32 —
  * [[IcebergBucketHash]] pins the spec's published test vectors
  * (hash(34L) = 2017239379, hash("iceberg") = 1210000089).
  *
  * Used by the Iceberg composer to lay out `bucket[N]`-partitioned
  * tables (one value per row, inside whole-stage codegen) and by the
  * read-side planner (driver, per probe value) to prune manifests and
  * files — both sides MUST agree bit-for-bit with foreign writers,
  * which is what the vector-pinned hash provides.
  */
case class IcebergBucket(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"bucket count must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | DateType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports BIGINT/INT/DATE/STRING, got ${other.sql}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  def evalLong(v: Long): Int = IcebergBucketHash.bucketLong(v, n)
  def evalInt(v: Int): Int = IcebergBucketHash.bucketLong(v.toLong, n)
  def evalUtf8(v: UTF8String): Int =
    IcebergBucketHash.bucketBytes(v.getBytes, n)

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType                => evalLong(v.asInstanceOf[Long])
    case IntegerType | DateType  => evalInt(v.asInstanceOf[Int])
    case StringType              => evalUtf8(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucket", this,
      classOf[IcebergBucket].getName)
    val call = child.dataType match {
      case LongType               => "evalLong"
      case IntegerType | DateType => "evalInt"
      case StringType             => "evalUtf8"
    }
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.$call($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): IcebergBucket = copy(child = newChild)
}

object IcebergBucket {
  /** Column-level API: the Iceberg bucket[N] of a column. */
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(new IcebergBucket(ColumnBridge.expression(c), n))
}

/** Standard murmur3_x86_32 (Austin Appleby's public-domain MurmurHash3,
  * the 32-bit x86 variant; seed 0 as the Iceberg spec fixes it) plus
  * the spec's bucket reduction. Kept as static-shaped helpers so both
  * the codegen'd expression and the driver-side pruning planner share
  * one implementation.
  */
object IcebergBucketHash {

  def murmur3(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val rounded = data.length & 0xfffffffc
    var i = 0
    while (i < rounded) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    val tail = data.length & 3
    if (tail == 3) k1 ^= (data(rounded + 2) & 0xff) << 16
    if (tail >= 2) k1 ^= (data(rounded + 1) & 0xff) << 8
    if (tail >= 1) {
      k1 ^= data(rounded) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** 8-byte little-endian form — the spec's long encoding (ints and
    * dates widen to long FIRST, giving the cross-type hash guarantee).
    */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  def bucketLong(v: Long, n: Int): Int =
    ((hashLong(v) & Int.MaxValue) % n)

  def bucketBytes(utf8: Array[Byte], n: Int): Int =
    ((murmur3(utf8) & Int.MaxValue) % n)
}
