package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericFixed, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro <-> Catalyst schema and value conversion for the `graft-avro`
  * DataSource V2 ([[AvroSource]]).
  *
  * Scope: the Avro container-file types a warehouse ingest actually
  * meets — primitives, `[null, T]` unions (nullability), records,
  * arrays, string-keyed maps, enums (as strings), fixed (as binary),
  * and the standard logical types `date`, `timestamp-millis`,
  * `timestamp-micros`, and `decimal` (on bytes or fixed). Anything
  * else (multi-branch unions, time-of-day types) is rejected loudly at
  * schema-conversion time rather than silently mis-read.
  *
  * Converters are built ONCE per (avro schema, catalyst type) pair and
  * then applied per value — the per-row path is closure dispatch, not
  * schema inspection.
  */
object AvroConv {

  // ---------------------------------------------------------------
  // Avro schema -> Spark type (read-side inference)
  // ---------------------------------------------------------------

  /** (sparkType, nullable) for an Avro schema node. */
  def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      if (nonNull.size != 1)
        throw new IllegalArgumentException(
          s"graft-avro: unsupported union ${s} — only [null, T] unions map to a Spark type")
      val (dt, _) = toSparkType(nonNull.head)
      (dt, branches.size != nonNull.size)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros => (TimestampType, false)
        case _: LogicalTypes.TimestampMillis => (TimestampType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.map { f =>
        val (dt, nullable) = toSparkType(f.schema())
        StructField(f.name(), dt, nullable)
      }
      (StructType(fields.toSeq), false)
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toSparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case other =>
      throw new IllegalArgumentException(s"graft-avro: unsupported Avro type $other")
  }

  def toStructType(record: Schema): StructType = {
    require(record.getType == Schema.Type.RECORD,
      s"graft-avro: top level must be a record, got ${record.getType}")
    toSparkType(record)._1.asInstanceOf[StructType]
  }

  // ---------------------------------------------------------------
  // Spark type -> Avro schema (write side)
  // ---------------------------------------------------------------

  /** Avro schema for a Spark field type (non-null branch only). */
  private def toAvroNonNull(dt: DataType, path: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      Schema.createArray(toAvro(et, containsNull, path + ".item"))
    case MapType(StringType, vt, vn) =>
      Schema.createMap(toAvro(vt, vn, path + ".value"))
    case st: StructType => toAvroRecord(st, sanitizeName(path))
    case other =>
      throw new IllegalArgumentException(
        s"graft-avro: cannot write Spark type ${other.sql} at $path")
  }

  private def toAvro(dt: DataType, nullable: Boolean, path: String): Schema = {
    val base = toAvroNonNull(dt, path)
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  private def sanitizeName(s: String): String = {
    val cleaned = s.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    if (cleaned.isEmpty || cleaned.head.isDigit) "r_" + cleaned else cleaned
  }

  def toAvroRecord(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, toAvro(f.dataType, f.nullable, name + "_" + f.name),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(sanitizeName(name), null, "graft.avro", false,
      fields.toList.asJava)
  }

  // ---------------------------------------------------------------
  // Avro value -> Catalyst value (read side)
  // ---------------------------------------------------------------

  private def nonNullBranch(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(
        throw new IllegalArgumentException("graft-avro: all-null union"))
    case _ => s
  }

  /** Converter from a decoded Avro runtime value to the Catalyst value
    * for `dt`. Union resolution happens here once; the returned closure
    * only null-checks per value.
    */
  def reader(avro: Schema, dt: DataType): Any => Any = {
    val s = nonNullBranch(avro)
    val conv: Any => Any = (dt, s.getType) match {
      case (StringType, _) =>
        v => UTF8String.fromString(v.toString)
      // Avro schema-resolution promotions (int->long, int/long->float/
      // double, float->double) when a later file was written narrower
      // than the inferred table type
      case (LongType, Schema.Type.INT) => v => v.asInstanceOf[Int].toLong
      case (DoubleType, Schema.Type.FLOAT) =>
        v => v.asInstanceOf[Float].toDouble
      case (DoubleType, Schema.Type.INT) =>
        v => v.asInstanceOf[Int].toDouble
      case (DoubleType, Schema.Type.LONG) =>
        v => v.asInstanceOf[Long].toDouble
      case (FloatType, Schema.Type.INT) =>
        v => v.asInstanceOf[Int].toFloat
      case (BooleanType, _) | (IntegerType, _) | (LongType, _) |
           (FloatType, _) | (DoubleType, _) => identity
      case (DateType, _) => identity // int days since epoch, both sides
      case (TimestampType, Schema.Type.LONG) =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis =>
            v => v.asInstanceOf[Long] * 1000L
          case _ => identity // micros
        }
      case (d: DecimalType, Schema.Type.BYTES) =>
        v => {
          val bb = v.asInstanceOf[ByteBuffer].duplicate()
          val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
          Decimal(BigDecimal(new java.math.BigDecimal(
            new java.math.BigInteger(bytes), d.scale)), d.precision, d.scale)
        }
      case (d: DecimalType, Schema.Type.FIXED) =>
        v => Decimal(BigDecimal(new java.math.BigDecimal(
          new java.math.BigInteger(v.asInstanceOf[GenericFixed].bytes()),
          d.scale)), d.precision, d.scale)
      case (BinaryType, Schema.Type.BYTES) =>
        v => {
          val bb = v.asInstanceOf[ByteBuffer].duplicate()
          val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
          bytes
        }
      case (BinaryType, Schema.Type.FIXED) =>
        v => v.asInstanceOf[GenericFixed].bytes().clone()
      case (st: StructType, Schema.Type.RECORD) =>
        val fieldConvs = st.fields.map { f =>
          val af = s.getField(f.name)
          require(af != null, s"graft-avro: field ${f.name} missing in writer record")
          (af.pos(), reader(af.schema(), f.dataType))
        }
        v => {
          val rec = v.asInstanceOf[GenericRecord]
          val out = new Array[Any](fieldConvs.length)
          var i = 0
          while (i < fieldConvs.length) {
            val (pos, c) = fieldConvs(i)
            val fv = rec.get(pos)
            out(i) = if (fv == null) null else c(fv)
            i += 1
          }
          new GenericInternalRow(out)
        }
      case (ArrayType(et, _), Schema.Type.ARRAY) =>
        val ec = reader(s.getElementType, et)
        v => {
          val in = v.asInstanceOf[java.util.Collection[Any]]
          val out = new Array[Any](in.size())
          val it = in.iterator(); var i = 0
          while (it.hasNext) {
            val e = it.next()
            out(i) = if (e == null) null else ec(e); i += 1
          }
          new GenericArrayData(out)
        }
      case (MapType(StringType, vt, _), Schema.Type.MAP) =>
        val vc = reader(s.getValueType, vt)
        v => {
          val in = v.asInstanceOf[java.util.Map[Any, Any]]
          val n = in.size()
          val keys = new Array[Any](n); val vals = new Array[Any](n)
          val it = in.entrySet().iterator(); var i = 0
          while (it.hasNext) {
            val e = it.next()
            keys(i) = UTF8String.fromString(e.getKey.toString)
            vals(i) = if (e.getValue == null) null else vc(e.getValue)
            i += 1
          }
          ArrayBasedMapData(keys, vals)
        }
      case (dtx, at) =>
        throw new IllegalArgumentException(
          s"graft-avro: cannot read Avro $at as Spark ${dtx.sql}")
    }
    conv
  }

  // ---------------------------------------------------------------
  // Catalyst value -> Avro value (write side)
  // ---------------------------------------------------------------

  /** Converter from the Catalyst value of `dt` to the Avro runtime
    * value for the matching [[toAvroNonNull]] schema.
    */
  def writer(dt: DataType, avro: Schema): Any => Any = {
    val s = nonNullBranch(avro)
    dt match {
      case StringType => v => v.asInstanceOf[UTF8String].toString
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           DateType => identity
      case ByteType => v => v.asInstanceOf[Byte].toInt
      case ShortType => v => v.asInstanceOf[Short].toInt
      case TimestampType => identity // micros long
      case d: DecimalType =>
        v => ByteBuffer.wrap(
          v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
      case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case st: StructType =>
        val fieldConvs = st.fields.zipWithIndex.map { case (f, i) =>
          (i, f.dataType, writer(f.dataType, s.getFields.get(i).schema()))
        }
        v => {
          val row = v.asInstanceOf[InternalRow]
          val rec = new GenericData.Record(s)
          fieldConvs.foreach { case (i, fdt, c) =>
            rec.put(i, if (row.isNullAt(i)) null else c(row.get(i, fdt)))
          }
          rec
        }
      case ArrayType(et, _) =>
        val ec = writer(et, s.getElementType)
        v => {
          val arr = v.asInstanceOf[ArrayData]
          val out = new java.util.ArrayList[Any](arr.numElements())
          var i = 0
          while (i < arr.numElements()) {
            out.add(if (arr.isNullAt(i)) null else ec(arr.get(i, et)))
            i += 1
          }
          out
        }
      case MapType(StringType, vt, _) =>
        val vc = writer(vt, s.getValueType)
        v => {
          val m = v.asInstanceOf[MapData]
          val out = new java.util.LinkedHashMap[String, Any](m.numElements())
          val ks = m.keyArray(); val vs = m.valueArray()
          var i = 0
          while (i < m.numElements()) {
            out.put(ks.getUTF8String(i).toString,
              if (vs.isNullAt(i)) null else vc(vs.get(i, vt)))
            i += 1
          }
          out
        }
      case other =>
        throw new IllegalArgumentException(
          s"graft-avro: cannot write Spark type ${other.sql}")
    }
  }
}
