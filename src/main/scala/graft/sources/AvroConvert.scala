package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.generic.GenericRecord
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** GenericRecord → Row conversion against a declared Spark schema —
  * the value-mapping half of the reference's Avro ingest
  * (`AvroRecordReader.java` + `AvroUtils`: fields matched by name,
  * union-of-[type, null] unwrapped by the Avro runtime, Utf8/enum/
  * fixed stringified, arrays to element-converted lists, missing
  * fields null for the transformer chain's defaults).
  *
  * Also the writer half for round-trips ([[schemaFor]]/[[toRecord]]):
  * driver-side fixture/export tooling for bounded row sets — the
  * segment sink stays parquet ([[Ingest.writeSegment]]).
  */
object AvroConvert extends Serializable {

  def toRow(rec: GenericRecord, fields: Array[StructField]): Row = {
    val values = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      values(i) =
        if (rec.getSchema.getField(f.name) == null) null // absent: warn-and-null in the reference
        else convert(rec.get(f.name), f.dataType, f.name)
      i += 1
    }
    Row.fromSeq(values.toSeq)
  }

  private def convert(v: Any, dt: DataType, name: String): Any = (v, dt) match {
    case (null, _) => null
    case (s: Utf8, StringType) => s.toString
    case (s: CharSequence, StringType) => s.toString
    case (n: Number, IntegerType) => n.intValue()
    case (n: Number, LongType) => n.longValue()
    case (n: Number, FloatType) => n.floatValue()
    case (n: Number, DoubleType) => n.doubleValue()
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case (a: java.util.Collection[_], ArrayType(el, _)) =>
      a.asScala.toSeq.map(convert(_, el, name))
    // enum / fixed / anything else that declares STRING: stringify,
    // matching the reference's permissive type coercion warning path
    case (other, StringType) => String.valueOf(other)
    case (other, t) => throw new IllegalArgumentException(
      s"avro field '$name': cannot convert ${other.getClass.getName} to $t")
  }

  // ---- writer half (bounded, driver-side) -------------------------------

  /** Spark schema → Avro record schema (nullable unions, arrays). */
  def schemaFor(schema: StructType, recordName: String = "GraftRecord"): org.apache.avro.Schema = {
    val fields = schema.fields.map { f =>
      val base = avroType(f.dataType)
      val t = org.apache.avro.Schema.createUnion(
        java.util.List.of(org.apache.avro.Schema.create(org.apache.avro.Schema.Type.NULL), base))
      new org.apache.avro.Schema.Field(f.name, t, null, null)
    }
    org.apache.avro.Schema.createRecord(recordName, null, "graft", false, fields.toSeq.asJava)
  }

  private def avroType(dt: DataType): org.apache.avro.Schema = {
    import org.apache.avro.Schema.{Type, create, createArray}
    dt match {
      case IntegerType => create(Type.INT)
      case LongType => create(Type.LONG)
      case FloatType => create(Type.FLOAT)
      case DoubleType => create(Type.DOUBLE)
      case StringType => create(Type.STRING)
      case BooleanType => create(Type.BOOLEAN)
      case BinaryType => create(Type.BYTES)
      case ArrayType(el, _) => createArray(avroType(el))
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  def toRecord(row: Row, schema: StructType, avro: org.apache.avro.Schema): GenericRecord = {
    val rec = new org.apache.avro.generic.GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v = row.get(i) match {
        case null => null
        case s: Seq[_] => s.asJava
        case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
        case other => other
      }
      rec.put(f.name, v)
    }
    rec
  }

  /** Row → schemaless Avro binary payload (the Kafka message body the
    * reference's KafkaAvroMessageDecoder consumes). */
  def toBytes(row: Row, schema: StructType, avro: org.apache.avro.Schema): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new org.apache.avro.generic.GenericDatumWriter[GenericRecord](avro)
      .write(toRecord(row, schema, avro), enc)
    enc.flush()
    out.toByteArray
  }

  /** Write `rows` to one Avro container file — fixture/export tooling;
    * caller guarantees the row set is driver-bounded. */
  def writeFile(rows: Seq[Row], schema: StructType, path: java.io.File): Unit = {
    val avro = schemaFor(schema)
    val writer = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](avro))
    writer.create(avro, path)
    try rows.foreach(r => writer.append(toRecord(r, schema, avro)))
    finally writer.close()
  }
}
