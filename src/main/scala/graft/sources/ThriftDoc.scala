package graft.sources

import org.apache.thrift.TBase
import org.apache.thrift.protocol._

/** Hand-written stand-in for thrift-compiler output (the offline build
  * has no codegen): the doc-record struct a user would feed to
  * `Ingest.readThrift`, with SV + MV fields. Field ids start at 1,
  * matching the generated-code convention the reference's
  * ThriftRecordReader enumerates. Used by the ingest test battery and
  * the `q_thrift_ingest` oracle round-trip; a real deployment points
  * `readThrift` at its own generated class instead. */
class ThriftDoc extends TBase[ThriftDoc, ThriftDoc.Field] {
  var id: Long = 0L
  var name: String = _
  var score: Double = 0.0
  var tags: java.util.List[String] = new java.util.ArrayList[String]()

  override def read(iprot: TProtocol): Unit = {
    iprot.readStructBegin()
    var done = false
    while (!done) {
      val f = iprot.readFieldBegin()
      if (f.`type` == TType.STOP) done = true
      else {
        f.id match {
          case 1 => id = iprot.readI64()
          case 2 => name = iprot.readString()
          case 3 => score = iprot.readDouble()
          case 4 =>
            val l = iprot.readListBegin()
            tags = new java.util.ArrayList[String](l.size)
            (0 until l.size).foreach(_ => tags.add(iprot.readString()))
            iprot.readListEnd()
          case _ => TProtocolUtil.skip(iprot, f.`type`)
        }
        iprot.readFieldEnd()
      }
    }
    iprot.readStructEnd()
  }

  override def write(oprot: TProtocol): Unit = {
    oprot.writeStructBegin(new TStruct("ThriftDoc"))
    oprot.writeFieldBegin(new TField("id", TType.I64, 1)); oprot.writeI64(id); oprot.writeFieldEnd()
    if (name != null) {
      oprot.writeFieldBegin(new TField("name", TType.STRING, 2))
      oprot.writeString(name); oprot.writeFieldEnd()
    }
    oprot.writeFieldBegin(new TField("score", TType.DOUBLE, 3)); oprot.writeDouble(score); oprot.writeFieldEnd()
    oprot.writeFieldBegin(new TField("tags", TType.LIST, 4))
    oprot.writeListBegin(new TList(TType.STRING, tags.size))
    tags.forEach(t => oprot.writeString(t))
    oprot.writeListEnd(); oprot.writeFieldEnd()
    oprot.writeFieldStop()
    oprot.writeStructEnd()
  }

  override def fieldForId(fieldId: Int): ThriftDoc.Field = ThriftDoc.fields.getOrElse(fieldId, null)
  override def isSet(field: ThriftDoc.Field): Boolean = getFieldValue(field) != null
  override def getFieldValue(field: ThriftDoc.Field): AnyRef = field.getThriftFieldId.toInt match {
    case 1 => Long.box(id)
    case 2 => name
    case 3 => Double.box(score)
    case 4 => tags
  }
  override def setFieldValue(field: ThriftDoc.Field, value: AnyRef): Unit =
    field.getThriftFieldId.toInt match {
      case 1 => id = value.asInstanceOf[Long]
      case 2 => name = value.asInstanceOf[String]
      case 3 => score = value.asInstanceOf[Double]
      case 4 => tags = value.asInstanceOf[java.util.List[String]]
    }
  override def deepCopy(): ThriftDoc = {
    val c = new ThriftDoc
    c.id = id; c.name = name; c.score = score
    c.tags = new java.util.ArrayList[String](tags)
    c
  }
  override def clear(): Unit = {
    id = 0L; name = null; score = 0.0; tags = new java.util.ArrayList[String]()
  }
  override def compareTo(o: ThriftDoc): Int = java.lang.Long.compare(id, o.id)
}

object ThriftDoc {
  final class Field(idShort: Short, name: String) extends org.apache.thrift.TFieldIdEnum {
    override def getThriftFieldId: Short = idShort
    override def getFieldName: String = name
  }
  val fields: Map[Int, Field] = Map(
    1 -> new Field(1, "id"), 2 -> new Field(2, "name"),
    3 -> new Field(3, "score"), 4 -> new Field(4, "tags"))
}
