package graft

import org.apache.thrift.TBase
import org.apache.thrift.protocol._

/** Thrift stand-in with NON-CONTIGUOUS field ids (1 and 5 — the shape
  * left behind after IDL field removal). The reference's constructor
  * loop stops at the first missing id and silently drops every later
  * field; [[graft.sources.ThriftConvert]] must still see field 5. */
class ThriftGapped extends TBase[ThriftGapped, ThriftGapped.Field] {
  var a: Long = 0L
  var b: String = _

  override def read(iprot: TProtocol): Unit = {
    iprot.readStructBegin()
    var done = false
    while (!done) {
      val f = iprot.readFieldBegin()
      if (f.`type` == TType.STOP) done = true
      else {
        f.id match {
          case 1 => a = iprot.readI64()
          case 5 => b = iprot.readString()
          case _ => TProtocolUtil.skip(iprot, f.`type`)
        }
        iprot.readFieldEnd()
      }
    }
    iprot.readStructEnd()
  }

  override def write(oprot: TProtocol): Unit = {
    oprot.writeStructBegin(new TStruct("ThriftGapped"))
    oprot.writeFieldBegin(new TField("a", TType.I64, 1)); oprot.writeI64(a); oprot.writeFieldEnd()
    if (b != null) {
      oprot.writeFieldBegin(new TField("b", TType.STRING, 5))
      oprot.writeString(b); oprot.writeFieldEnd()
    }
    oprot.writeFieldStop()
    oprot.writeStructEnd()
  }

  override def fieldForId(fieldId: Int): ThriftGapped.Field =
    ThriftGapped.fields.getOrElse(fieldId, null)
  override def isSet(field: ThriftGapped.Field): Boolean = getFieldValue(field) != null
  override def getFieldValue(field: ThriftGapped.Field): AnyRef =
    field.getThriftFieldId.toInt match {
      case 1 => Long.box(a)
      case 5 => b
    }
  override def setFieldValue(field: ThriftGapped.Field, value: AnyRef): Unit =
    field.getThriftFieldId.toInt match {
      case 1 => a = value.asInstanceOf[Long]
      case 5 => b = value.asInstanceOf[String]
    }
  override def deepCopy(): ThriftGapped = {
    val c = new ThriftGapped; c.a = a; c.b = b; c
  }
  override def clear(): Unit = { a = 0L; b = null }
  override def compareTo(o: ThriftGapped): Int = java.lang.Long.compare(a, o.a)
}

object ThriftGapped {
  final class Field(idShort: Short, name: String) extends org.apache.thrift.TFieldIdEnum {
    override def getThriftFieldId: Short = idShort
    override def getFieldName: String = name
  }
  val fields: Map[Int, Field] = Map(1 -> new Field(1, "a"), 5 -> new Field(5, "b"))
}
