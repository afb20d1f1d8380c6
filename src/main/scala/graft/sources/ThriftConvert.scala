package graft.sources

import java.io.BufferedInputStream

import scala.jdk.CollectionConverters._

import org.apache.thrift.{TBase, TFieldIdEnum}
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.transport.TIOStreamTransport
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** TBase → Row conversion for [[Ingest.readThrift]] — the reference's
  * `ThriftRecordReader.java` mechanics: instantiate the generated
  * class, `read(TBinaryProtocol)` per record, enumerate
  * `fieldForId(1..)` once to map field names to ids, pull values with
  * `getFieldValue`, hasNext via mark/read/reset on the buffered
  * stream.
  *
  * The generic calls go through two cached reflection handles
  * (`fieldForId`/`getFieldValue` erase to TFieldIdEnum signatures) —
  * thrift's self-referential generics (`TBase[T <: TBase[T,F], ...]`)
  * cannot be spelled for a runtime-loaded class; reflection on a
  * JIT-cached Method is noise next to the deserialization itself. */
object ThriftConvert extends Serializable {

  private val fieldForId =
    classOf[TBase[_, _]].getMethod("fieldForId", java.lang.Integer.TYPE)
  private val getFieldValue =
    classOf[TBase[_, _]].getMethod("getFieldValue", classOf[TFieldIdEnum])

  /** Decode one file's record stream lazily. */
  def readStream(in: java.io.InputStream, thriftClassName: String,
      fields: Array[StructField]): Iterator[Row] = {
    val cls = Class.forName(thriftClassName, true,
      Thread.currentThread().getContextClassLoader)
      .asInstanceOf[Class[_ <: TBase[_, _]]]
    val bin = new BufferedInputStream(in)
    val proto = new TBinaryProtocol(new TIOStreamTransport(bin))

    // fieldName → TFieldIdEnum, via the generated class's own id space
    // (ThriftRecordReader.java's constructor loop, ids start at 1)
    val probe = cls.getDeclaredConstructor().newInstance()
    val byName: Map[String, TFieldIdEnum] =
      Iterator.from(1)
        .map(i => fieldForId.invoke(probe, Int.box(i)).asInstanceOf[TFieldIdEnum])
        .takeWhile(_ != null)
        .map(f => f.getFieldName -> f)
        .toMap

    new Iterator[Row] {
      override def hasNext: Boolean = {
        bin.mark(1)
        val v = bin.read()
        bin.reset()
        v != -1
      }
      override def next(): Row = {
        val t = cls.getDeclaredConstructor().newInstance()
        t.read(proto)
        Row.fromSeq(fields.toSeq.map { f =>
          byName.get(f.name) match {
            case None => null // declared-but-absent: transformer defaults fill
            case Some(id) => convert(getFieldValue.invoke(t, id), f.dataType, f.name)
          }
        })
      }
    }
  }

  private def convert(v: Any, dt: DataType, name: String): Any = (v, dt) match {
    case (null, _) => null
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
    case (other, StringType) => String.valueOf(other)
    case (other, t) => throw new IllegalArgumentException(
      s"thrift field '$name': cannot convert ${other.getClass.getName} to $t")
  }
}
