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

    // fieldName → TFieldIdEnum. Prefer the generated class's static
    // metaDataMap (exact field set, robust to id gaps); fall back to
    // scanning the FULL positive id range — the reference's
    // constructor loop stops at the first missing id
    // (ThriftRecordReader.java do/while), which silently drops every
    // field after a gap (common after IDL field removal). A one-time
    // 32K-probe scan per stream is noise next to deserialization.
    val probe = cls.getDeclaredConstructor().newInstance()
    val byName: Map[String, TFieldIdEnum] = {
      val fromMeta: Option[Map[String, TFieldIdEnum]] =
        try {
          val m = cls.getField("metaDataMap").get(null)
            .asInstanceOf[java.util.Map[_ <: TFieldIdEnum, _]]
          Some(m.keySet.asScala.map(f => f.getFieldName -> (f: TFieldIdEnum)).toMap)
        } catch { case _: ReflectiveOperationException | _: ClassCastException => None }
      fromMeta.getOrElse {
        (1 to Short.MaxValue).iterator
          .map(i => fieldForId.invoke(probe, Int.box(i)).asInstanceOf[TFieldIdEnum])
          .filter(_ != null)
          .map(f => f.getFieldName -> f)
          .toMap
      }
    }

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
