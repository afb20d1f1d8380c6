package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary-compatible reader/merger for the reference's serialized
  * HyperLogLog string columns, so segments produced by an actual
  * reference cluster can be queried and sketch-merged WITHOUT raw-data
  * re-scans.
  *
  * The reference stores a derived HLL column as a STRING: clearspring
  * stream-lib 2.7.0 `HyperLogLog.getBytes()` with every byte mapped to
  * `(char)(b + 129)` (`pinot-core/.../startree/hll/HllUtil.java`
  * `SerializationConverter`, offset 129; default log2m = 8 from
  * `pinot-common/.../startree/hll/HllConstants.java:22`), consumed by
  * `FastHLLAggregationFunction.java` (deserialize → `addAll` merge →
  * `cardinality()`).
  *
  * Byte layout (stream-lib `HyperLogLog.writeBytes` /
  * `RegisterSet`, both from the published 2.7.0 sources): big-endian
  * `int log2m`, `int registerBytes`, then `registerBytes/4` ints — a
  * register set of `m = 2^log2m` 5-bit registers packed 6 per 32-bit
  * word (bits `5*(pos mod 6)` of word `pos / 6`; `m/6` rounded up to
  * 43 words for log2m = 8).
  *
  * What is bit-level faithful here: DESERIALIZATION of that layout,
  * register-max MERGE (`RegisterSet.merge`), the ESTIMATOR
  * (`alphaMM · m² / Σ 2^-M[j]` with linear-counting small-range branch
  * `m·ln(m/V)` below 2.5m, `Math.round`, stream-lib's alpha constants),
  * and re-SERIALIZATION — everything FASTHLL does with a stored
  * sketch. The `offer` path (used only to BUILD fixtures here) hashes
  * with stream-lib's MurmurHash2 (`h0 = seed=-1 ^ len`); building new
  * sketches intended to union against cluster-produced sketches of the
  * same raw values should re-derive from the raw column instead, since
  * add-path hash parity cannot be verified offline.
  *
  * Why there is no "re-encode to DataSketches": an HLL register only
  * witnesses leading-zero counts of ITS hash function; two sketch
  * families with different hashes cannot be converted register-to-
  * register without the raw values. Native consumption (this file) is
  * lossless; when the raw column is also present, a DataSketches
  * column can simply be re-derived from it at ingest (the existing
  * fastHLL build path).
  */
object ClearspringHll {

  val DefaultLog2m = 8 // HllConstants.DEFAULT_LOG2M

  /** Decoded sketch: per-register 5-bit values, one byte each. */
  final case class Hll(log2m: Int, registers: Array[Byte]) {
    def m: Int = 1 << log2m

    /** In-place register-max merge (RegisterSet.merge semantics). */
    def mergeWith(other: Hll): Hll = {
      require(other.log2m == log2m,
        s"cannot merge HLL log2m=${other.log2m} into log2m=$log2m")
      var i = 0
      while (i < registers.length) {
        if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
        i += 1
      }
      this
    }

    /** stream-lib `HyperLogLog.cardinality()`: harmonic-mean estimate
      * with the linear-counting small-range branch. */
    def cardinality: Long = {
      var registerSum = 0.0
      var zeros = 0.0
      var j = 0
      while (j < registers.length) {
        registerSum += 1.0 / (1L << registers(j))
        if (registers(j) == 0) zeros += 1
        j += 1
      }
      val count = m
      val estimate = alphaMM(log2m) * (1.0 / registerSum)
      // bit-faithful to stream-lib 2.7.0: the small-range branch has NO
      // zeros-guard there, so all-registers-nonzero with estimate still
      // ≤2.5m computes log(m/0) = ∞ → Long.MaxValue, and parity with a
      // reference cluster's FASTHLL answer matters more than prettiness
      if (estimate <= 2.5 * count)
        math.round(count * math.log(count / zeros))
      else math.round(estimate)
    }

    /** Fixture-building add path (murmur2 over the value's bytes, the
      * stream-lib `offer` structure — see object scaladoc caveat). */
    def offer(value: String): Unit = offerHashed(murmur2(
      value.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

    def offerHashed(hashedValue: Int): Unit = {
      // HyperLogLog.offerHashed: bucket = top log2m bits; rank = nlz of
      // the remaining bits (guard mask keeps rank bounded) + 1
      val j = hashedValue >>> (32 - log2m)
      val r = Integer.numberOfLeadingZeros(
        (hashedValue << log2m) | ((1 << (log2m - 1)) + 1)) + 1
      if (r > registers(j)) registers(j) = r.toByte
    }
  }

  def empty(log2m: Int = DefaultLog2m): Hll = Hll(log2m, new Array[Byte](1 << log2m))

  /** stream-lib alpha·m² (HyperLogLog.getAlphaMM). */
  private def alphaMM(log2m: Int): Double = {
    val m = 1 << log2m
    val alpha = log2m match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    alpha * m * m
  }

  private def wordsForCount(m: Int): Int = {
    val bits = m / 6 // RegisterSet.LOG2_BITS_PER_WORD = 6 registers/word
    if (bits == 0) 1 else if (bits % 32 == 0) bits else bits + 1
  }

  /** Serialized bytes (HyperLogLog.writeBytes layout). */
  def toBytes(h: Hll): Array[Byte] = {
    val words = new Array[Int](wordsForCount(h.m))
    var pos = 0
    while (pos < h.m) {
      val bucket = pos / 6
      val shift = 5 * (pos % 6)
      words(bucket) |= (h.registers(pos) & 0x1f) << shift
      pos += 1
    }
    val bb = ByteBuffer.allocate(8 + words.length * 4) // big-endian default
    bb.putInt(h.log2m)
    bb.putInt(words.length * 4)
    words.foreach(bb.putInt)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Hll = {
    val bb = ByteBuffer.wrap(bytes)
    val log2m = bb.getInt
    require(log2m > 0 && log2m <= 30, s"implausible HLL log2m=$log2m")
    val byteSize = bb.getInt
    require(byteSize == bytes.length - 8,
      s"HLL register payload $byteSize != ${bytes.length - 8}")
    val words = new Array[Int](byteSize / 4)
    var w = 0
    while (w < words.length) { words(w) = bb.getInt; w += 1 }
    val m = 1 << log2m
    val regs = new Array[Byte](m)
    var pos = 0
    while (pos < m) {
      val bucket = pos / 6
      val shift = 5 * (pos % 6)
      regs(pos) = ((words(bucket) >>> shift) & 0x1f).toByte
      pos += 1
    }
    Hll(log2m, regs)
  }

  /** HllUtil.SerializationConverter: one byte ↔ one char, offset 129. */
  def toChars(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = (bytes(i) + 129).toChar; i += 1 }
    new String(out)
  }

  def fromChars(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { out(i) = (s.charAt(i) - 129).toByte; i += 1 }
    out
  }

  /** The reference's on-disk string form (HllUtil.convertHllToString). */
  def serializeString(h: Hll): String = toChars(toBytes(h))
  def deserializeString(s: String): Hll = fromBytes(fromChars(s))

  /** MurmurHash2 (stream-lib's MurmurHash over byte[]). */
  def murmur2(data: Array[Byte], seed: Int = -1): Int = {
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val len4 = data.length >> 2
    var i = 0
    while (i < len4) {
      val i4 = i << 2
      var k = (data(i4 + 3) & 0xff) << 24 | (data(i4 + 2) & 0xff) << 16 |
        (data(i4 + 1) & 0xff) << 8 | (data(i4) & 0xff)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    val left = data.length - (len4 << 2)
    if (left != 0) {
      if (left >= 3) h ^= (data(data.length - 3) & 0xff) << 16
      if (left >= 2) h ^= (data(data.length - 2) & 0xff) << 8
      if (left >= 1) h ^= data(data.length - 1) & 0xff
      h *= m
    }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }
}

object cshll {
  import ClearspringHll._

  /** clearspring_hll_union_agg(stringSketchCol) → merged sketch in the
    * same reference string format — FASTHLL's server-side merge
    * (FastHLLAggregationFunction.aggregate: deserialize → addAll) as a
    * TypedImperativeAggregate; partials ship ~180 B register sets. */
  case class ClearspringHllUnionAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Hll] with ImplicitCastInputTypes {

    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = StringType

    override def createAggregationBuffer(): Hll = empty()

    override def update(buffer: Hll, input: InternalRow): Hll = {
      val v = child.eval(input)
      if (v == null) buffer
      else {
        val in = deserializeString(v.asInstanceOf[UTF8String].toString)
        adoptOrMerge(buffer, in)
      }
    }

    override def merge(buffer: Hll, other: Hll): Hll = adoptOrMerge(buffer, other)

    /** A pristine (never-updated, all-zero) buffer ADOPTS the incoming
      * sketch's log2m instead of requiring the default: fromBytes
      * accepts any log2m a reference cluster was configured with, and
      * the union must too. Mixed log2m between two non-empty sketches
      * still fails loudly (registers witness different bucket splits —
      * no lossless merge exists). */
    private def adoptOrMerge(buffer: Hll, in: Hll): Hll =
      if (in.log2m == buffer.log2m) buffer.mergeWith(in)
      else if (buffer.registers.forall(_ == 0)) in
      else if (in.registers.forall(_ == 0)) buffer
      else buffer.mergeWith(in) // throws the mixed-log2m error

    override def eval(buffer: Hll): Any =
      UTF8String.fromString(serializeString(buffer))

    override def serialize(buffer: Hll): Array[Byte] = toBytes(buffer)
    override def deserialize(bytes: Array[Byte]): Hll = fromBytes(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): ClearspringHllUnionAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): ClearspringHllUnionAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): ClearspringHllUnionAgg =
      copy(child = newChildren(0))
    override def prettyName: String = "clearspring_hll_union_agg"
  }

  /** clearspring_hll_cardinality(stringSketch) → bigint estimate
    * (HyperLogLog.cardinality()), a scalar over stored/merged
    * sketches. */
  case class ClearspringHllCardinality(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      deserializeString(input.asInstanceOf[UTF8String].toString).cardinality
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        "graft.functions.ClearspringHll.deserializeString(" +
          s"$c.toString()).cardinality()")
    override protected def withNewChildInternal(newChild: Expression): ClearspringHllCardinality =
      copy(child = newChild)
    override def prettyName: String = "clearspring_hll_cardinality"
  }
}

/** Column facade for the clearspring-compatible HLL family. */
object ClearspringHllCol {
  def unionAgg(sketch: Column): Column =
    GraftSqlBridge.column(cshll.ClearspringHllUnionAgg(
      GraftSqlBridge.expression(sketch)).toAggregateExpression())

  def cardinality(sketch: Column): Column =
    GraftSqlBridge.column(cshll.ClearspringHllCardinality(
      GraftSqlBridge.expression(sketch)))
}
