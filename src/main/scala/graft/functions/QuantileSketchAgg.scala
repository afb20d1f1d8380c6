package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch column — the percentile analog of the
  * fastHLL sketch column: build a compact sketch per fine slice at
  * ingest, answer coarse percentile queries by UNIONING stored
  * sketches without re-reading rows.
  *
  * Reference anchors: `percentileEst` aggregates over a mergeable
  * digest (`pinot-core/.../query/aggregation/function/
  * PercentileEstAggregationFunction.java`, `customobject/
  * QuantileDigest.java:183-186` — serialized digests merged
  * server→broker), and the star-tree/ingest `ValueAggregator` family
  * includes percentile-est sketch metrics
  * (`data/aggregator/ValueAggregatorFactory.java`).
  *
  * Sketch engine: Spark's own Greenwald-Khanna `QuantileSummaries` —
  * the exact machinery behind `approx_percentile`'s partial/final
  * split, so merge semantics and accuracy (rank error ≤ eps·n,
  * preserved across merges) are the engine's own distributed
  * contract. Deterministic: GK compaction has no randomness, so
  * sketches and estimates reproduce under task retries.
  *
  * Serialized layout (little BinaryType column, ~KBs per slice at
  * eps 0.01): relativeError, compressThreshold, count, nStats,
  * then (value, g, delta) per retained sample.
  */
object QuantileSketchOps {

  def serialize(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val st = qs.sampled
    val bb = ByteBuffer.allocate(8 + 4 + 8 + 4 + st.length * 24)
    bb.putDouble(qs.relativeError)
    bb.putInt(qs.compressThreshold)
    bb.putLong(qs.count)
    bb.putInt(st.length)
    st.foreach { s => bb.putDouble(s.value); bb.putLong(s.g); bb.putLong(s.delta) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val bb = ByteBuffer.wrap(bytes)
    val eps = bb.getDouble
    val ct = bb.getInt
    val count = bb.getLong
    val n = bb.getInt
    val st = Array.fill(n)(Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(ct, eps, st, count, true)
  }

  /** Compressed merge that tolerates empty sides (an all-null slice
    * produces a count-0 sketch). */
  def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries = {
    val ac = a.compress()
    val bc = b.compress()
    if (bc.count == 0) ac
    else if (ac.count == 0) bc
    else ac.merge(bc)
  }

  def newSummaries(eps: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps,
      Array.empty[Stats], 0L, true)

  /** Quantile estimate from a serialized sketch; null (None) when the
    * sketch holds no rows — the `approx_percentile`-on-empty contract. */
  def estimate(bytes: Array[Byte], fraction: Double): Option[Double] =
    deserialize(bytes).query(fraction).asInstanceOf[Option[Double]]
}

object qsketch {

  /** quantile_sketch_agg(value, eps) → binary GK sketch of the group's
    * values. Partial aggregation ships compressed sketches (~KB), not
    * values — the map-side state is O(1/eps · log(eps·n)) regardless
    * of group size. */
  case class QuantileSketchAgg(
      child: Expression,
      eps: Double,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QuantileSummaries] with ImplicitCastInputTypes {
    require(eps > 0 && eps < 1, s"eps must be in (0, 1), got $eps")

    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(DoubleType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): QuantileSummaries =
      QuantileSketchOps.newSummaries(eps)

    override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
      val v = child.eval(input)
      if (v != null) buffer.insert(v.asInstanceOf[Double]) else buffer
    }

    override def merge(buffer: QuantileSummaries, other: QuantileSummaries): QuantileSummaries =
      QuantileSketchOps.merge(buffer, other)

    override def eval(buffer: QuantileSummaries): Any =
      QuantileSketchOps.serialize(buffer)

    override def serialize(buffer: QuantileSummaries): Array[Byte] =
      QuantileSketchOps.serialize(buffer)
    override def deserialize(bytes: Array[Byte]): QuantileSummaries =
      QuantileSketchOps.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
      copy(child = newChildren(0))
    override def prettyName: String = "quantile_sketch_agg"
  }

  /** quantile_sketch_union_agg(sketch) → binary sketch merging a
    * column of stored sketches (the fastHLL `hll_union_agg` analog):
    * coarse rollups re-aggregate sketches, never rows. */
  case class QuantileSketchUnionAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QuantileSummaries] with ImplicitCastInputTypes {

    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    // eps is carried by the incoming sketches; an empty group merges
    // nothing and serializes an empty default-eps sketch
    override def createAggregationBuffer(): QuantileSummaries =
      QuantileSketchOps.newSummaries(QuantileSummaries.defaultRelativeError)

    override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
      val v = child.eval(input)
      if (v != null)
        QuantileSketchOps.merge(buffer,
          QuantileSketchOps.deserialize(v.asInstanceOf[Array[Byte]]))
      else buffer
    }

    override def merge(buffer: QuantileSummaries, other: QuantileSummaries): QuantileSummaries =
      QuantileSketchOps.merge(buffer, other)

    override def eval(buffer: QuantileSummaries): Any =
      QuantileSketchOps.serialize(buffer)

    override def serialize(buffer: QuantileSummaries): Array[Byte] =
      QuantileSketchOps.serialize(buffer)
    override def deserialize(bytes: Array[Byte]): QuantileSummaries =
      QuantileSketchOps.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchUnionAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchUnionAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): QuantileSketchUnionAgg =
      copy(child = newChildren(0))
    override def prettyName: String = "quantile_sketch_union_agg"
  }

  /** quantile_sketch_estimate(sketch, fraction) → double quantile
    * estimate; null for an empty sketch. Evaluated once per GROUP (not
    * per row), so CodegenFallback costs nothing measurable. */
  case class QuantileSketchEstimate(child: Expression, fraction: Double)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    require(fraction >= 0 && fraction <= 1,
      s"fraction must be in [0, 1], got $fraction")
    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(BinaryType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      QuantileSketchOps.estimate(input.asInstanceOf[Array[Byte]], fraction).orNull
    override protected def withNewChildInternal(newChild: Expression): QuantileSketchEstimate =
      copy(child = newChild)
    override def prettyName: String = "quantile_sketch_estimate"
  }
}

/** Column facade for the quantile sketch family. */
object QuantileSketch {
  def sketchAgg(value: Column, eps: Double = 0.01): Column =
    GraftSqlBridge.column(qsketch.QuantileSketchAgg(
      GraftSqlBridge.expression(value), eps).toAggregateExpression())

  def unionAgg(sketch: Column): Column =
    GraftSqlBridge.column(qsketch.QuantileSketchUnionAgg(
      GraftSqlBridge.expression(sketch)).toAggregateExpression())

  def estimate(sketch: Column, fraction: Double): Column =
    GraftSqlBridge.column(qsketch.QuantileSketchEstimate(
      GraftSqlBridge.expression(sketch), fraction))
}
