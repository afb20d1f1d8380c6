package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded size-k heap of (score, id) pairs: keeps the k best by
  * (score desc, id asc). Binary min-heap whose root is the WORST kept
  * element, so insert is O(log k) and memory is O(k) regardless of how
  * many rows stream through — the partial-aggregation state for
  * [[exprs.TopKByScore]].
  */
final class TopKBuffer(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  def size: Int = n

  /** a is worse than b under (score desc, id asc) ranking. */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def insert(score0: Double, id: Long): Unit = {
    // canonicalize -0.0 → 0.0: the keep-decision below uses primitive
    // comparisons (which treat the zeros EQUAL, falling to the id
    // tiebreak) while sortedBestFirst uses a total ordering (which
    // ranks 0.0 above -0.0) — with both zeros present the kept set
    // and the output order would disagree about which comparator
    // governs. One canonical zero makes them consistent.
    val score = if (score0 == 0.0d) 0.0d else score0
    if (n < k) {
      var i = n
      scores(i) = score; ids(i) = id; n += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** Kept pairs ranked best-first: (score desc, id asc). */
  def sortedBestFirst: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortInPlace()(Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long))
    out
  }

  def foreachEntry(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }

  def serialize: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def deserialize(bytes: Array[Byte], k: Int): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}

object aggs {

  /** Top-k (id, score) pairs per group by (score desc, id asc) →
    * array<struct<id:bigint, score:double>> ranked best-first.
    *
    * The point at scale: a window `row_number() ... <= k` shuffles
    * EVERY scored candidate row before the rank filter; this aggregate
    * partially aggregates map-side (TypedImperativeAggregate), so the
    * shuffle carries at most k entries per group per map partition —
    * the Spark-native analogue of the reference's per-segment top-N
    * heaps merged at the broker
    * (`pinot-core/.../query/selection/SelectionOperatorService.java`,
    * `AggregationGroupByTrimmingService.java`). */
  case class TopKByScore(
      score: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {
    require(k > 0, s"k must be positive, got $k")

    override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(DoubleType, LongType)
    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))), containsNull = false)

    override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

    override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
      buffer
    }

    override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
      other.foreachEntry((s, i) => buffer.insert(s, i))
      buffer
    }

    override def eval(buffer: TopKBuffer): Any =
      new GenericArrayData(buffer.sortedBestFirst.map { case (s, i) =>
        InternalRow(i, s): Any
      })

    override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialize
    override def deserialize(bytes: Array[Byte]): TopKBuffer =
      TopKBuffer.deserialize(bytes, k)

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): TopKByScore =
      copy(score = newChildren(0), id = newChildren(1))
    override def prettyName: String = "top_k_by_score"
  }
}

/** Column facade for the aggregate. */
object GraftAggs {
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(aggs.TopKByScore(
      GraftSqlBridge.expression(score),
      GraftSqlBridge.expression(id), k).toAggregateExpression())
}
