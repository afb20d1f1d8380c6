package graft

import org.apache.spark.sql.functions._
import graft.functions.{TDigestCol, TDunningDigest}

/** t-digest 3.2 binary compatibility ([[graft.functions.TDunningDigest]]):
  * golden VERBOSE byte layout, codec identity, merge + quantile accuracy
  * within the reference's own test tolerance, and the distributed
  * union-agg over stored digest columns. */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  test("golden VERBOSE layout: hand-computed bytes for a 2-centroid digest") {
    // A digest with centroids (w=2, m=1.5), (w=1, m=9.0), min 1, max 9,
    // compression 100 — byte-for-byte the MergingDigest.asBytes layout.
    val d = TDunningDigest.empty()
    d.min = 1.0; d.max = 9.0
    d.mean = Array(1.5, 9.0)
    d.weight = Array(2.0, 1.0)
    val bytes = TDunningDigest.toBytes(d)
    val bb = java.nio.ByteBuffer.allocate(32 + 16 * 2)
    bb.putInt(1) // VERBOSE encoding code
    bb.putDouble(1.0).putDouble(9.0) // min, max
    bb.putDouble(100.0) // compression
    bb.putInt(2) // centroid count
    bb.putDouble(2.0).putDouble(1.5) // weight, mean
    bb.putDouble(1.0).putDouble(9.0)
    assert(bytes.toSeq === bb.array().toSeq)
  }

  test("codec identity: fromBytes . toBytes is byte-stable") {
    val d = TDunningDigest.empty()
    (1 to 10000).foreach(i => d.add(math.log(i.toDouble)))
    val b1 = TDunningDigest.toBytes(d)
    val b2 = TDunningDigest.toBytes(TDunningDigest.fromBytes(b1))
    assert(b1.toSeq === b2.toSeq)
    assert(b1.length === 32 + 16 * TDunningDigest.fromBytes(b1).n)
  }

  test("empty digest: +Inf/-Inf min-max, 0 centroids, NaN quantile") {
    val b = TDunningDigest.toBytes(TDunningDigest.empty())
    assert(b.length === 32)
    val d = TDunningDigest.fromBytes(b)
    assert(d.min.isPosInfinity && d.max.isNegInfinity && d.n === 0)
    assert(d.quantile(0.5).isNaN)
  }

  test("SMALL encoding is rejected with a clear error") {
    val bb = java.nio.ByteBuffer.allocate(32)
    bb.putInt(2) // SMALL encoding code
    val e = intercept[IllegalArgumentException](TDunningDigest.fromBytes(bb.array()))
    assert(e.getMessage.contains("SMALL"))
  }

  test("quantile accuracy on a known distribution (rank tolerance 0.05)") {
    // The reference's PercentileTDigestQueriesTest accepts +/-0.05 rank
    // error; t-digest at compression 100 is far tighter mid-range.
    val n = 100000
    val d = TDunningDigest.empty()
    val rnd = new scala.util.Random(7)
    val values = Array.fill(n)(rnd.nextDouble() * 1000)
    values.foreach(d.add(_))
    val sorted = values.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = d.quantile(q)
      // locate est's rank in the true data
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) <= 0.05, s"q=$q est=$est rank=$rank")
    }
    // extreme quantiles anchor to true min/max
    assert(d.quantile(0.0) === sorted.head)
    assert(d.quantile(1.0) === sorted.last)
  }

  test("merge of shard digests matches the directly-built digest envelope") {
    val n = 60000
    val rnd = new scala.util.Random(11)
    val values = Array.fill(n)(rnd.nextGaussian() * 50 + 500)
    val shards = values.grouped(n / 8).map { chunk =>
      val d = TDunningDigest.empty()
      chunk.foreach(d.add(_))
      TDunningDigest.toBytes(d) // through the codec, like segment reads
    }.toSeq
    val merged = shards.map(TDunningDigest.fromBytes)
      .reduce((a, b) => a.mergeWith(b))
    assert(math.abs(merged.totalWeight - n) < 1e-6)
    val sorted = values.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val rank = sorted.count(_ <= merged.quantile(q)).toDouble / n
      assert(math.abs(rank - q) <= 0.05, s"q=$q rank=$rank")
    }
    // centroid count stays bounded by the compression invariant (~2c)
    assert(merged.n <= 2 * 100 + 20, s"centroids=${merged.n}")
  }

  test("mergeWith flushes pending add() buffers on both sides") {
    // an all-pending digest has n == 0 but is NOT empty: merge must
    // flush it, not early-return and silently drop its points
    val a = TDunningDigest.empty()
    val b = TDunningDigest.empty()
    b.add(5.0)
    assert(!a.mergeWith(b).quantile(0.5).isNaN)
    assert(a.quantile(0.5) === 5.0)
    // and the receiver's own pending points survive a merge too
    val c = TDunningDigest.empty(); c.add(1.0)
    val d = TDunningDigest.empty(); d.add(3.0)
    c.mergeWith(d)
    assert(c.totalWeight === 2.0)
  }

  test("union agg over a stored digest column = build agg over raw rows") {
    val rows = (1 to 20000).map(i => (i % 5, i % 40, (i % 1000).toDouble))
      .toDF("g", "sub", "v")
    val stored = rows.groupBy($"g", $"sub")
      .agg(TDigestCol.buildAgg($"v").as("td"))
    val unioned = stored.groupBy($"g")
      .agg(TDigestCol.unionAgg($"td").as("td"))
      .select($"g", TDigestCol.quantile($"td", 0.5).as("p50"))
    val exact = rows.groupBy($"g")
      .agg(expr("percentile(v, 0.5)").as("p50x"))
    val err = unioned.join(exact, "g")
      .select(abs($"p50" - $"p50x").as("err")).as[Double].collect()
    // values cycle 0..999 uniformly; 0.05 rank tolerance = 50 in value
    assert(err.forall(_ <= 50), err.mkString(","))
  }

  test("digest aggregation is two-phase (partial digests map-side)") {
    val df = (1 to 100).map(i => (i % 3, i.toDouble)).toDF("g", "v")
      .groupBy($"g").agg(TDigestCol.buildAgg($"v").as("td"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("tdigest_build_agg"), p.take(600))
    assert(p.contains("partial_tdigest_build_agg") || p.contains("ObjectHashAggregate"),
      s"no partial phase:\n${p.take(1200)}")
  }

  test("null inputs are skipped, not poisoned") {
    val df = Seq((1, Some(5.0)), (1, None), (1, Some(7.0)))
      .toDF("g", "v")
      .groupBy($"g").agg(TDigestCol.buildAgg($"v").as("td"))
      .select(TDigestCol.quantile($"td", 0.5).as("p50"))
    val v = df.as[Double].head()
    assert(v >= 5.0 && v <= 7.0)
  }
}
