package graft

import org.apache.spark.sql.functions._
import graft.functions.{QuantileSketch, QuantileSketchOps}

/** Mergeable quantile sketch column (GK QuantileSummaries): roundtrip,
  * split-merge accuracy, empty semantics, and the partial-aggregation
  * plan shape that makes it a fixed-size shuffle payload. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("serialize/deserialize roundtrip preserves count and quantiles") {
    var qs = QuantileSketchOps.newSummaries(0.01)
    (1 to 1000).foreach(i => qs = qs.insert(i.toDouble))
    val rt = QuantileSketchOps.deserialize(QuantileSketchOps.serialize(qs))
    assert(rt.count === 1000L)
    val q = rt.query(0.5).get.asInstanceOf[Double]
    assert(math.abs(q - 500) <= 20, s"p50=$q") // rank error <= eps*n = 10
  }

  test("merge of split halves stays within the rank-error bound") {
    var a = QuantileSketchOps.newSummaries(0.01)
    var b = QuantileSketchOps.newSummaries(0.01)
    // interleaved halves of 1..10000
    (1 to 10000).foreach { i =>
      if (i % 2 == 0) a = a.insert(i.toDouble) else b = b.insert(i.toDouble)
    }
    val m = QuantileSketchOps.merge(a, b)
    assert(m.count === 10000L)
    for (f <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = m.query(f).get.asInstanceOf[Double]
      assert(math.abs(est - f * 10000) <= 3 * 0.01 * 10000, s"f=$f est=$est")
    }
  }

  test("empty and null-only groups: exact zero count, null estimate") {
    val df = Seq((1, None: Option[Double]), (1, None), (2, Some(5.0)))
      .toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(QuantileSketch.sketchAgg($"v", 0.01).as("sk"))
      .select($"g", QuantileSketch.estimate($"sk", 0.5).as("p50"))
      .orderBy($"g")
      .as[(Int, Option[Double])].collect().toSeq
    assert(out === Seq((1, None), (2, Some(5.0))))
  }

  test("union agg over stored sketches equals direct sketch within bound") {
    val rows = (1 to 5000).map(i => (i % 7, i % 50, i.toDouble)).toDF("g", "sub", "v")
    val stored = rows.groupBy($"g", $"sub")
      .agg(QuantileSketch.sketchAgg($"v", 0.01).as("sk"))
    val unioned = stored.groupBy($"g")
      .agg(QuantileSketch.unionAgg($"sk").as("sk"))
      .select($"g", QuantileSketch.estimate($"sk", 0.5).as("p50"))
    val exact = rows.groupBy($"g")
      .agg(expr("percentile(v, 0.5)").as("p50x"))
    val joined = unioned.join(exact, "g")
      .select(abs($"p50" - $"p50x").as("err"))
      .as[Double].collect()
    // eps 0.01 over ~714 rows/group; values stride 7 so rank error
    // eps*n ~ 7 ranks ~ 50 in value; generous 3x margin
    assert(joined.forall(_ <= 150), joined.mkString(","))
  }

  test("sketch aggregation is two-phase (partial sketches map-side)") {
    val df = (1 to 100).map(i => (i % 3, i.toDouble)).toDF("g", "v")
      .groupBy($"g").agg(QuantileSketch.sketchAgg($"v", 0.01).as("sk"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("quantile_sketch_agg"), p.take(600))
    assert(p.contains("partial_quantile_sketch_agg") || p.contains("ObjectHashAggregate"),
      s"no partial phase:\n${p.take(1200)}")
  }
}
