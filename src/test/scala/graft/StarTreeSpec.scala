package graft

import org.apache.spark.sql.functions._
import graft.plans.StarTree
import graft.sources.Tables

class StarTreeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = Tables.load(spark, sfDir, "lineitem")
  private lazy val idx = StarTree.build(fact,
    Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))

  test("every covered group-by slice equals the direct aggregate") {
    for (dims <- Seq(Seq("l_returnflag"), Seq("l_linestatus"),
        Seq("l_returnflag", "l_linestatus"))) {
      val fromTree = idx.slice(dims)
        .select(dims.map(col) :+ col("sum_l_quantity") :+ col("star_count"): _*)
        .collect().map(_.toSeq).toSet
      val direct = fact.groupBy(dims.map(col): _*)
        .agg(sum($"l_quantity").as("s"), count(lit(1)).as("c"))
        .collect().map(_.toSeq).toSet
      assert(fromTree === direct, s"mismatch for dims=$dims")
    }
  }

  test("the global (all-star) slice is the table-wide aggregate") {
    val all = idx.slice(Nil).select("sum_l_quantity", "star_count")
      .as[(Double, Long)].head()
    val direct = fact.agg(sum($"l_quantity"), count(lit(1)))
      .as[(Double, Long)].head()
    assert(all === direct)
  }

  test("routing: covered queries come from the tree, others scan the fact table") {
    val (fromTree, usedTree) = StarTree.route(idx, fact, Seq("l_returnflag"), "l_quantity")
    assert(usedTree)
    val (fallback, usedTree2) = StarTree.route(idx, fact, Seq("l_suppkey"), "l_quantity")
    assert(!usedTree2)
    val t = fromTree.orderBy("l_returnflag")
      .select("l_returnflag", "sum_l_quantity", "cnt")
      .collect().map(_.toSeq).toSeq
    val d = fact.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("s"), count(lit(1)).as("c"))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(t === d)
    assert(fallback.count() > 0)
  }

  test("percentile-est metric: slice sketches bracket the exact percentiles") {
    val qidx = StarTree.build(fact, Seq("l_returnflag"), Seq("l_quantity"),
      quantileEps = 0.01)
    val est = qidx.slicePercentile(Seq("l_returnflag"), "l_quantity",
        Seq(0.5, 0.95))
      .withColumnRenamed("p50_l_quantity", "p50")
      .withColumnRenamed("p95_l_quantity", "p95")
    val exact = fact.groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.45, 0.55, 0.9, 1.0))").as("pe"))
    val rows = est.join(exact, "l_returnflag")
      .select(
        ($"p50" >= element_at($"pe", 1) && $"p50" <= element_at($"pe", 2)).as("ok50"),
        ($"p95" >= element_at($"pe", 3) && $"p95" <= element_at($"pe", 4)).as("ok95"))
      .as[(Boolean, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._1 && r._2), rows.mkString(","))
    // not built with sketches -> explicit rejection
    intercept[IllegalArgumentException](
      idx.slicePercentile(Seq("l_returnflag"), "l_quantity", Seq(0.5)))
  }

  test("uncovered dimension or metric is rejected by slice") {
    intercept[IllegalArgumentException](idx.slice(Seq("l_suppkey")))
  }
}
