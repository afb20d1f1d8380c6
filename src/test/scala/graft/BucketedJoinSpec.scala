package graft

import org.apache.spark.sql.functions._
import graft.queries.CoreQueries

/** Bucketed co-located join — the scale claim behind
  * `Ingest.writeBucketedSegment` (the reference's partition-aware
  * segment assignment + partition pruning,
  * `data/partition/PartitionFunctionFactory.java`,
  * `query/pruner/PartitionSegmentPruner.java`): with both facts
  * bucketed on the join key and broadcast disabled (as at fact scale,
  * where neither side fits a broadcast), the join plans with NO
  * shuffle exchange on either side. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join on the bucket key is exchange-free on both sides") {
    val (liT, ordT) = CoreQueries.bucketTables(spark, sfDir)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(liT)
        .join(spark.table(ordT), $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_quantity", $"o_orderpriority")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n${plan.take(1000)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(1500)}")
      // same rows as the unbucketed join (the bucketed round-trip
      // loses nothing)
      import graft.sources.{Tables => T}
      val expect = T.load(spark, sfDir, "lineitem")
        .join(T.load(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
        .count()
      assert(joined.count() === expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("aggregation on the bucket key needs no exchange before the aggregate") {
    val (liT, _) = CoreQueries.bucketTables(spark, sfDir)
    val agg = spark.table(liT).groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"group-by on the bucket column must aggregate in place:\n${plan.take(1500)}")
  }
}
