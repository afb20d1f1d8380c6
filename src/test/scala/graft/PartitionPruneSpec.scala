package graft

import org.apache.spark.sql.functions._
import graft.queries.CoreQueries
import graft.sources.Tables

/** Partitioned segment layout — the scale claim behind
  * `Ingest.writePartitionedSegment` (the reference's segment pruning:
  * broker time-boundary routing + server-side
  * `ColumnValueSegmentPruner.java`): a filter on the partition column
  * must prune directories at PLAN time, so the scan never lists the
  * excluded partitions' files. */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  test("filter on the partition column becomes a plan-time PartitionFilter") {
    val df = CoreQueries.qPartitionPrune(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_type"),
      s"partition filter not recognized at plan time:\n${plan.take(1200)}")
    // the data files must not contain the partition column — it lives
    // in the directory path (ReadSchema is the tail of the scan line)
    val readSchema = plan.split("ReadSchema:").lift(1).map(_.takeWhile(_ != '\n')).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("event_type"),
      s"partition column must come from the path, not the data files: $readSchema")
  }

  test("partitioned round-trip loses nothing vs the original table") {
    val got = CoreQueries.qPartitionPrune(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val want = Tables.load(spark, sfDir, "events")
      .filter($"event_type".isin("click", "purchase"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), round(sum($"value"), 3).as("sum_value"),
        countDistinct($"user_id").as("dc_users"))
      .orderBy($"event_type")
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }
}
