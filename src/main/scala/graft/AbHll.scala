package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: HLL++ vs DataSketches HLL at scale (dev tool). */
object AbHll {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 100000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"${BenchScale.dataRoot}/scale_ab"
    graft.queries.ScaleTable.ensure(spark, dir, rows)
    val t = spark.read.parquet(s"$dir/ontime.parquet")
    t.agg(count(lit(1))).collect() // warm page cache
    def time(tag: String)(f: => Any): Unit = {
      f // warm
      val xs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $tag%-28s p50=${xs.sorted.apply(2)}%.3f reps=${xs.map(x => f"$x%.3f").mkString(",")}")
    }
    time("hllpp_rsd0.065")(t.agg(approx_count_distinct(col("FlightNum"), 0.065)).collect())
    time("hllpp_default")(t.agg(approx_count_distinct(col("FlightNum"))).collect())
    time("ds_hll_lgk12")(t.agg(hll_sketch_estimate(hll_sketch_agg(col("FlightNum")))).collect())
    time("ds_hll_lgk8")(t.agg(hll_sketch_estimate(hll_sketch_agg(col("FlightNum"), lit(8)))).collect())
    // the group-by shape too (a4-like): strings
    time("gb_hllpp")(t.groupBy(col("Carrier")).agg(approx_count_distinct(col("FlightNum"), 0.065)).collect())
    time("gb_ds12")(t.groupBy(col("Carrier")).agg(hll_sketch_estimate(hll_sketch_agg(col("FlightNum")))).collect())
    spark.stop()
  }
}
