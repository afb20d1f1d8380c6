package graft

import org.apache.spark.sql.SparkSession

/** Plan/latency probe: `runMain graft.Explain <query> <sfDir> [runs]`
  * prints the formatted plan, then (for runs > 0) executes with the
  * bench checksum action and prints per-run wall times — the loop for
  * auditing one query's plan shape and latency without a full Bench
  * pass. `SPARK_GRAFT_AQE=false` disables AQE for A/B runs. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    import org.apache.spark.sql.functions.{bit_xor, struct, xxhash64}
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.agg(bit_xor(xxhash64(struct(df.columns.map(df(_)): _*)))).collect()
      println(f"[explain] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (aqe=$aqe)")
    }
    spark.stop()
  }
}
