package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for the RAW s2 page (full-table ORDER BY
  * DaysSinceEpoch, FlightNum LIMIT 100 OFFSET 1000 over the unsorted
  * segment) — VERDICT r9 item 6: name the constant behind the 2.97×
  * raw sel class before letting the composed-layout answer (0.41×)
  * stand. Components measured on the same files, same session:
  *
  *   scan_3col     — checksum agg over exactly the 3 projected columns
  *                   (the parquet scan floor for this projection)
  *   scan_sortcols — checksum over the 2 sort columns only
  *   topk_1        — ORDER BY ... LIMIT 1 (TakeOrdered, heap k=1:
  *                   per-row compare cost with no heap churn)
  *   topk_1100     — the real s2 (OFFSET 1000 + LIMIT 100 ⇒ k=1100)
  *   topk_noproj   — k=1100 over the sort columns only (isolates the
  *                   payload-column carry cost inside the heap)
  *
  * Not part of the shipped surface.
  */
object S2Probe {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def sample(reps: Int)(f: => Unit): Seq[Double] = {
    f
    (1 to reps).map(_ => time(f))
  }
  private def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 100000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"${BenchScale.dataRoot}/scale_sf1000"
    graft.queries.ScaleTable.ensure(spark, dir, rows)
    val t = spark.read.parquet(s"$dir/ontime.parquet")

    def checksum(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect(); ()
    }
    def report(tag: String, xs: Seq[Double]): Unit =
      println(f"[s2probe] $tag%-14s p50=${p50(xs)}%.3f reps=${xs.map(x => f"$x%.3f").mkString(",")}")

    report("scan_3col", sample(reps)(
      checksum(t.select("DaysSinceEpoch", "FlightNum", "Origin"))))
    report("scan_sortcols", sample(reps)(
      checksum(t.select("DaysSinceEpoch", "FlightNum"))))
    report("topk_1", sample(reps) {
      t.select("DaysSinceEpoch", "FlightNum", "Origin")
        .orderBy(col("DaysSinceEpoch"), col("FlightNum")).limit(1).collect(); ()
    })
    val s2 = t.select("DaysSinceEpoch", "FlightNum", "Origin")
      .orderBy(col("DaysSinceEpoch"), col("FlightNum"))
      .limit(1100).offset(1000)
    report("topk_1100", sample(reps) { s2.collect(); () })
    report("topk_noproj", sample(reps) {
      t.select("DaysSinceEpoch", "FlightNum")
        .orderBy(col("DaysSinceEpoch"), col("FlightNum"))
        .limit(1100).offset(1000).collect(); ()
    })
    println("[s2probe] s2 plan:\n" + s2.queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
