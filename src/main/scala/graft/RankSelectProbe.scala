package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Percentiles

/** r12 A/B probe: the fused-first-pass rankSelect vs the classic
  * dedicated-stats-pass flow ([[Percentiles.forceStatsPass]]),
  * INTERLEAVED reps in one JVM over the BenchScale 100M dataset —
  * the g2 (global) and g3 (grouped) heavy shapes. Interleaving is the
  * point: the sandbox drifts minute-to-minute, so paired reps are the
  * only trustworthy comparison. Measurement tooling only.
  *
  *   runMain graft.RankSelectProbe [reps]
  */
object RankSelectProbe {
  private def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // default: the BenchScale 100M heavy shapes; "sf:<dir>" probes the
    // bench-scale lineitem shapes instead (the q_percentile_approx /
    // q_pql_percentile_rank_grouped exact sides)
    val sfDir = args.drop(1).find(_.startsWith("sf:")).map(_.stripPrefix("sf:"))
    val (nearUniqueF, keyedNearUniqueF): (() => org.apache.spark.sql.DataFrame,
        () => org.apache.spark.sql.DataFrame) = sfDir match {
      case Some(d) =>
        val li = graft.sources.Tables.load(spark, d, "lineitem")
        (() => li.select(col("l_extendedprice").cast("double").as("v")),
          () => li.select(col("l_returnflag").as("g"),
            col("l_extendedprice").cast("double").as("v")))
      case None =>
        val table = spark.read.parquet(
          s"${BenchScale.dataRoot}/scale_sf1000/ontime.parquet")
        (() => table.select(
          pmod(xxhash64(col("FlightNum"), col("ArrTime"), col("Distance")),
            lit(1L << 31)).cast("double").as("v")),
          () => table.select(col("Cancelled").as("g"),
            pmod(xxhash64(col("FlightNum"), col("ArrTime"), col("Distance")),
              lit(1L << 31)).cast("double").as("v")))
    }
    def nearUnique = nearUniqueF()
    def keyedNearUnique = keyedNearUniqueF()
    val specs = Seq(
      Percentiles.Spec(0.5, "p50", nearestRank = false),
      Percentiles.Spec(0.95, "p95", nearestRank = false))

    def runG2(): Unit = { Percentiles.rankSelect(nearUnique, "v", specs).collect(); () }
    def runG3(): Unit = {
      Percentiles.rankSelectKeyed(keyedNearUnique, Seq("g"), "v", specs).collect(); ()
    }
    def timed(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // value parity between the two flows, asserted before timing
    Percentiles.forceStatsPass = false
    val g2New = Percentiles.rankSelect(nearUnique, "v", specs).head()
    val g3New = Percentiles.rankSelectKeyed(keyedNearUnique, Seq("g"), "v", specs)
      .orderBy(col("g")).collect().toSeq
    Percentiles.forceStatsPass = true
    val g2Old = Percentiles.rankSelect(nearUnique, "v", specs).head()
    val g3Old = Percentiles.rankSelectKeyed(keyedNearUnique, Seq("g"), "v", specs)
      .orderBy(col("g")).collect().toSeq
    require(g2New == g2Old, s"g2 flows diverge: $g2New vs $g2Old")
    require(g3New == g3Old, s"g3 flows diverge: $g3New vs $g3Old")
    println(s"[rsprobe] parity OK: g2=$g2New g3=${g3New.mkString(";")}")

    // optional "jobs" arg: per-job wall times for one execution per
    // flow — exposes WHERE a pass-structure regression lives
    if (args.contains("jobs")) {
      val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobLog.put(js.jobId, js.time); ()
          }
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val t0 = jobLog.getOrDefault(je.jobId, je.time)
            println(f"[rsprobe-job] job=${je.jobId} ${(je.time - t0) / 1e3}%.2fs")
          }
        })
      Percentiles.forceStatsPass = false
      println("[rsprobe] --- g3 fused jobs ---"); runG3()
      Percentiles.forceStatsPass = true
      println("[rsprobe] --- g3 stats jobs ---"); runG3()
      Thread.sleep(500)
    }

    val (n2, o2, n3, o3) = (Seq.newBuilder[Double], Seq.newBuilder[Double],
      Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to reps).foreach { i =>
      Percentiles.forceStatsPass = false
      val a = timed(runG2()); n2 += a
      Percentiles.forceStatsPass = true
      val b = timed(runG2()); o2 += b
      Percentiles.forceStatsPass = false
      val c = timed(runG3()); n3 += c
      Percentiles.forceStatsPass = true
      val d = timed(runG3()); o3 += d
      println(f"[rsprobe] rep$i g2 fused=$a%.3f stats=$b%.3f | g3 fused=$c%.3f stats=$d%.3f")
    }
    Percentiles.forceStatsPass = false
    println(f"[rsprobe] g2 p50 fused=${p50(n2.result())}%.3f stats=${p50(o2.result())}%.3f")
    println(f"[rsprobe] g3 p50 fused=${p50(n3.result())}%.3f stats=${p50(o3.result())}%.3f")
    spark.stop()
  }
}
