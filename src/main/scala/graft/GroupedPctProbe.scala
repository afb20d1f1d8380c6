package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Percentiles
import graft.queries.ScaleTable

/** Scratch probe (VERDICT r8 item 6): does per-group rank-narrowing
  * beat the exact distributed histogram for a grouped percentile over
  * a NEAR-UNIQUE value column with FEW groups (the g2 shape per status
  * flag)? Measures the shipped histogram plan vs a per-group
  * rankSelect loop (G × ~3 counting scans — an upper bound on what a
  * generalized grouped rankSelect with group-keyed cells would cost).
  * Not part of the shipped surface.
  */
object GroupedPctProbe {
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
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"${BenchScale.dataRoot}/scale_gpprobe"
    ScaleTable.ensure(spark, dir, rows)
    val table = spark.read.parquet(s"$dir/ontime.parquet")
    table.agg(count(lit(1))).collect() // warm

    // mode "batched": HISTORICAL RECORD of the r10 scale probe that
    // measured the (since-REVERTED) f46f9d0 chunked >64-group
    // narrowing path at 215 s p50 vs the grouped histogram's 21.6 s
    // at 100M rows (values identical) — the evidence behind commit
    // 422023a. On HEAD, rankSelectKeyed at 100 groups routes straight
    // to histogramAggs, so tKeyed and tHist100 below now measure the
    // SAME plan and the parity require() compares the histogram to
    // itself: a rerun CANNOT reproduce the 215 s number and says
    // nothing about the removed path. Kept only so the cited probe
    // method stays readable next to its numbers.
    if (args.length > 2 && args(2) == "batched") {
      def frame100 = table.select(
        pmod(col("FlightNum"), lit(100)).as("g"),
        pmod(xxhash64(col("FlightNum"), col("ArrTime"), col("Distance")),
          lit(1L << 31)).cast("double").as("v"))
      val specs = Seq(
        Percentiles.Spec(0.5, "p50", nearestRank = false),
        Percentiles.Spec(0.95, "p95", nearestRank = false))
      val keyed = Percentiles.rankSelectKeyed(frame100, Seq("g"), "v", specs)
        .orderBy(col("g")).collect()
      println(s"[gpprobe] batched groups answered = ${keyed.length}")
      val hist = Percentiles.histogramAggs(frame100, Seq("g"), "v", specs)
        .orderBy(col("g")).collect()
      require(keyed.length == hist.length && keyed.zip(hist).forall { case (a, b) =>
          a.get(0) == b.get(0) && a.getDouble(1) == b.getDouble(1) &&
            a.getDouble(2) == b.getDouble(2)
        }, "batched narrowing diverged from the grouped histogram")
      println("[gpprobe] batched values identical to the histogram's")
      val tKeyed = sample(reps) {
        Percentiles.rankSelectKeyed(frame100, Seq("g"), "v", specs).collect(); ()
      }
      println(f"[gpprobe] batched_narrowing(100g) p50=${p50(tKeyed)}%.2f reps=${tKeyed.map(x => f"$x%.2f").mkString(",")}")
      val tHist100 = sample(reps) {
        Percentiles.histogramAggs(frame100, Seq("g"), "v", specs).collect(); ()
      }
      println(f"[gpprobe] grouped_histogram(100g) p50=${p50(tHist100)}%.2f reps=${tHist100.map(x => f"$x%.2f").mkString(",")}")
      spark.stop()
      return
    }

    // the g2 near-unique value, grouped by the 2-value status flag
    def frame = table.select(col("Cancelled").as("g"),
      pmod(xxhash64(col("FlightNum"), col("ArrTime"), col("Distance")),
        lit(1L << 31)).cast("double").as("v"))
    val specs = Seq(
      Percentiles.Spec(0.5, "p50", nearestRank = false),
      Percentiles.Spec(0.95, "p95", nearestRank = false))
    val groups = frame.select(col("g")).distinct().collect()
      .map(_.get(0)).sortBy(_.toString)
    println(s"[gpprobe] groups = ${groups.mkString(",")}")

    // (a) the shipped grouped path: exact distributed value histogram
    // (distinct keys ≈ rows here — the degenerate case)
    val histVals = Percentiles.histogramAggs(frame, Seq("g"), "v", specs)
      .orderBy(col("g")).collect().map(_.toSeq).toSeq
    val tHist = sample(reps) {
      Percentiles.histogramAggs(frame, Seq("g"), "v", specs).collect(); ()
    }
    println(f"[gpprobe] grouped_histogram  p50=${p50(tHist)}%.2f reps=${tHist.map(x => f"$x%.2f").mkString(",")}")

    // (b) per-group rankSelect loop — G × (~3 counting scans); a
    // native grouped implementation shares the scans across groups,
    // so its cost is bounded below by tHist-vs-this comparison
    def perGroup(): Seq[Seq[Any]] = groups.map { gv =>
      val r = Percentiles.rankSelect(
        frame.filter(col("g") === lit(gv)).select(col("v")), "v", specs).head()
      Seq(gv, r.get(0), r.get(1))
    }.toSeq
    val rankVals = perGroup()
    val tRank = sample(reps)(perGroup(): Unit)
    println(f"[gpprobe] pergroup_rankselect p50=${p50(tRank)}%.2f reps=${tRank.map(x => f"$x%.2f").mkString(",")}")

    // values must agree exactly (both are exact algorithms)
    histVals.zip(rankVals).foreach { case (h, r) =>
      require(h(0) == r(0) && h(1) == r(1) && h(2) == r(2),
        s"grouped percentile mismatch: hist=$h rank=$r")
    }
    println("[gpprobe] values identical across plans")
    spark.stop()
  }
}
