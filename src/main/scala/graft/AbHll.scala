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
    time("register_plan_rsd0.065")(graft.functions.HllFastPlan
      .distinctCountHll(t, col("FlightNum"), 0.065, "est").collect())
    // value pin: the register plan must reproduce the built-in bit-exactly
    locally {
      val a = t.agg(approx_count_distinct(col("FlightNum"), 0.065)).head().getLong(0)
      val b = graft.functions.HllFastPlan
        .distinctCountHll(t, col("FlightNum"), 0.065, "est").head().getLong(0)
      println(s"[ab] estimates: builtin=$a register=$b identical=${a == b}")
    }
    time("hllpp_default")(t.agg(approx_count_distinct(col("FlightNum"))).collect())
    // decomposition: where does the register plan's time go?
    time("scan_floor_max")(t.agg(max(col("FlightNum"))).collect())
    time("scan_hash_max")(t.agg(max(xxhash64(col("FlightNum")))).collect())
    time("registers_only")(graft.functions.HllFastPlan
      .registers(t, col("FlightNum"), 9).agg(max("_hll_rank")).collect())
    time("gb512_count")(t.select(
        shiftrightunsigned(xxhash64(col("FlightNum")), 55).as("i"))
      .groupBy("i").count().agg(max("count")).collect())
    // per-partition flat register arrays via mapPartitions over the
    // codegen'd hash column — no per-row hashmap probe at all
    def rddRegisters(): Array[(Int, Int)] = {
      val p = 9
      val h = t.where(col("FlightNum").isNotNull)
        .select(xxhash64(col("FlightNum")).as("_h"))
      h.queryExecution.toRdd.mapPartitions { it =>
        val regs = new Array[Byte](1 << p)
        while (it.hasNext) {
          val x = it.next().getLong(0)
          val idx = (x >>> (64 - p)).toInt
          val rank = (java.lang.Long.numberOfLeadingZeros((x << p) | (1L << (p - 1))) + 1).toByte
          if (rank > regs(idx)) regs(idx) = rank
        }
        Iterator.single(regs)
      }.reduce { (a, b) =>
        var i = 0
        while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
        a
      }.zipWithIndex.collect { case (r, i) if r > 0 => (i, r.toInt) }
    }
    time("rdd_registers")(rddRegisters(): Unit)
    println(graft.functions.HllFastPlan
      .distinctCountHll(t, col("FlightNum"), 0.065, "est")
      .queryExecution.executedPlan.toString.take(3000))
    time("ds_hll_lgk12")(t.agg(hll_sketch_estimate(hll_sketch_agg(col("FlightNum")))).collect())
    time("ds_hll_lgk8")(t.agg(hll_sketch_estimate(hll_sketch_agg(col("FlightNum"), lit(8)))).collect())
    // the group-by shape too (a4-like): strings
    time("gb_hllpp")(t.groupBy(col("Carrier")).agg(approx_count_distinct(col("FlightNum"), 0.065)).collect())
    time("gb_ds12")(t.groupBy(col("Carrier")).agg(hll_sketch_estimate(hll_sketch_agg(col("FlightNum")))).collect())
    spark.stop()
  }
}
