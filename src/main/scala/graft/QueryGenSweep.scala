package graft

import org.apache.spark.sql.SparkSession
import graft.pql.{CorpusHarness, QueryGen}

/** Multi-seed sweep driver for the generated-query gate: runs
  * `linesPerSeed` [[QueryGen]] lines for each seed in
  * [seedStart, seedStart + numSeeds) through the corpus harness
  * comparator and prints every mismatch with its (seed, id, pql, sql)
  * so it reproduces exactly. The per-round suite runs the fixed-seed
  * 500 plus a rotating-seed 300; this main is the wide proactive probe
  * (tens of thousands of fresh combinations in one invocation). */
object QueryGenSweep {
  def main(args: Array[String]): Unit = {
    val seedStart = if (args.nonEmpty) args(0).toLong else 1L
    val numSeeds = if (args.length > 1) args(1).toInt else 10
    val linesPerSeed = if (args.length > 2) args(2).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // micro-query regime: see CorpusSweep's measured rationale
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fx = CorpusHarness.fixture(spark)
    val t0 = System.nanoTime()
    var total = 0
    var mismatched = 0
    (seedStart until seedStart + numSeeds).foreach { seed =>
      val lines = QueryGen.lines(linesPerSeed, seed)
      val outcomes = CorpusHarness.compareAll(spark, fx, lines)
      val bad = outcomes.filterNot(_.matched)
      total += outcomes.size
      mismatched += bad.size
      bad.foreach { o =>
        println(s"[qgsweep] MISMATCH seed=$seed id=${o.id} mode=${o.mode}: ${o.reason}")
        println(s"[qgsweep]   pql: ${lines(o.id).pql}")
        println(s"[qgsweep]   sql: ${lines(o.id).hsqls.head}")
      }
      println(f"[qgsweep] seed=$seed: ${outcomes.size - bad.size}/${outcomes.size} matched " +
        f"(${(System.nanoTime() - t0) / 1e9}%.0f s elapsed)")
    }
    println(s"[qgsweep] TOTAL ${total - mismatched}/$total matched across $numSeeds seeds")
    spark.stop()
    if (mismatched > 0) sys.exit(1)
  }
}
