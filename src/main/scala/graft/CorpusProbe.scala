package graft

import org.apache.spark.sql.SparkSession
import graft.pql.{CorpusHarness, Pql}

/** One-off timing probe for the corpus harness: runs `n` sampled lines
  * SEQUENTIALLY and prints per-phase wall time (parse+compile, PQL-side
  * execution, hsql-side execution + compare) so harness tuning targets
  * the real bottleneck instead of guessing. Dev tooling only. */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("GRAFT_WSCG", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fx = CorpusHarness.fixture(spark)
    val byId = fx.lines.map(l => l.id -> l).toMap
    val ids = CorpusHarness.sampleIds(40).take(n)
    // warmup: first 3 lines absorb codegen/classload
    ids.take(3).foreach(i => CorpusHarness.compareLine(spark, fx, byId(i)))
    var tParse = 0.0; var tPql = 0.0; var tLine = 0.0
    ids.foreach { i =>
      val l = byId(i)
      val a = System.nanoTime()
      val q = Pql.parse(l.pql)
      val df = Pql.toDataFrame(q, _ => fx.mv)
      val b = System.nanoTime()
      df.collect()
      val c = System.nanoTime()
      CorpusHarness.compareLine(spark, fx, l)
      val d = System.nanoTime()
      tParse += (b - a) / 1e9; tPql += (c - b) / 1e9; tLine += (d - c) / 1e9
    }
    println(f"[probe] n=$n parse+compile=${tParse}%.2f s pql-exec=${tPql}%.2f s full-compareLine=${tLine}%.2f s")
    spark.stop()
  }
}
