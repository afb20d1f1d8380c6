package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pql.Pql

/** Scratch probe: why does the heavy bench window measure h1 at ~0.6 s
  * where the raw section measures 0.2 s on the same files? Candidate
  * causes, isolated: per-rep PQL re-compile (the heavy section calls
  * `pqlDf(name)` by-name inside the sampler), the `System.gc()`
  * between reps (`sampleGc`), and the full-result checksum wrapper.
  * Not part of the shipped surface.
  */
object H1WindowProbe {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
  private def report(tag: String, xs: Seq[Double]): Unit =
    println(f"[h1probe] $tag%-34s p50=${p50(xs)}%.3f reps=${xs.map(x => f"$x%.3f").mkString(",")}")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = spark.read.parquet(s"${BenchScale.dataRoot}/scale_sf1000/ontime.parquet")
    t.agg(count(lit(1))).collect() // warm page cache
    val loader: String => DataFrame = _ => t
    val pqlText = "SELECT DISTINCTCOUNTHLL(FlightNum) FROM ontime"
    def compiled(): DataFrame = Pql.toDataFrame(Pql.parse(pqlText), loader)
    def exec(df: DataFrame): Unit = {
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect(); ()
    }

    val df0 = compiled()
    df0.collect() // warm
    report("reexec_same_df_collect", (1 to 5).map(_ => time(df0.collect())))
    report("reexec_same_df_checksum", (1 to 5).map(_ => time(exec(df0))))
    report("fresh_compile_collect", (1 to 5).map(_ => time(compiled().collect())))
    report("fresh_compile_checksum", (1 to 5).map(_ => time(exec(compiled()))))
    report("fresh_compile_checksum_gc", (1 to 5).map { _ =>
      val x = time(exec(compiled())); System.gc(); x
    })
    spark.stop()
  }
}
