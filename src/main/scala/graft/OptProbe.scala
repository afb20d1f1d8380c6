package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 optimization measurement loop: settled per-query p50s and
  * formatted-plan dumps for a LIST of SparkEntry queries in ONE JVM.
  *
  *   runMain graft.OptProbe <sfDir> <reps> [plans:<outDir>] q1 q2 ...
  *
  * For each query: one warmup execution, then `reps` timed executions
  * of the bench checksum action with a `System.gc()` settle before the
  * timed block (the Bench/BenchScale methodology), printing min / p50 /
  * max. With `plans:<outDir>`, each query's `.explain("formatted")`
  * output is also written to `<outDir>/<name>.txt` — the artifact the
  * round's plan claims are checked against. Not part of the shipped
  * query surface; measurement tooling only.
  */
object OptProbe {
  private def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val (planDir, names0) = args.drop(2).partition(_.startsWith("plans:"))
    val names = names0.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // r12: count Spark jobs per execution — eager driver-coordinated
    // operators (rankSelect passes, connected components) do their work
    // in jobs the output frame's plan never shows, so the job count is
    // the pass-structure evidence for them
    val jobCount = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
      })

    def exec(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
      ()
    }

    names.foreach { n =>
      try {
        exec(n) // warmup: codegen/classload/fixture builds land here
        planDir.headOption.foreach { p =>
          val out = new java.io.File(p.stripPrefix("plans:"))
          out.mkdirs()
          val df = SparkEntry.queries(n)(spark, sfDir)
          // execute THIS df's own QueryExecution so AQE finalizes the
          // adaptive plan (isFinalPlan=true, ReusedExchange/AQEShuffleRead
          // visible), then capture the formatted string
          df.queryExecution.toRdd.foreachPartition(_ => ())
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            new java.io.File(out, s"$n.txt").toPath,
            txt.getBytes("UTF-8"))
        }
        val j0 = jobCount.get()
        val ts = (1 to reps).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          exec(n)
          (System.nanoTime() - t0) / 1e9
        }
        // listener delivery is async; settle before reading the count
        Thread.sleep(300)
        val jobsPerExec = (jobCount.get() - j0).toDouble / reps
        println(f"[opt] $n%-32s min=${ts.min}%.3f p50=${p50(ts)}%.3f " +
          f"max=${ts.max}%.3f jobs=$jobsPerExec%.1f " +
          f"reps=${ts.map(x => f"$x%.3f").mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[opt] $n FAILED: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
