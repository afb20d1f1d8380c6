package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic OnTime-flavored benchmark table at arbitrary scale —
  * the BASELINE B2/B3 "SF100 = 10M generated rows" dataset.
  *
  * The corpus fixture generator ([[graft.pql.OnTimeCorpus.synthesize]])
  * builds driver-side rows for the 8K-row correctness fixture; this one
  * is the SCALE path: pure Column expressions over `spark.range`, so
  * generation is distributed, codegen'd, and reproducible bit-for-bit
  * at any row count (seeded xxhash64 per column — task retries and
  * re-runs produce identical data; no RNG state anywhere).
  *
  * Distribution choices mirror the benchmark's needs:
  *  - `Origin` is SKEWED (~10% of rows on 3 hot airports) so group-bys
  *    exercise uneven partitions, as real flight data would;
  *  - `ArrDelay` correlates with `DepDelay` plus a heavy right tail
  *    (~5% of flights very late) so range predicates are selective;
  *  - `Cancelled` ≈ 2% makes `Cancelled = 0` nearly-unselective, the
  *    worst case for filter pushdown gains.
  */
object ScaleTable {

  /** Column universe sizes (airports/states/carriers). */
  val NumAirports = 100
  val NumStates = 40
  val NumCarriers = 15

  private def codes(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => f"$prefix$i%02d")

  /** Airport code for index column `i` (codes "A00".."A99"). */
  private def pick(prefix: String, n: Int, idx: org.apache.spark.sql.Column) =
    element_at(array(codes(prefix, n).map(lit): _*), (idx + 1).cast("int"))

  /** The generated frame (not yet written). */
  def frame(spark: SparkSession, rows: Long, seed: Long = 42L): DataFrame = {
    val id = col("id")
    def h(k: Int) = xxhash64(id, lit(seed), lit(k))
    def u(k: Int, m: Int) = pmod(h(k), lit(m)).cast("int")
    // skew: ~10% of rows land on 3 hot origin airports
    val originIdx = when(u(1, 100) < 10, u(2, 3)).otherwise(u(3, NumAirports))
    val depDelay = u(4, 70) - lit(10) +
      when(u(5, 100) < 5, u(6, 300)).otherwise(lit(0))
    spark.range(0, rows, 1, 64).select(
      (lit(16000) + u(7, 365)).as("DaysSinceEpoch"),
      (lit(2014)).as("Year"),
      pick("C", NumCarriers, u(8, NumCarriers)).as("Carrier"),
      (lit(1) + u(9, 8000)).as("FlightNum"),
      pick("A", NumAirports, originIdx).as("Origin"),
      pick("A", NumAirports, u(10, NumAirports)).as("Dest"),
      pick("S", NumStates, pmod(originIdx, lit(NumStates)).cast("int")).as("OriginState"),
      pick("S", NumStates, u(11, NumStates)).as("DestState"),
      depDelay.as("DepDelay"),
      // arrival correlates with departure, ±15 spread
      (depDelay + u(12, 31) - lit(15)).as("ArrDelay"),
      (lit(100) + u(13, 2500)).as("Distance"),
      when(u(14, 50) === 0, 1).otherwise(0).as("Cancelled"),
      u(15, 2400).as("ArrTime"),
      (lit(20) + u(16, 400)).as("AirTime"))
  }

  /** Generate-if-absent: writes `dir/ontime.parquet` once and returns
    * the dataset path; later calls (and the driver's Bench run) reuse
    * the cached files. A `_DONE` marker guards against a half-written
    * dataset surviving an interrupted generation. */
  def ensure(spark: SparkSession, dir: String, rows: Long, seed: Long = 42L): String = {
    val path = s"$dir/ontime.parquet"
    val done = new java.io.File(s"$dir/_DONE")
    if (!done.exists()) {
      frame(spark, rows, seed).write.mode("overwrite").parquet(path)
      done.getParentFile.mkdirs()
      java.nio.file.Files.write(done.toPath, java.util.Arrays.asList(rows.toString))
    }
    path
  }
}
