package graft

import org.apache.spark.sql.functions._
import graft.queries.ScaleTable
import graft.pql.Pql

/** The scale-bench generator must be deterministic (bit-identical
  * re-runs — it is the benchmark's dataset spec) and the workload's
  * predicates must actually select rows at any scale. */
class ScaleTableSpec extends SparkSpec {
  import spark.implicits._

  test("generation is deterministic and distribution matches the spec") {
    val a = ScaleTable.frame(spark, 20000)
    val b = ScaleTable.frame(spark, 20000)
    def fp(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).as[Long].head()
    assert(fp(a) === fp(b), "same seed, same rows => identical bytes")
    // skew: the 3 hot origins hold roughly 10% of rows (3% uniform share)
    val hot = a.filter($"Origin".isin("A00", "A01", "A02")).count().toDouble / 20000
    assert(hot > 0.06 && hot < 0.18, s"hot-origin share $hot")
    // cancellation rate ~2%
    val canc = a.filter($"Cancelled" === 1).count().toDouble / 20000
    assert(canc > 0.01 && canc < 0.04, s"cancel rate $canc")
    // delay tail exists but is a minority
    val late = a.filter($"ArrDelay" > 300).count().toDouble / 20000
    assert(late > 0.001 && late < 0.05, s"late tail $late")
    // every workload literal actually selects rows
    assert(a.filter($"Carrier" === "C03").count() > 0)
    assert(a.filter($"OriginState" === "S05").count() > 0)
    assert(a.filter($"Dest" === "A07").count() > 0)
  }

  test("every BenchScale PQL statement parses and executes over the generated table") {
    val table = ScaleTable.frame(spark, 5000).cache()
    BenchScale.workload.foreach { case (name, _, pql, _) =>
      val df = Pql.toDataFrame(Pql.parse(pql), _ => table)
      assert(df.columns.nonEmpty, name)
      df.collect() // must run, row counts vary by class
    }
  }
}
