package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic content-addressed sampling: partition-invariance (the
  * property df.sample lacks), exact train/test partitioning, and
  * stratified fractions. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 2000L).map(i => (i, s"g${i % 4}")).toDF("id", "g")

  test("hashSample is invariant to partitioning and repeated runs") {
    val a = Sampling.hashSample(rows, "id", 0.2).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows.repartition(13), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(a === b, "sample changed under repartition")
    assert(a.nonEmpty && a.size < 2000)
    // binomial(2000, 0.2): mean 400, sd ~17.9 — 5 sigma
    assert(math.abs(a.size - 400) <= 90, s"size ${a.size}")
  }

  test("trainTestSplit partitions exactly, deterministically") {
    val (train, test) = Sampling.trainTestSplit(rows, "id", 0.25)
    val tr = train.select("id").as[Long].collect().toSet
    val te = test.select("id").as[Long].collect().toSet
    assert(tr.intersect(te).isEmpty, "split sides overlap")
    assert(tr.size + te.size === 2000, "split lost rows")
    val (train2, _) = Sampling.trainTestSplit(rows.repartition(7), "id", 0.25)
    assert(train2.select("id").as[Long].collect().toSet === tr)
  }

  test("stratified sampling applies per-stratum fractions") {
    val out = Sampling.stratifiedHashSample(rows, "id", "g",
      Map("g0" -> 1.0, "g1" -> 0.0), defaultFraction = 0.5)
    val byG = out.groupBy($"g").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(byG("g0") === 500, s"g0 kept ${byG.get("g0")}")
    assert(!byG.contains("g1"), "g1 should be fully dropped")
    // default 0.5 on g2/g3 (500 each): binomial sd ~11.2, 5 sigma
    for (g <- Seq("g2", "g3"))
      assert(math.abs(byG(g) - 250) <= 56, s"$g kept ${byG(g)}")
  }

  test("same key always samples together (grouped-leakage safety)") {
    val dup = rows.union(rows) // every key twice
    val sampled = Sampling.hashSample(dup, "id", 0.3)
      .groupBy($"id").agg(count(lit(1)).as("c"))
    // a key is either fully in (count 2) or fully out — never split
    assert(sampled.filter($"c" =!= 2).count() === 0)
  }
}
