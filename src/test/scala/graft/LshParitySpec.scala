package graft
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class LshParitySpec extends SparkSpec {
  import spark.implicits._
  test("kernel bucket matches declarative formula") {
    def planeComponent(plane: Int, dim: org.apache.spark.sql.Column) =
      (pmod(xxhash64(lit(plane), dim), lit(2000001)).cast("double") - lit(1000000.0)) /
        lit(1000000.0)
    def oldBucket(vec: org.apache.spark.sql.Column, numPlanes: Int) = {
      val bits = (0 until numPlanes).map { p =>
        val d = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast("double") * planeComponent(p, i)),
          lit(0.0), (acc, v) => acc + v)
        when(d >= 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce((a, b) => a.bitwiseOR(b))
    }
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings").limit(50)
    val cmp = emb.select(
      oldBucket(col("embedding"), 4).as("old"),
      GraftFunctions.lshBucket(col("embedding"), 4).as("new")
    ).collect()
    val diffs = cmp.count(r => r.getLong(0) != r.getLong(1))
    assert(diffs == 0, s"$diffs/${cmp.length} differ; sample=${cmp.take(5).mkString}")
  }
}
