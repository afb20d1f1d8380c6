package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: exact inner-join semantics under a hot key") {
    // 20k rows of one hot key + a spread tail vs a 100-key dim
    val left = spark.range(25000).select(
      when($"id" < 20000, lit(7L)).otherwise(pmod($"id", lit(100))).as("k"),
      $"id".as("payload"))
    val right = spark.range(100).select($"id".as("rk"), ($"id" * 10).as("rv"))

    val direct = left.join(right, $"k" === $"rk")
      .agg(count(lit(1)), sum($"payload" + $"rv")).collect().head
    val salted = Skew.saltedJoin(left, "k", right, "rk", salt = 8)
      .agg(count(lit(1)), sum($"payload" + $"rv")).collect().head
    assert(salted === direct)

    // the join must actually run on (key, salt): the hot key's rows
    // spread across `salt` distinct shuffle keys instead of one
    val spread = Skew.saltedJoin(left, "k", right, "rk", salt = 8)
    val plan = spread.queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), s"salt column not in the join:\n${plan.take(800)}")
    val saltsUsed = left.withColumn("_salt",
        pmod(xxhash64(struct(left.columns.map(left(_)): _*)), lit(8)).cast("int"))
      .filter($"k" === 7).select("_salt").distinct().count()
    assert(saltsUsed === 8L, "hot-key rows must scatter across every salt")

    // salt = 1 degenerates to the plain join
    assert(Skew.saltedJoin(left, "k", right, "rk", salt = 1).count() ===
      left.join(right, $"k" === $"rk").count())
  }

  test("saltedJoin scatterCols: identical result, hot key still spreads, scan prunes") {
    val left = spark.range(25000).select(
      when($"id" < 20000, lit(7L)).otherwise(pmod($"id", lit(100))).as("k"),
      $"id".as("payload"), ($"id" % 3).as("unused"))
    val right = spark.range(100).select($"id".as("rk"), ($"id" * 10).as("rv"))

    // result rows are scatter-invariant: payload varies within the hot
    // key, so scattering by it must give exactly the whole-row result
    val wholeRow = Skew.saltedJoin(left, "k", right, "rk", salt = 8)
      .agg(count(lit(1)), sum($"payload" + $"rv")).collect().head
    val byCols = Skew.saltedJoin(left, "k", right, "rk", salt = 8,
        scatterCols = Seq("k", "payload"))
      .agg(count(lit(1)), sum($"payload" + $"rv")).collect().head
    assert(byCols === wholeRow)

    // the hot key's rows still scatter across every salt
    val saltsUsed = left.withColumn("_salt",
        pmod(xxhash64(struct($"k", $"payload")), lit(8)).cast("int"))
      .filter($"k" === 7).select("_salt").distinct().count()
    assert(saltsUsed === 8L, "hot-key rows must scatter across every salt")

    // the point of scatterCols: a column outside (scatter ∪ query)
    // no longer blocks pruning — it must vanish from the join subtree
    val pruned = Skew.saltedJoin(left, "k", right, "rk", salt = 8,
        scatterCols = Seq("k", "payload"))
      .agg(sum($"payload" + $"rv"))
    val plan = pruned.queryExecution.optimizedPlan.toString
    assert(!plan.contains("unused"),
      s"scatterCols must let the unused column prune away:\n$plan")
  }
}
