package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles at scale via a value histogram.
  *
  * The reference's exact percentile collects EVERY value of a group
  * into one buffer (`PercentileAggregationFunction.java`'s
  * DoubleArrayList), and Spark's `percentile` aggregate is the same
  * shape with spilling (per-group value→count maps merged on the
  * reducer). Both funnel a group's whole distribution through a
  * single reducer task — with a handful of groups (the common OLAP
  * case: percentile per status flag) that is a handful of tasks
  * merging every partial map, no matter how many executors exist.
  *
  * This operator re-expresses the same EXACT semantics as a
  * distributed histogram:
  *
  *   1. `groupBy(keys :+ value).count()` — map-side combine shrinks
  *      each partition to its distinct (key, value) pairs; the one
  *      real shuffle carries only the global distinct pairs.
  *   2. A window over each key ordered by value turns counts into
  *      cumulative ranks (and the unbounded sum gives the group
  *      total in the same pass — no second scan or join).
  *   3. The value at 0-indexed position p is the first value whose
  *      cumulative count reaches p+1, so each requested fraction f
  *      reduces to two conditional `min`s (positions floor(h) and
  *      ceil(h) for h = (n-1)·f) and the standard linear
  *      interpolation — the identical formula Spark's `percentile`
  *      and DuckDB's `quantile_cont` evaluate.
  *
  * Parallelism is bounded by distinct (key, value) pairs instead of
  * group count, and nothing ever holds a full group in memory: at
  * 100 TB a 3-group percentile is thousands of balanced tasks, not 3
  * unbounded buffers. (For truly continuous values with ~no repeats
  * the histogram degenerates to row count — the mergeable quantile
  * sketch, `functions.QuantileSketchAgg`, is the approximate answer
  * there; this is the exact one.)
  */
object Percentiles {

  /** Exact interpolated percentiles of `valueCol` per `keyCols`
    * group, one output column per (fraction, name) — semantics
    * identical to `percentile(valueCol, array(fractions…))`:
    * nulls ignored, linear interpolation between closest ranks,
    * DoubleType results. Groups whose every value is null (or empty
    * key combinations) simply do not appear, matching groupBy. */
  def exact(df: DataFrame, keyCols: Seq[String], valueCol: String,
      fractions: Seq[(Double, String)],
      countColumn: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "at least one grouping column required")
    require(fractions.nonEmpty, "at least one fraction required")
    fractions.foreach { case (f, _) =>
      require(f >= 0.0 && f <= 1.0, s"fraction must be in [0, 1], got $f")
    }
    val keys = keyCols.map(col)
    val v = col(valueCol).cast("double")

    // 1. distinct (key, value) histogram — the only full-data shuffle,
    //    map-side combined
    val hist = df
      .filter(v.isNotNull)
      .groupBy(keys :+ v.as("_v"): _*)
      .agg(count(lit(1)).as("_c"))

    // 2. cumulative and total counts in one window pass per key
    val byKey = Window.partitionBy(keys: _*)
    val ranked = hist
      .withColumn("_cum", sum(col("_c")).over(byKey.orderBy(col("_v"))))
      .withColumn("_n", sum(col("_c")).over(byKey))

    // 3. per fraction: values at positions floor(h) and ceil(h),
    //    h = (n-1)·f, via conditional min over the ranked histogram.
    //    `_n` is constant within a group: raw inside the conditional
    //    mins (evaluated per histogram row), `max`-wrapped where the
    //    interpolation needs it at the aggregated level.
    val aggs = fractions.map { case (f, name) =>
      val hRow = (col("_n") - 1) * f
      val vLo = min(when(col("_cum") >= floor(hRow) + 1, col("_v")))
      val vHi = min(when(col("_cum") >= ceil(hRow) + 1, col("_v")))
      val hAgg = (max(col("_n")) - 1) * f
      (vLo + (hAgg - floor(hAgg)) * (vHi - vLo)).as(name)
    } ++ countColumn.map(n => max(col("_n")).as(n)) // non-null row count, free
    ranked.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }
}
