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
  *   2. Counts become cumulative ranks via a two-level prefix sum:
  *      per-(key, value-bucket) offsets, then a running sum inside
  *      each bucket — so the rank pass is parallel across buckets and
  *      no task ever holds more than one bucket's distinct values,
  *      even for a global percentile over a near-unique column.
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

  /** One requested percentile output: fraction in [0, 1], output
    * column name, and the rank convention —
    *  - `nearestRank = false`: linear interpolation between closest
    *    ranks, the `percentile()` / `quantile_cont` formula
    *    (DoubleType output);
    *  - `nearestRank = true`: the ACTUAL data value at 1-indexed rank
    *    max(ceil(f·n), 1) — the classic nearest-rank definition, an
    *    exact answer for sketch-contract aggregations
    *    (PERCENTILEEST's QuantileDigest returns a real long value at
    *    ≤5% rank error; rank error 0 trivially satisfies it). Output
    *    keeps the histogram's DoubleType; callers cast. */
  final case class Spec(fraction: Double, name: String, nearestRank: Boolean)

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
    histogramAggs(df, keyCols, valueCol,
      fractions.map { case (f, n) => Spec(f, n, nearestRank = false) },
      countColumn, keepNullGroups = false)
  }

  /** The shared histogram plan behind [[exact]] and the PQL percentile
    * routing: one distinct-(key, value) shuffle, one window pass, then
    * every requested [[Spec]] reduces over the same ranked histogram.
    *
    * `keyCols` may be empty (global aggregation → always exactly one
    * output row, aggregate-without-grouping semantics). With
    * `keepNullGroups` a group whose every value is null still appears,
    * carrying null percentiles — the behavior of `percentile()` inside
    * a wider aggregation, needed when this frame is equi-joined back
    * to other aggregation frames on the group keys. */
  def histogramAggs(df: DataFrame, keyCols: Seq[String], valueCol: String,
      specs: Seq[Spec], countColumn: Option[String] = None,
      keepNullGroups: Boolean = false): DataFrame = {
    require(specs.nonEmpty, "at least one percentile spec required")
    specs.foreach { s =>
      require(s.fraction >= 0.0 && s.fraction <= 1.0,
        s"fraction must be in [0, 1], got ${s.fraction}")
    }
    val keys = keyCols.map(col)
    val v = col(valueCol).cast("double")

    // 1. distinct (key, value) histogram — the only full-data shuffle,
    //    map-side combined. With keepNullGroups the null value stays
    //    as a histogram row carrying count 0, so its group survives
    //    while every rank computation ignores it.
    val pre = if (keepNullGroups) df else df.filter(v.isNotNull)
    val hist = pre
      .groupBy(keys :+ v.as("_v"): _*)
      .agg(count(when(col(valueCol).isNotNull, 1)).as("_c"))

    // 2. cumulative and total counts, TWO-LEVEL: per-(key, bucket)
    //    offsets first, then a running sum within each bucket. A
    //    single window per key would funnel a group's ENTIRE histogram
    //    through one task — for a global percentile over a
    //    near-unique int column that is one task sorting ~n rows, a
    //    real 100 TB cliff. Bucketing by floor(_v / 65536) caps every
    //    window task at one bucket's distinct values (≤65536 rows for
    //    any integral column; floor is monotonic, so bucket order IS
    //    value order) and the bucket-offset window itself handles at
    //    most 65536 bucket rows per group. Null histogram rows (the
    //    keepNullGroups count-0 carriers) land in the null bucket,
    //    which sorts first with _bc = 0 — cum stays 0 there and they
    //    never satisfy a >= 1 rank threshold.
    val byKey = Window.partitionBy(keys: _*)
    // the bucket must preserve _v's TOTAL order including NaN: Spark
    // sorts NaN greater than every double, but floor(NaN).cast(long)
    // is 0 — which would rank NaN rows mid-distribution. A NaN bucket
    // (NaN groups with itself and sorts last in Spark) keeps bucket
    // order == value order; ±Inf is handled by the long cast's
    // saturation to Long.Min/MaxValue at the bucket ends.
    val histB = hist.withColumn("_b",
      when(isnan(col("_v")), lit(Double.NaN))
        .otherwise(floor(col("_v") / 65536.0d).cast("double")))
    val bCum = histB
      .groupBy(keys :+ col("_b").as("_jb"): _*)
      .agg(sum(col("_c")).as("_bc"))
      .withColumn("_boff",
        sum(col("_bc")).over(byKey.orderBy(col("_jb").asc_nulls_first)) - col("_bc"))
      .withColumn("_n", sum(col("_bc")).over(byKey))
      .drop("_bc")
    // null-safe equi-join back on (keys, bucket): null group keys and
    // the null bucket are real join keys
    val bCumR = keyCols.foldLeft(bCum)((d, k) => d.withColumnRenamed(k, s"_bk_$k"))
    val joinCond = (keyCols.map(k => histB(k) <=> bCumR(s"_bk_$k")) :+
      (histB("_b") <=> bCumR("_jb"))).reduce(_ && _)
    val ranked = histB.join(bCumR, joinCond)
      .drop("_jb").drop(keyCols.map(k => s"_bk_$k"): _*)
      .withColumn("_cum", col("_boff") +
        sum(col("_c")).over(Window.partitionBy(keys :+ col("_b"): _*).orderBy(col("_v"))))

    // 3. per spec: conditional mins over the ranked histogram.
    //    `_n` is constant within a group: raw inside the conditional
    //    mins (evaluated per histogram row), `max`-wrapped where the
    //    interpolation needs it at the aggregated level.
    val aggs = specs.map {
      case Spec(f, name, false) =>
        val hRow = (col("_n") - 1) * f
        val vLo = min(when(col("_cum") >= floor(hRow) + 1, col("_v")))
        val vHi = min(when(col("_cum") >= ceil(hRow) + 1, col("_v")))
        val hAgg = (max(col("_n")) - 1) * f
        (vLo + (hAgg - floor(hAgg)) * (vHi - vLo)).as(name)
      case Spec(f, name, true) =>
        min(when(col("_cum") >= greatest(ceil(col("_n") * f), lit(1)), col("_v")))
          .as(name)
    } ++ countColumn.map(n => max(col("_n")).as(n)) // non-null row count, free
    if (keyCols.isEmpty) ranked.agg(aggs.head, aggs.tail: _*)
    else ranked.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }
}
