package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-stable only for a fixed partitioning — a
  * repartition, a changed file split, or task retry reshuffles which
  * rows land where and the sample silently changes. These samplers
  * decide membership from ROW CONTENT (a hash of a key column), so
  * the same row makes the same decision everywhere: re-runs, retries,
  * different cluster sizes, even different engines — the md5-based
  * predicate is bit-identical in DuckDB, which is what lets the
  * driver's oracle verify the EXACT sampled row set (`q_hash_sample`).
  *
  * Map-only (a filter; no shuffle, no state), so it composes freely
  * before expensive stages: sample-then-dedup, sample-then-train.
  */
object Sampling {

  /** Uniform-in-[0,1) deterministic hash of a key: the first 8 hex
    * chars of md5 as an integer, scaled. Cross-engine portable
    * (DuckDB: `CAST(CONCAT('0x', SUBSTRING(md5(k), 1, 8)) AS BIGINT)`). */
  def hashUnit(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0))

  /** Keep rows whose key hashes below `fraction` — a deterministic,
    * content-addressed Bernoulli sample. Rows with equal keys sample
    * together (by design: keying on a document id samples documents;
    * keying on a user id samples whole users, the grouped-leakage-safe
    * split a training pipeline actually needs). */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.filter(hashUnit(col(keyCol)) < fraction)
  }

  /** Deterministic train/test split: (train, test) partition of df by
    * the key hash — every row lands in exactly one side, stable across
    * runs and engines. */
  def trainTestSplit(df: DataFrame, keyCol: String,
      testFraction: Double): (DataFrame, DataFrame) = {
    require(testFraction >= 0 && testFraction <= 1,
      s"testFraction must be in [0,1], got $testFraction")
    val u = hashUnit(col(keyCol))
    (df.filter(u >= testFraction), df.filter(u < testFraction))
  }

  /** Per-stratum deterministic sampling: each group keeps its own
    * fraction (default applies to unlisted strata). Still one map-only
    * filter — the stratum column selects the threshold per row. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "all fractions must be in [0,1]")
    val threshold = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(f)).otherwise(acc)
    }
    df.filter(hashUnit(col(keyCol)) < threshold)
  }
}
