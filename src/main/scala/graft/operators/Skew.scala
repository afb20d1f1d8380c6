package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the "salting" half of the
  * 100 TB playbook (AQE's OptimizeSkewedJoin is the other half: it
  * splits oversized partitions at runtime, but only AFTER the shuffle
  * files are written; pre-salting bounds each partition BEFORE the
  * shuffle, which is what matters when a single hot key exceeds one
  * executor's spill capacity).
  *
  * The reference controls the equivalent problem at layout time —
  * partition-aware segment assignment spreads one partition-function
  * value across replicas (`pinot-core/.../data/partition/
  * PartitionFunctionFactory.java`) — but a query-time join engine
  * needs the query-time fix.
  */
object Skew {

  /** Inner equi-join where `left[leftKey]` is (or may be) skewed and
    * `right` is too large to broadcast: each right row is replicated
    * once per salt value, each left row is scattered to ONE salt by a
    * deterministic row hash, and the join runs on (key, salt) — so a
    * hot key's rows spread over `salt` shuffle partitions instead of
    * flooding one. Cost: the right side shuffles `salt`× its size;
    * pick `salt` ≈ hot-key volume / healthy-partition size. Exact
    * inner-join semantics: every (left row, matching right row) pair
    * appears exactly once because the left row lands on exactly one
    * salt and the right row exists at every salt. */
  def saltedJoin(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, salt: Int,
      scatterCols: Seq[String] = Nil): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val salts = array((0 until salt).map(lit): _*)
    // deterministic scatter (task retries land on the same salt):
    // hash left-row columns, not just the key — hashing the key alone
    // would send the hot key to ONE salt and change nothing. By
    // default the WHOLE row is hashed (always safe), but that struct(*)
    // reference defeats column pruning: the scan must read every
    // column even when the query aggregates two (q_salted_join's
    // ReadSchema carried all 11 lineitem columns, r12). Callers that
    // know a compact column set that varies WITHIN a key — a primary
    // key, a line number — pass it as `scatterCols` so the scan prunes
    // to the columns the query actually uses. The join RESULT is
    // identical for any choice: the scatter only decides which salt
    // partition a (left row, right copy) pair meets in.
    val sc = if (scatterCols.nonEmpty) scatterCols else left.columns.toSeq
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(sc.map(left(_)): _*)), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("_salt", explode(salts))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
