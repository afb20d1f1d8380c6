package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding
  * columns (`ArrayType(FloatType)`).
  *
  * Scale design:
  *  - `bruteForceKnn` (the exactness baseline) broadcasts the query
  *    vector into the codegen'd expression and does ONE scan + a
  *    size-k TakeOrdered — no shuffle of the corpus, linear in corpus
  *    size, trivially parallel at 100 TB;
  *  - `knnJoin` broadcasts the (small) query set and keeps the corpus
  *    un-shuffled; top-k per query via partial-aggregated window;
  *  - `lshBucketedKnn` is the scale path: random-hyperplane LSH with
  *    deterministic seeded planes → candidates collide on a bucket id,
  *    so the expensive exact scoring runs on |bucket| not |corpus|.
  *    Probing p>1 nearby buckets trades recall for cost.
  * All math is done in double precision regardless of storage type.
  */
object Similarity {

  /** dot(a,b) computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v))

  /** Exact top-k by cosine against one literal query vector. The
    * vector is inlined as an array literal → broadcast by codegen. */
  def bruteForceKnn(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    corpus
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Top-k join: for every row of `queries`, the k nearest corpus
    * rows. `queries` is broadcast (it must be the small side); corpus
    * never shuffles — the only shuffle is the final per-query top-k,
    * whose input is already cut to k rows per corpus partition. */
  def knnJoin(queries: DataFrame, qIdCol: String, corpus: DataFrame,
      cIdCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(cIdCol).as("corpus_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), c("corpus_id") =!= q("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "corpus_id", "sim", "rk")
  }

  /** Deterministic pseudo-random hyperplane component: maps
    * (plane, dim) → [-1, 1] via xxhash64 — same plane set on every
    * executor and every run with zero driver state to ship. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001)).cast("double") - lit(1000000.0)) /
      lit(1000000.0)

  /** LSH bucket id: sign bits of the vector's dot products with
    * `numPlanes` seeded hyperplanes, packed into a long. */
  def lshBucket(vec: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN: exact cosine within LSH buckets only. Queries and corpus
    * both bucketed with the same planes; join on the bucket id —
    * the shuffle moves only bucket-collided pairs. Recall grows with
    * fewer planes (bigger buckets); cost shrinks with more planes. */
  def lshBucketedKnn(queries: DataFrame, qIdCol: String, corpus: DataFrame,
      cIdCol: String, vecCol: String, k: Int, numPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), numPlanes).as("bucket"))
    val c = corpus.select(col(cIdCol).as("corpus_id"), col(vecCol).as("c_vec"),
      lshBucket(col(vecCol), numPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "corpus_id", "sim", "rk")
  }
}
