package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GraftAggs, GraftFunctions, HashOps}

/** Approximate-nearest-neighbor / similarity search over embedding
  * columns (`ArrayType(FloatType)`).
  *
  * Scale design:
  *  - `bruteForceKnn` (the exactness baseline) broadcasts the query
  *    vector into the codegen'd expression and does ONE scan + a
  *    size-k TakeOrdered — no shuffle of the corpus, linear in corpus
  *    size, trivially parallel at 100 TB;
  *  - `knnJoin` broadcasts the (small) query set and keeps the corpus
  *    un-shuffled; per-query top-k via a bounded-heap
  *    `TypedImperativeAggregate` ([[graft.functions.aggs.TopKByScore]])
  *    that partially aggregates map-side, so the shuffle carries ≤ k
  *    entries per query per partition — NOT every scored candidate
  *    (the window-function formulation shuffled all of them);
  *  - `lshBucketedKnn` is the scale path: OR-amplified multi-table
  *    random-hyperplane LSH — candidates collide on (table, bucket),
  *    so exact scoring runs on collisions only, and recall amplifies
  *    as 1-(1-p^planes)^tables instead of the single-table p^planes
  *    (which collapses geometrically for moderate similarities).
  *
  * All vector math runs through the custom codegen'd kernels in
  * [[graft.functions.exprs]] (single JVM loop per row, double
  * precision) — the declarative higher-order-function formulation is
  * interpreted per-element and was measured 5-10× slower.
  *
  * API note (changed in round 2, kept): `knnJoin`/`lshBucketedKnn`
  * default to `excludeSelf = false`; callers whose query set is a
  * subset of the corpus and who want the old implicit self-exclusion
  * must now opt in explicitly — a silent self-pair at sim=1.0 would
  * otherwise consume one of the k slots.
  */
object Similarity {

  /** dot(a,b) computed in double. */
  def dot(a: Column, b: Column): Column = GraftFunctions.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = GraftFunctions.cosine(a, b)

  /** Euclidean distance via the single-pass sum((a_i-b_i)^2) kernel —
    * numerically stable for near-identical vectors, where the
    * three-dot-product identity sqrt(aa-2ab+bb) cancels
    * catastrophically (the near-dup regime this engine targets). */
  def l2Distance(a: Column, b: Column): Column = GraftFunctions.l2Distance(a, b)

  /** Cosine over packed float32-LE binary vectors (the fixed-width
    * raw-forward-index layout, [[graft.functions.exprs.CosineSimPacked]]
    * — no per-element ArrayData accessor in the inner loop). Same
    * float→double widening as the array kernel, so estimates are
    * bit-identical to [[cosine]] over the equivalent float arrays. */
  def cosinePacked(a: Column, b: Column): Column = GraftFunctions.cosinePacked(a, b)

  /** array<float|double> → packed float32-LE binary segment column. */
  def packVector(v: Column): Column = GraftFunctions.packFloats(v)

  /** True when `vecCol` holds packed binary vectors — the one switch
    * that routes [[bruteForceKnn]]/[[knnJoin]] onto the packed kernel. */
  private def isPacked(df: DataFrame, vecCol: String): Boolean =
    df.schema(vecCol).dataType == org.apache.spark.sql.types.BinaryType

  /** Exact top-k by cosine against one literal query vector. The
    * vector is inlined as an array literal → broadcast by codegen.
    * A BinaryType `vecCol` (packed float32 layout) scores with the
    * packed kernel against a packed query literal — same values,
    * fixed-width byte[] inner loop. */
  def bruteForceKnn(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val sim =
      if (isPacked(corpus, vecCol))
        cosinePacked(col(vecCol), lit(HashOps.packFloatSeq(query)))
      else cosine(col(vecCol), array(query.map(v => lit(v.toDouble)): _*))
    corpus
      .select(col(idCol), round(sim, 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Shared final stage: per-query top-k of scored (query_id,
    * corpus_id, sim) rows via the bounded-heap aggregate, exploded
    * back to ranked rows (rk = 1-based, ties broken by corpus_id) —
    * identical output contract to a `row_number` window over
    * (sim desc, corpus_id), at a fraction of the shuffle. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(GraftAggs.topKByScore(col("sim"), col("corpus_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")))
      .select(col("query_id"), col("col.id").as("corpus_id"),
        col("col.score").as("sim"), (col("pos") + 1).as("rk"))

  /** Top-k join: for every row of `queries`, the k nearest corpus
    * rows. `queries` is broadcast (it must be the small side); corpus
    * never shuffles — the only shuffle is the partially-aggregated
    * per-query top-k (≤ k rows per query per partition).
    *
    * `excludeSelf` (opt-in) drops corpus rows whose id equals the
    * query id; valid ONLY when `queries` is a subset of `corpus`
    * sharing the same non-null id space — with unrelated tables a
    * coincidental id overlap (or a null id, which nulls the predicate)
    * would silently drop pairs. */
  def knnJoin(queries: DataFrame, qIdCol: String, corpus: DataFrame,
      cIdCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(cIdCol).as("corpus_id"), col(vecCol).as("c_vec"))
    val joined =
      if (excludeSelf) c.join(broadcast(q), c("corpus_id") =!= q("query_id"))
      else c.crossJoin(broadcast(q))
    // packed corpus ⇒ packed kernel; queries must carry the same
    // layout (both sides come from `vecCol`, so they do by contract)
    val simExpr =
      if (isPacked(corpus, vecCol)) cosinePacked(col("q_vec"), col("c_vec"))
      else cosine(col("q_vec"), col("c_vec"))
    val scored = joined.select(col("query_id"), col("corpus_id"),
      round(simExpr, 6).as("sim"))
    topKPerQuery(scored, k)
  }

  /** LSH bucket id: sign bits of the vector's dot products with
    * `numPlanes` (1..63) seeded hyperplanes, packed into a long.
    * Deterministic — same planes on every executor, zero driver state. */
  def lshBucket(vec: Column, numPlanes: Int): Column = {
    require(numPlanes > 0 && numPlanes <= 63,
      s"numPlanes must be in [1, 63], got $numPlanes (a 64-bit bucket id " +
        "cannot hold more sign bits; larger values would alias buckets)")
    GraftFunctions.lshBucket(vec, numPlanes)
  }

  /** IVF coarse quantizer: k centroids, trained by a deterministic
    * k-means (seeded init + fixed Lloyd rounds). Centroid state is
    * k×dim doubles on the driver — model-parameter scale, shipped to
    * executors inside the assignment expression like any literal. */
  final case class IvfModel(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Train the IVF codebook. Determinism: init = the `k` training
    * vectors with the smallest seeded xxhash64(id) (order-independent
    * of partitioning), then exactly `iters` Lloyd rounds with per-dim
    * means rounded to 6 dp so floating summation order cannot perturb
    * the codebook across retries. Each round = one scan + one shuffle
    * of (cell, dim) partial sums.
    *
    * Scale: `sampleFraction < 1` trains on a seeded-hash row filter —
    * deterministic (same rows on any partitioning / task retry), and
    * k-means codebooks converge on a sample (k centroids need k×dim
    * numbers of signal, not the full corpus). The Lloyd rounds' dim×
    * posexplode expansion then touches only the cached sample, not
    * `iters` full-corpus scans — at 100 TB train on ≤0.1% and assign
    * with [[ivfAssign]] once. */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3, sampleFraction: Double = 1.0,
      seed: Long = 42L): IvfModel = {
    require(k > 0, s"k must be positive, got $k")
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val vecD = col(vecCol).cast("array<double>")
    val training0 = corpus.select(col(idCol).as("_id"), vecD.as("_v"))
    val training = (if (sampleFraction < 1.0)
      training0.filter(
        pmod(xxhash64(col("_id"), lit(seed)), lit(1000000L))
          < (sampleFraction * 1000000L).toLong)
    else training0).cache()
    try {
      var cents: Array[Array[Double]] = training
        .select(col("_v"), xxhash64(col("_id"), lit(seed)).as("_h"))
        .orderBy(col("_h"), col("_id"))
        .limit(k)
        .collect().map(_.getSeq[Double](0).toArray)
      require(cents.nonEmpty, "empty training corpus (sampleFraction too small?)")
      for (_ <- 1 to iters) {
        val means = training
          .select(GraftFunctions.nearestCell(col("_v"), cents).as("_cell"),
            posexplode(col("_v")).as(Seq("_dim", "_x")))
          .groupBy(col("_cell"), col("_dim"))
          .agg(round(avg(col("_x")), 6).as("_m"))
          .collect()
        val next = cents.map(_.clone())
        means.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        }
        cents = next // cells that lost all members keep their centroid
      }
      IvfModel(cents)
    } finally { training.unpersist(); () }
  }

  /** Materialize each corpus row's IVF cell — the "store the cell
    * column with the segment" step: write the result once, then every
    * [[ivfKnn]] call passes `cellCol` and skips the per-query
    * re-assignment scan (the reference keeps the forward index of its
    * cluster assignment with the segment for the same reason). */
  def ivfAssign(corpus: DataFrame, vecCol: String, model: IvfModel,
      cellCol: String = "ivf_cell"): DataFrame =
    corpus.withColumn(cellCol,
      GraftFunctions.nearestCell(col(vecCol).cast("array<double>"), model.centroids))

  /** IVF ANN: corpus rows assigned to their nearest cell ONCE (pass
    * `cellCol` for a corpus pre-assigned via [[ivfAssign]] — amortized
    * across queries); each query probes its `nprobe` nearest cells, so
    * exact scoring touches ~nprobe/k of the corpus. The inverted-file
    * analogue of [[lshBucketedKnn]] — better cell balance on clustered
    * data, tunable recall via nprobe. `excludeSelf` as in [[knnJoin]]. */
  def ivfKnn(queries: DataFrame, qIdCol: String, corpus: DataFrame,
      cIdCol: String, vecCol: String, k: Int, model: IvfModel,
      nprobe: Int = 4, excludeSelf: Boolean = false,
      cellCol: Option[String] = None): DataFrame = {
    val vecD = col(vecCol).cast("array<double>")
    val cCell = cellCol.map(col(_).cast("int"))
      .getOrElse(GraftFunctions.nearestCell(vecD, model.centroids))
    val c = corpus.select(col(cIdCol).as("corpus_id"), col(vecCol).as("c_vec"),
      cCell.as("cell"))
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(GraftFunctions.nearestCells(vecD, model.centroids, nprobe)).as("cell"))
    val joined = c.join(broadcast(q), Seq("cell"))
    val filtered =
      if (excludeSelf) joined.filter(col("corpus_id") =!= col("query_id"))
      else joined
    // a (query, corpus) pair appears once: probe cells are distinct
    // and each corpus row lives in exactly one cell — no dedup needed
    val scored = filtered.select(col("query_id"), col("corpus_id"),
      round(cosine(col("q_vec"), col("c_vec")), 6).as("sim"))
    topKPerQuery(scored, k)
  }

  /** ANN: exact cosine within OR-amplified LSH buckets. Queries and
    * corpus are both hashed into `numTables` independent plane sets
    * (deterministic seeds); a corpus row is a candidate for a query if
    * they collide in ANY table. The join key is (table, bucket), the
    * query side is broadcast, and a pair colliding in several tables
    * is scored once (distinct before the top-k).
    *
    * Tuning: recall ≈ 1-(1-p^numPlanes)^numTables for per-plane
    * agreement p = 1-θ/π; candidate cost grows ≤ ×numTables. More
    * planes → smaller buckets (cheaper, lower recall per table); more
    * tables → recall back up. `excludeSelf` semantics as in
    * [[knnJoin]]. */
  def lshBucketedKnn(queries: DataFrame, qIdCol: String, corpus: DataFrame,
      cIdCol: String, vecCol: String, k: Int, numPlanes: Int = 8,
      numTables: Int = 8, excludeSelf: Boolean = false): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("q_vec"),
      posexplode(GraftFunctions.lshBuckets(col(vecCol), numPlanes, numTables))
        .as(Seq("table", "bucket")))
    val c = corpus.select(col(cIdCol).as("corpus_id"), col(vecCol).as("c_vec"),
      posexplode(GraftFunctions.lshBuckets(col(vecCol), numPlanes, numTables))
        .as(Seq("table", "bucket")))
    val joined = c.join(broadcast(q), Seq("table", "bucket"))
    val filtered =
      if (excludeSelf) joined.filter(col("corpus_id") =!= col("query_id"))
      else joined
    val scored = filtered.select(col("query_id"), col("corpus_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("sim"))
      .distinct()
    topKPerQuery(scored, k)
  }
}
