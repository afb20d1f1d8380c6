package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b")
    val r = df.select(
      round(Similarity.cosine($"a", $"b"), 9).as("orth"),
      round(Similarity.cosine($"a", $"a"), 9).as("same"),
      round(Similarity.cosine($"a", transform($"a", x => -x)), 9).as("opp"))
      .as[(Double, Double, Double)].head()
    assert(r === ((0.0, 1.0, -1.0)))
  }

  test("bruteForceKnn returns self first, k rows, descending sims") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 7).select($"embedding").head().getSeq[Float](0)
    val res = Similarity.bruteForceKnn(emb, "vec_id", "embedding", q, 5)
      .as[(Long, Double)].collect()
    assert(res.length === 5)
    assert(res.head._1 === 7L && math.abs(res.head._2 - 1.0) < 1e-6)
    assert(res.map(_._2).sliding(2).forall(p => p(0) >= p(1)), "descending")
  }

  test("packed layout: round trip, kernel parity, knnJoin equivalence") {
    import graft.functions.{GraftFunctions, HashOps}
    val emb = Tables.load(spark, sfDir, "embeddings").limit(500)
    // pack → unpack is bit-exact for float inputs
    val rt = emb.select($"embedding",
        GraftFunctions.unpackFloats(GraftFunctions.packFloats($"embedding")).as("u"))
      .filter(not($"embedding" <=> $"u")).count()
    assert(rt === 0L, "pack/unpack round trip must be bit-exact")
    // packed cosine/dot/l2 are bit-identical to the array kernels
    // (same float→double widening, same accumulation order)
    val pairs = emb.select($"vec_id", $"embedding")
      .crossJoin(emb.select($"embedding".as("e2")).limit(3))
    val drift = pairs.select(
        (GraftFunctions.cosine($"embedding", $"e2") <=>
          GraftFunctions.cosinePacked(GraftFunctions.packFloats($"embedding"),
            GraftFunctions.packFloats($"e2"))).as("c"),
        (GraftFunctions.dot($"embedding", $"e2") <=>
          GraftFunctions.dotPacked(GraftFunctions.packFloats($"embedding"),
            GraftFunctions.packFloats($"e2"))).as("d"),
        (GraftFunctions.l2Distance($"embedding", $"e2") <=>
          GraftFunctions.l2DistancePacked(GraftFunctions.packFloats($"embedding"),
            GraftFunctions.packFloats($"e2"))).as("l"))
      .filter(!$"c" || !$"d" || !$"l").count()
    assert(drift === 0L, "packed kernels must match array kernels bit-for-bit")
    // knnJoin over the packed column returns the same ranked rows
    val packed = emb.select($"vec_id",
      GraftFunctions.packFloats($"embedding").as("embedding"))
    val arr = Similarity.knnJoin(emb.filter($"vec_id" < 3), "vec_id",
        emb, "vec_id", "embedding", 4, excludeSelf = true)
      .as[(Long, Long, Double, Long)].collect().toSet
    val pk = Similarity.knnJoin(packed.filter($"vec_id" < 3), "vec_id",
        packed, "vec_id", "embedding", 4, excludeSelf = true)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(pk === arr)
    // zero vectors → 0 similarity (cosineAny contract); width mismatch is loud
    assert(HashOps.cosinePacked(new Array[Byte](8), new Array[Byte](8)) === 0.0)
    intercept[IllegalArgumentException] {
      HashOps.cosinePacked(new Array[Byte](8), new Array[Byte](12))
    }
    intercept[IllegalArgumentException] {
      HashOps.cosinePacked(new Array[Byte](7), new Array[Byte](7))
    }
  }

  test("ivfKnn: deterministic training, reasonable recall, bounded probe cost") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val m1 = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 16, iters = 2)
    val m2 = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 16, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq === m2.centroids.map(_.toSeq).toSeq,
      "training must be deterministic")
    val queries = emb.filter($"vec_id" < 10)
    val k = 5
    val exact = Similarity.knnJoin(queries, "vec_id", emb, "vec_id", "embedding", k,
        excludeSelf = true)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfKnn(queries, "vec_id", emb, "vec_id", "embedding", k,
        m1, nprobe = 6, excludeSelf = true)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall")
    // probe cost bound: candidates scanned ≤ corpus (each corpus row
    // is in exactly one cell; ≤ nprobe cells probed per query)
    assert(approx.size <= queries.count() * k)
  }

  test("ivfTrain on a seeded sample is deterministic; ivfAssign matches the inline path") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val s1 = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8, iters = 2,
      sampleFraction = 0.3)
    val s2 = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8, iters = 2,
      sampleFraction = 0.3)
    assert(s1.centroids.map(_.toSeq).toSeq === s2.centroids.map(_.toSeq).toSeq,
      "sampled training must be deterministic (seeded hash filter)")
    // pre-assigned corpus (the store-with-segment path) must give the
    // same results as inline assignment
    val queries = emb.filter($"vec_id" < 10)
    val assigned = Similarity.ivfAssign(emb, "embedding", s1)
    assert(assigned.columns.contains("ivf_cell"))
    val inline = Similarity.ivfKnn(queries, "vec_id", emb, "vec_id", "embedding",
        3, s1, nprobe = 4, excludeSelf = true)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val pre = Similarity.ivfKnn(queries, "vec_id", assigned, "vec_id", "embedding",
        3, s1, nprobe = 4, excludeSelf = true, cellCol = Some("ivf_cell"))
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(inline === pre)
    // the sampled-training cache is released when training returns
    val before = spark.sparkContext.getPersistentRDDs.size
    Similarity.ivfTrain(emb, "vec_id", "embedding", k = 4, iters = 1, sampleFraction = 0.3)
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "ivfTrain must unpersist its training sample")
  }

  test("lshBucketedKnn achieves reasonable recall vs brute force") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val k = 5
    val exact = Similarity.knnJoin(queries, "vec_id", emb, "vec_id", "embedding", k,
        excludeSelf = true)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshBucketedKnn(queries, "vec_id", emb, "vec_id",
        "embedding", k, numPlanes = 4, excludeSelf = true)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall (random would be ~${k.toDouble/500})")
    // determinism: same planes → same buckets on re-run
    val rerun = Similarity.lshBucketedKnn(queries, "vec_id", emb, "vec_id",
        "embedding", k, numPlanes = 4, excludeSelf = true)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(rerun === approx)
  }
}
