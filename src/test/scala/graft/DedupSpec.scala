package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep green forest while the sun sets slowly behind tall mountains"

  test("exactDedup keeps one row per normalized text") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "  hello world "), (3L, "other doc"),
      (4L, "HELLO WORLD"), (5L, "other  DOC")).toDF("id", "text")
    val out = Dedup.exactDedup(df, "id", "text")
    assert(out.count() === 2)
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("exactDedupIds returns exactly exactDedup's survivor ids, one column") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "  hello world "), (3L, "other doc"),
      (4L, "HELLO WORLD"), (5L, "other  DOC")).toDF("id", "text")
    val slim = Dedup.exactDedupIds(df, "id", "text")
    assert(slim.columns.toSeq === Seq("id"))
    val full = Dedup.exactDedup(df, "id", "text")
      .select("id").as[Long].collect().sorted.toSeq
    assert(slim.as[Long].collect().sorted.toSeq === full)
  }

  test("minhash LSH finds planted near-duplicates, skips distinct docs") {
    val nearDup = base.replace("quick", "fast") // 1-word edit
    val unrelated = "completely different content about database engines " +
      "processing columnar analytical workloads with vectorized execution plans"
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("id", "text")
    val pairs = Dedup.nearDupPairs(df, "id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("both candidate paths semi-filter signatures over checkpointed pairs") {
    val df = Seq((1L, base), (2L, base.replace("quick", "fast"))).toDF("id", "text")
    // r12: the raw pair frame is a lazy local checkpoint, so the
    // candidate-id subtree reads materialized blocks instead of
    // re-running the banding (the old reason the INLINE path skipped
    // the filter — a corpus-wide kernel re-run per consumer). Both
    // paths must now carry the left-semi signature filter AND the
    // checkpoint scan it probes.
    val inlinePlan = Dedup.minhashCandidatePairs(df, "id", "text", numHashes = 64)
      .queryExecution.executedPlan.toString
    assert(inlinePlan.toLowerCase.contains("leftsemi"),
      s"inline candidate path must semi-filter signatures:\n$inlinePlan")
    assert(inlinePlan.contains("ExistingRDD") || inlinePlan.contains("Scan ExistingRDD"),
      s"inline candidate path must read the checkpointed pair frame:\n$inlinePlan")
    // staged (stored-segment shape): the semi-filter is the scale
    // contract — signatures shuffle for candidate ids only
    val sigs = Dedup.minhashSignatures(df, "id", "text", numHashes = 64)
    val stagedPlan = Dedup.candidatePairsFromSignatures(sigs, "id", numHashes = 64)
      .queryExecution.executedPlan.toString
    assert(stagedPlan.toLowerCase.contains("leftsemi"),
      s"staged candidate path must semi-filter signatures:\n$stagedPlan")
  }

  test("nearDupPairsStagedCached matches the lazy staged pipeline") {
    val nearDup = base.replace("quick", "fast")
    val other = "completely different content about database engines " +
      "processing columnar analytical workloads with vectorized execution plans"
    val otherDup = other.replace("columnar", "column")
    val df = Seq((1L, base), (2L, nearDup), (3L, other), (4L, otherDup))
      .toDF("id", "text")
    val sigs = Dedup.minhashSignatures(df, "id", "text", numHashes = 64)
    val lazyPairs = Dedup.nearDupPairsStaged(df, "id", "text", sigs,
        threshold = 0.5, numHashes = 64)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val cached = Dedup.nearDupPairsStagedCached(df, "id", "text", sigs,
      threshold = 0.5, numHashes = 64)
    try {
      val cachedPairs = cached.pairs.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(cachedPairs === lazyPairs)
      assert(lazyPairs.map(p => (p._1, p._2)) === Set((1L, 2L), (3L, 4L)))
      // the eager candidate count equals the lazy candidate frame's
      val lazyCands = Dedup.candidatePairsFromSignatures(sigs, "id",
        numHashes = 64, minEstJaccard = 0.5 * 0.6).count()
      assert(cached.candidateCount === lazyCands)
    } finally cached.unpersist()
  }

  test("staged-cached candidate stage == lazy candidate stage (pairs + est values)") {
    // richer collision structure than the cached-pipeline test: a
    // 3-doc identical cluster (C(3,2) pairs inside ONE band group —
    // the within-group pairing the collision pre-filter must keep), a
    // near pair, and singletons the window filter must drop silently
    val nearDup = base.replace("quick", "fast")
    val other = "completely different content about database engines " +
      "processing columnar analytical workloads with vectorized execution plans"
    val df = Seq((1L, base), (2L, base), (3L, base), (4L, nearDup),
      (5L, other), (6L, "short unrelated text fragment here"))
      .toDF("id", "text")
    val sigs = Dedup.minhashSignatures(df, "id", "text", numHashes = 64)
    val lazyCands = Dedup.candidatePairsFromSignatures(sigs, "id",
        numHashes = 64, minEstJaccard = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val (stagedDf, cached) = Dedup.candidatePairsStagedCached(sigs, "id",
      numHashes = 64, bands = 16, minEstJaccard = 0.3)
    try {
      val staged = stagedDf.as[(Long, Long, Double)].collect().toSet
      assert(staged === lazyCands)
      // the identical 3-cluster must survive as all three pairs
      assert(staged.map(p => (p._1, p._2))
        .intersect(Set((1L, 2L), (1L, 3L), (2L, 3L))).size === 3)
      // plan shape: the self-join's input is the window-counted
      // colliding subset (singleton band groups never reach the join);
      // the persisted stage handoffs (the pair frame and the
      // semi-filtered signature frame) appear as in-memory scans
      val plan = stagedDf.queryExecution.executedPlan.toString
      assert(plan.contains("Window"),
        s"staged candidate stage must pre-filter collisions via a window count:\n$plan")
      assert(plan.contains("InMemoryTableScan"),
        s"staged candidate stage must read its PERSISTED stage handoffs:\n$plan")
    } finally cached.foreach(_.unpersist())
  }

  test("candidate-id semi-filters gate on the materialized count: forced " +
      "shuffle branch ≡ broadcast branch (pairs, est, jaccard, funnel)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.catalyst.plans.LeftSemi

    // count LeftSemi broadcast joins through the whole tree INCLUDING
    // persisted stage handoffs (the candSigs semi-filter lives inside
    // the cands cache's stored plan)
    def semiBroadcasts(p: SparkPlan): Int =
      p.collect {
        case b: BroadcastHashJoinExec if b.joinType == LeftSemi => 1
        case s: InMemoryTableScanExec => semiBroadcasts(s.relation.cachedPlan)
      }.sum

    val nearDup = base.replace("quick", "fast")
    val other = "completely different content about database engines " +
      "processing columnar analytical workloads with vectorized execution plans"
    val df = Seq((1L, base), (2L, nearDup), (3L, other),
      (4L, other.replace("columnar", "column"))).toDF("id", "text")
    val sigs = Dedup.minhashSignatures(df, "id", "text", numHashes = 64)
    // pin the plans: with stats- and adaptive-broadcast off, hint
    // presence ALONE decides the join strategy — exactly the gate
    // under test (broadcastIdLimit = 0 forces Some(n) > limit, the
    // branch a 10^10-doc corpus would take)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the two runs must be SEQUENTIAL (fully unpersist the first
      // before building the second): cache lookup canonicalizes hint
      // nodes away, so an overlapping run would silently read the
      // other branch's cached — hinted — subtrees
      def run(limit: Long): (Set[(Long, Long, Double, Double)], Long, Int, String) = {
        val r = Dedup.nearDupPairsStagedCached(df, "id", "text", sigs,
          threshold = 0.5, numHashes = 64, broadcastIdLimit = limit)
        try {
          val plan = r.pairs.queryExecution.executedPlan
          val pairs = r.pairs.select("id_a", "id_b", "est_jaccard", "jaccard")
            .as[(Long, Long, Double, Double)].collect().toSet
          (pairs, r.candidateCount, semiBroadcasts(plan), plan.toString)
        } finally r.unpersist()
      }
      val (bcPairs, bcCands, bcN, bcPlan) = run(Dedup.BroadcastIdLimit)
      val (shPairs, shCands, shN, shPlan) = run(0L)
      assert(bcN >= 1,
        s"under-limit run must broadcast-hint its semi-filters:\n$bcPlan")
      assert(shN === 0,
        s"over-limit run must not broadcast any semi-filter:\n$shPlan")
      assert(bcPairs.nonEmpty, "fixture must produce verified pairs")
      assert(bcPairs === shPairs)
      assert(bcCands === shCands)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("hashed-shingle jaccard == string-shingle jaccard (the verify representation)") {
    import graft.functions.GraftFunctions
    // real-ish docs + edge shapes: short (< n tokens), unicode,
    // repeated tokens, identical pair, disjoint pair
    val docs = Seq(
      base, base + " extra tail tokens here", base.replace("quick", "slow"),
      "one two", "one two", "völlig ändere wörter überall",
      "a a a a a a", "totally different content entirely").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val pairs = df.toDF("id_a", "t_a").crossJoin(df.toDF("id_b", "t_b"))
      .filter(col("id_a") < col("id_b"))
      .select(
        GraftFunctions.sortedJaccardHash(
          GraftFunctions.shingleHashes(col("t_a"), 3),
          GraftFunctions.shingleHashes(col("t_b"), 3)).as("hashed"),
        GraftFunctions.sortedJaccard(
          Dedup.shingles(col("t_a"), 3),
          Dedup.shingles(col("t_b"), 3)).as("strings"))
      .collect()
    pairs.foreach(r => assert(r.getDouble(0) === r.getDouble(1), r))
    // the hash array is sorted distinct longs
    val arr = df.select(GraftFunctions.shingleHashes(col("text"), 3).as("h"))
      .collect().map(_.getSeq[Long](0))
    arr.foreach { a =>
      assert(a == a.sorted && a.distinct.size == a.size, a)
    }
  }

  test("minhash estimated jaccard approximates exact jaccard") {
    val nearDup = base.replace("quick", "fast")
    val df = Seq((1L, base), (2L, nearDup)).toDF("id", "text")
    val est = Dedup.minhashCandidatePairs(df, "id", "text",
      numHashes = 128, bands = 32, minEstJaccard = 0.0)
      .select("est_jaccard").as[Double].head()
    val exact = df.agg(Dedup.ngramJaccard(
        lit(base), lit(nearDup), 3).as("j"))
      .select("j").as[Double].head()
    assert(math.abs(est - exact) < 0.2, s"est=$est exact=$exact")
  }

  test("simhash: near-dups have small hamming distance, unrelated large") {
    val nearDup = base.replace("quick", "fast")
    val unrelated = "completely different content about database engines " +
      "processing columnar analytical workloads with vectorized execution"
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("id", "text")
    val sh = df.select($"id", Dedup.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < 12, s"near-dup hamming=${ham(sh(1L), sh(2L))}")
    assert(ham(sh(1L), sh(3L)) > 16, s"unrelated hamming=${ham(sh(1L), sh(3L))}")
    assert(sh(1L) === df.filter($"id" === 1)
      .select(Dedup.simhash64($"text")).as[Long].head(), "deterministic")
  }

  test("ngramJaccard identical=1, disjoint=0") {
    val df = Seq(1).toDF("x")
    val r = df.select(
      Dedup.ngramJaccard(lit(base), lit(base), 3).as("same"),
      Dedup.ngramJaccard(lit(base), lit("zz yy xx ww vv uu tt ss"), 3).as("diff"))
      .as[(Double, Double)].head()
    assert(r._1 === 1.0)
    assert(r._2 === 0.0)
  }

  test("winnowing fingerprints: identical→full overlap, shared suffix→partial, disjoint→none") {
    val suffix = base.split(" ").drop(2).mkString(" ")
    val unrelated = "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg"
    val df = Seq((1L, base), (2L, suffix), (3L, unrelated)).toDF("id", "text")
      .select($"id", TextAnalysis.winnowingFingerprint($"text").as("fp"))
    val fp = df.as[(Long, Seq[Long])].collect().toMap
    def overlap(a: Seq[Long], b: Seq[Long]) =
      a.intersect(b).length.toDouble / a.length
    assert(overlap(fp(1L), fp(1L)) === 1.0)
    assert(overlap(fp(2L), fp(1L)) > 0.7, "shared suffix should overlap heavily")
    assert(overlap(fp(3L), fp(1L)) === 0.0)
    assert(fp(1L) === fp(1L).sorted, "sorted output")
  }

  test("embeddingNearDups finds an exact-duplicate vector pair, skips orthogonal") {
    val v = (1 to 64).map(_.toFloat / 10)
    val orth = Seq.fill(32)(Seq(1f, 0f)).flatten // orthogonal-ish pattern
    val df = Seq((1L, v), (2L, v), (3L, orth)).toDF("id", "vec")
    val pairs = Dedup.embeddingNearDups(df, "id", "vec", simThreshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("connectedComponents: chains converge to min label, pairs stay separate") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val result = Dedup.connectedComponentsResult(pairs)
    val comps = result.labels.as[(Long, Long)].collect().toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(result.converged)
    result.unpersist() // long-session hygiene hook
  }

  test("connectedComponents throws instead of returning partial labels at maxIter") {
    // chain of diameter 6 cannot converge in 1 round
    val chain = (1L to 6L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    intercept[IllegalStateException](Dedup.connectedComponents(chain, maxIter = 1))
    val partial = Dedup.connectedComponentsResult(chain, maxIter = 1)
    assert(!partial.converged && partial.iterations === 1)
    partial.unpersist()
    // enough rounds → clean convergence, same API
    assert(Dedup.connectedComponents(chain).as[(Long, Long)].collect().toMap
      .values.toSet === Set(1L))
  }

  test("CcLabels.unpersist releases the cached labels (multi-dedup session)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val handles = (0 until 2).map { i =>
      Dedup.connectedComponentsResult(
        Seq((i * 10L + 1, i * 10L + 2)).toDF("id_a", "id_b"))
    }
    handles.foreach(_.labels.count())
    assert(sc.getPersistentRDDs.size > before, "labels should be cached while live")
    handles.foreach(_.unpersist())
    assert(sc.getPersistentRDDs.size === before, "unpersist must release every handle")
  }

  test("nearDupDedup keeps one survivor per near-dup cluster, untouched docs survive") {
    val nearDup = base.replace("quick", "fast")
    val nearDup2 = base.replace("lazy", "idle")
    val unrelated = "completely different content about database engines " +
      "processing columnar analytical workloads with vectorized execution plans"
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, nearDup2))
      .toDF("id", "text")
    val out = Dedup.nearDupDedup(df, "id", "text", threshold = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out === Seq(1L, 3L), s"cluster {1,2,4} keeps 1; got $out")
  }

  test("jaccardSimilarityJoin matches brute-force all-pairs exactly") {
    // corpus with near-dups at different similarity levels plus noise;
    // the prefix-filtered join must reproduce the brute-force pair set
    // (exactness = zero false negatives, the prefix bound's claim)
    val docs = Seq(
      1L -> base,
      2L -> base.replace("quick", "fast"),
      3L -> base.replace("lazy", "idle").replace("deep", "dark"),
      4L -> ("completely different content about database engines " +
        "processing columnar analytical workloads with vectorized plans"),
      5L -> base, // exact duplicate
      6L -> ("completely different content about database engines " +
        "processing columnar analytical workloads with modern hardware"))
      .toDF("id", "text")
    for (t <- Seq(0.3, 0.4, 0.5, 0.8)) {
      val got = Dedup.jaccardSimilarityJoin(docs, "id", "text", n = 3, threshold = t)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val a = docs.toDF("id_a", "text_a")
      val b = docs.toDF("id_b", "text_b")
      val brute = a.crossJoin(b).filter($"id_a" < $"id_b")
        .withColumn("jaccard", Dedup.ngramJaccard($"text_a", $"text_b", 3))
        .filter($"jaccard" >= t)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(got === brute, s"threshold $t")
      assert(brute.nonEmpty, s"vacuous at $t — fixture broken")
    }
  }

  test("jaccardSimilarityJoin fuzz: random corpora match brute force (seeded)") {
    // small word pool forces heavy shingle overlap — the hardest regime
    // for prefix filtering (rare-shingle prefixes barely exist)
    val pool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 8) {
      val docs = (1L to 8L).map { id =>
        val len = 3 + rnd.nextInt(12)
        id -> Seq.fill(len)(pool(rnd.nextInt(pool.size))).mkString(" ")
      }.toDF("id", "text")
      // 0.2/0.4/0.65/0.8 are thresholds where the unslacked float
      // bound was PROVEN to overshoot (ceil(0.4/1.4*7) = 3 > 2 etc.) —
      // keep them in rotation so the slack regressing fails loudly
      val t = Seq(0.2, 0.25, 0.4, 0.5, 0.65, 0.75, 0.8)(rnd.nextInt(7))
      val got = Dedup.jaccardSimilarityJoin(docs, "id", "text", n = 2, threshold = t)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val brute = docs.toDF("id_a", "text_a")
        .crossJoin(docs.toDF("id_b", "text_b")).filter($"id_a" < $"id_b")
        .withColumn("jaccard", Dedup.ngramJaccard($"text_a", $"text_b", 2))
        .filter($"jaccard" >= t)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(got === brute, s"round $round threshold $t")
    }
  }

  test("jaccardSimilarityJoin rejects degenerate thresholds") {
    val docs = Seq(1L -> base).toDF("id", "text")
    intercept[IllegalArgumentException](
      Dedup.jaccardSimilarityJoin(docs, "id", "text", n = 2, threshold = 0.0))
  }

  test("fingerprints are normalization-invariant") {
    val df = Seq(("A  B\tC", "a b c")).toDF("t1", "t2")
    val r = df.select(
      (TextAnalysis.fingerprint64($"t1") === TextAnalysis.fingerprint64($"t2")).as("eq64"),
      (TextAnalysis.fingerprintMd5($"t1") === TextAnalysis.fingerprintMd5($"t2")).as("eqMd5"))
      .as[(Boolean, Boolean)].head()
    assert(r === ((true, true)))
  }
}
