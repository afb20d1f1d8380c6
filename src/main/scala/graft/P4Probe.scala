package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup
import graft.queries.ScaleDocs

/** Scratch stage-decomposition probe for the p4 near-dup pipeline —
  * where do the seconds go at 10M docs, and does fusing the shingle
  * build into the verify join's stream side beat the cached docSh
  * frame? Not part of the shipped surface.
  */
object P4Probe {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def sample(reps: Int)(f: => Unit): Seq[Double] = {
    f
    (1 to reps).map(_ => time(f))
  }
  private def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 10000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    // "ab_shipped" / "ab_fused": the r10→r11 clean-JVM A/B — ONE
    // whole-pipeline variant per process invocation (3 timed reps
    // after a warmup), nothing else held cached, so neither variant
    // rides the other's storage pressure (the r10 probe's own flaw)
    val abMode = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reuse the ladder's datasets (and stored signature segments) when
    // the row count names one — a 100M A/B must not duplicate 10+ GB
    val dir = Map(100000L -> "scale_sf1", 10000000L -> "scale_sf100",
        100000000L -> "scale_sf1000")
      .get(rows).map(t => s"${BenchScale.dataRoot}/$t")
      .getOrElse(s"${BenchScale.dataRoot}/scale_p4probe")
    ScaleDocs.ensureDocs(spark, dir, rows)
    if (abMode.isDefined) {
      runAb(spark, dir, rows, reps, abMode.get)
      spark.stop()
      return
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (nHashes, nBands) = if (rows >= 10000000L) (8, 4) else (64, 16)
    val sigPath = s"$dir/minhash_sigs.parquet"
    if (!new java.io.File(sigPath).exists())
      Dedup.minhashSignatures(docs, "doc_id", "text", nHashes)
        .write.mode("overwrite").parquet(sigPath)
    val sigs = spark.read.parquet(sigPath)
    runDecomposition(spark, docs, sigs, nHashes, nBands, reps)
    spark.stop()
  }

  /** The r11 A/B: shipped staged pipeline vs est+verify PAYLOAD FUSION
    * (r10 follow-up, re-structured to preserve the candidateCount
    * funnel metric). Fused shape: the raw (pre-est) pair frame joins
    * ONE per-id payload frame (sig + shingle hashes) per side, the
    * est-passed joined frame persists (its count IS the funnel
    * metric), and the exact verify reads that cache — two pair joins
    * total instead of four, one corpus pass instead of two, at the
    * cost of shingling the ~10% larger pre-est id universe and
    * carrying sig next to _sh through the joins and the cache. */
  private def runAb(spark: SparkSession, dir: String, rows: Long,
      reps: Int, mode: String): Unit = {
    import graft.functions.GraftFunctions
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (nHashes, nBands) = if (rows >= 10000000L) (8, 4) else (64, 16)
    val sigPath = s"$dir/minhash_sigs.parquet"
    if (!new java.io.File(sigPath).exists())
      Dedup.minhashSignatures(docs, "doc_id", "text", nHashes)
        .write.mode("overwrite").parquet(sigPath)
    val sigs = spark.read.parquet(sigPath)
    val threshold = 0.7

    def shipped(): (Long, Long) = {
      val r = Dedup.nearDupPairsStagedCached(docs, "doc_id", "text", sigs,
        numHashes = nHashes, bands = nBands)
      val verified = r.pairs.count()
      val cands = r.candidateCount
      r.unpersist()
      (cands, verified)
    }

    def fused(): (Long, Long) = {
      val (pairsRaw, _, stageCached) = Dedup.candidatePairsStagedRaw(sigs,
        "doc_id", nHashes, nBands)
      val ids = pairsRaw.select(col("id_a").as("_gid"))
        .union(pairsRaw.select(col("id_b").as("_gid"))).distinct()
      val payload = sigs
        .join(broadcast(ids), col("doc_id") === col("_gid"), "left_semi")
        .join(docs.select(col("doc_id"),
            GraftFunctions.shingleHashes(col("text"), 3).as("_sh"))
          .join(broadcast(ids), col("doc_id") === col("_gid"), "left_semi"),
          "doc_id")
        .select(col("doc_id"), col("sig"), col("_sh"))
      val est = pairsRaw
        .join(payload.toDF("id_a", "sig_a", "_sh_a"), "id_a")
        .join(payload.toDF("id_b", "sig_b", "_sh_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          round(Dedup.minhashJaccard(col("sig_a"), col("sig_b")), 4)
            .as("est_jaccard"),
          col("_sh_a"), col("_sh_b"))
        .filter(col("est_jaccard") >= threshold * 0.6)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cands = est.count()
      stageCached.foreach(_.unpersist())
      val verified = est
        .withColumn("jaccard",
          GraftFunctions.sortedJaccardHash(col("_sh_a"), col("_sh_b")))
        .filter(col("jaccard") >= threshold)
        .count()
      est.unpersist()
      (cands, verified)
    }

    val run: () => (Long, Long) = mode match {
      case "ab_shipped" => () => shipped()
      case "ab_fused" => () => fused()
      case other => throw new IllegalArgumentException(s"unknown ab mode $other")
    }
    val (c0, v0) = run() // warmup rep (also prints the funnel)
    println(s"[p4ab] $mode funnel: candidates=$c0 verified=$v0")
    val xs = (1 to reps).map { _ =>
      System.gc()
      time { run(); () }
    }
    println(f"[p4ab] $mode%-12s p50=${p50(xs)}%.2f reps=${xs.map(x => f"$x%.2f").mkString(",")}")
  }

  private def runDecomposition(spark: SparkSession, docs: DataFrame,
      sigs: DataFrame, nHashes: Int, nBands: Int, reps: Int): Unit = {

    def report(tag: String, xs: Seq[Double]): Unit =
      println(f"[p4probe] $tag%-36s p50=${p50(xs)}%.2f reps=${xs.map(x => f"$x%.2f").mkString(",")}")

    // GRAFT_P4_STAGED_ONLY=1: skip the lazy candidate stage and the
    // whole-pipeline comparison variants — the cheap decomposition of
    // the SHIPPED staged path only (stage splits + one end-to-end)
    val stagedOnly = sys.env.get("GRAFT_P4_STAGED_ONLY").contains("1")

    // ---- stage decomposition (one pass, persisted handoffs) ----
    val threshold = 0.7
    val cands =
      if (stagedOnly) {
        val (c, cached) = Dedup.candidatePairsStagedCached(sigs, "doc_id",
          nHashes, nBands, minEstJaccard = threshold * 0.6)
        val cc = c.persist(StorageLevel.MEMORY_AND_DISK)
        val tCand = time { println(s"[p4probe] candidates = ${cc.count()}") }
        report("stage1_candidates_STAGED", Seq(tCand))
        cached.foreach(_.unpersist())
        cc
      } else {
        val cc = Dedup.candidatePairsFromSignatures(sigs, "doc_id", nHashes, nBands,
          minEstJaccard = threshold * 0.6).persist(StorageLevel.MEMORY_AND_DISK)
        val tCand = time { println(s"[p4probe] candidates = ${cc.count()}") }
        report("stage1_candidates", Seq(tCand))
        cc
      }

    val candIds = broadcast(
      cands.select(col("id_a").as("_cid"))
        .union(cands.select(col("id_b").as("_cid"))).distinct())
    val docSh = docs.join(candIds, col("doc_id") === col("_cid"), "left_semi")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("_sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tSh = time { println(s"[p4probe] cand docs  = ${docSh.count()}") }
    report("stage2_docsh_build_persist", Seq(tSh))

    def verifyWithDocSh(): Long =
      cands.join(docSh.toDF("id_a", "_sh_a"), "id_a")
        .join(docSh.toDF("id_b", "_sh_b"), "id_b")
        .withColumn("jaccard", GraftFns.setJaccard(col("_sh_a"), col("_sh_b")))
        .filter(col("jaccard") >= threshold).count()
    report("stage3_verify_joins(cached docSh)", sample(reps)(verifyWithDocSh(): Unit))

    // ---- r10: the staged-cached candidate stage (window collision
    // pre-filter + single semi-filtered signature scan) vs the lazy
    // shape measured as stage1 above ----
    if (!stagedOnly) report("stage1_candidates_STAGED(r10)", sample(reps) {
      val (c, cached) = Dedup.candidatePairsStagedCached(sigs, "doc_id",
        nHashes, nBands, minEstJaccard = threshold * 0.6)
      val cc = c.persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[p4probe] staged candidates = ${cc.count()}")
      cc.unpersist(); cached.foreach(_.unpersist()); ()
    })

    // ---- whole-pipeline variants (each rep = candidates → verified) ----
    // A: the shipped shape (r10: staged candidate stage inside)
    report("whole_shipped(staged cached)", sample(reps) {
      val r = Dedup.nearDupPairsStagedCached(docs, "doc_id", "text", sigs,
        numHashes = nHashes, bands = nBands)
      r.pairs.count(); r.unpersist(); ()
    })
    if (stagedOnly) {
      // r10 follow-up variant: est+verify PAYLOAD FUSION — the raw
      // (pre-est) pairs join ONE per-id payload frame (sig + shingle
      // hashes) per side, est-filter and exact-verify in a single
      // pass. Two pair joins instead of four, one corpus semi-scan
      // instead of two, at the cost of shingling the ~10% larger
      // pre-est id universe and carrying sig (64 B) beside _sh.
      import graft.functions.GraftFunctions
      import org.apache.spark.sql.DataFrame
      def fusedPayload(): Long = {
        val banded = Dedup.lshBands(sigs, "doc_id", "sig", nBands, nHashes)
        val colliding = banded
          .withColumn("_n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("band"), col("band_hash"))))
          .filter(col("_n") >= 2).drop("_n")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val pairsRaw = colliding.as("a").join(colliding.as("b"),
            col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        pairsRaw.count()
        val ids = broadcast(
          pairsRaw.select(col("id_a").as("_pid"))
            .union(pairsRaw.select(col("id_b").as("_pid"))).distinct())
        val payload: DataFrame = sigs
          .join(ids, col("doc_id") === col("_pid"), "left_semi")
          .join(docs.select(col("doc_id"),
              GraftFunctions.shingleHashes(col("text"), 3).as("_sh"))
            .join(ids, col("doc_id") === col("_pid"), "left_semi"), "doc_id")
          .select(col("doc_id"), col("sig"), col("_sh"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val out = pairsRaw
          .join(payload.toDF("id_a", "sig_a", "_sh_a"), "id_a")
          .join(payload.toDF("id_b", "sig_b", "_sh_b"), "id_b")
          .withColumn("est_jaccard",
            round(Dedup.minhashJaccard(col("sig_a"), col("sig_b")), 4))
          .filter(col("est_jaccard") >= threshold * 0.6)
          .withColumn("jaccard",
            GraftFunctions.sortedJaccardHash(col("_sh_a"), col("_sh_b")))
          .filter(col("jaccard") >= threshold)
        val n = out.count()
        colliding.unpersist(); pairsRaw.unpersist(); payload.unpersist()
        n
      }
      println(s"[p4probe] fused verified = ${fusedPayload()}")
      report("whole_fused_payload(r10)", sample(reps)(fusedPayload(): Unit))
      docSh.unpersist(); cands.unpersist(); spark.stop(); return
    }

    // B: text through the joins, shingles fused per pair side
    def fusedTextVerify(): Long = {
      val c = Dedup.candidatePairsFromSignatures(sigs, "doc_id", nHashes, nBands,
        minEstJaccard = threshold * 0.6).persist(StorageLevel.MEMORY_AND_DISK)
      val ids = broadcast(
        c.select(col("id_a").as("_cid"))
          .union(c.select(col("id_b").as("_cid"))).distinct())
      val txt = docs.join(ids, col("doc_id") === col("_cid"), "left_semi")
        .select(col("doc_id"), col("text"))
      val n = c.join(txt.toDF("id_a", "_t_a"), "id_a")
        .join(txt.toDF("id_b", "_t_b"), "id_b")
        .withColumn("jaccard", GraftFns.setJaccard(
          Dedup.shingles(col("_t_a"), 3), Dedup.shingles(col("_t_b"), 3)))
        .filter(col("jaccard") >= threshold).count()
      c.unpersist(); n
    }
    report("whole_fused_text_joins", sample(reps)(fusedTextVerify(): Unit))

    // C: lazy docSh — shingle kernel recomputes per join branch, no
    // persist write, arrays still shuffle
    def lazyDocShVerify(): Long = {
      val c = Dedup.candidatePairsFromSignatures(sigs, "doc_id", nHashes, nBands,
        minEstJaccard = threshold * 0.6).persist(StorageLevel.MEMORY_AND_DISK)
      val ids = broadcast(
        c.select(col("id_a").as("_cid"))
          .union(c.select(col("id_b").as("_cid"))).distinct())
      val sh = docs.join(ids, col("doc_id") === col("_cid"), "left_semi")
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("_sh"))
      val n = c.join(sh.toDF("id_a", "_sh_a"), "id_a")
        .join(sh.toDF("id_b", "_sh_b"), "id_b")
        .withColumn("jaccard", GraftFns.setJaccard(col("_sh_a"), col("_sh_b")))
        .filter(col("jaccard") >= threshold).count()
      c.unpersist(); n
    }
    report("whole_lazy_docsh", sample(reps)(lazyDocShVerify(): Unit))

    docSh.unpersist(); cands.unpersist()
    spark.stop()
  }
}

/** Local alias to keep probe code terse. */
private object GraftFns {
  def setJaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.exprs.SortedJaccard(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))
}
