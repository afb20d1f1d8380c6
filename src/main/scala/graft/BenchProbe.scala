package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.ScaleTable

/** Scratch A/B probe for scale-bench optimization candidates.
  * Not part of the shipped surface; used to measure plan-level levers
  * before wiring them into the engine.
  */
object BenchProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def exec(df: DataFrame): Unit = {
    df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
    ()
  }

  private def sample(reps: Int)(f: => Unit): Seq[Double] = {
    f
    (1 to reps).map(_ => time(f))
  }

  private def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(); ()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"${BenchScale.dataRoot}/scale_sf1000"
    ScaleTable.ensure(spark, dir, 100000000L)
    val t = spark.read.parquet(s"$dir/ontime.parquet")
    exec(t) // warm page cache

    def run(name: String)(df: => DataFrame): Unit = {
      val ts = sample(5)(exec(df))
      println(f"[probe] $name%-40s p50=${p50(ts)}%.3f reps=${ts.map(x => f"$x%.3f").mkString(",")}")
    }

    val which = if (args.nonEmpty) args(0) else "all"

    if (which == "all" || which == "groupby") {
      val a4 = () => t.groupBy(col("Carrier"))
        .agg(count(lit(1)).as("c")).orderBy(col("c").desc).limit(20)
      val a5 = () => t.filter(col("Cancelled") === 0)
        .groupBy(col("Origin"), col("Dest"))
        .agg(avg(col("ArrDelay")).as("a"))
        .orderBy(col("a").desc).limit(100)
      val a6 = () => t.filter(col("ArrDelay") > 0)
        .groupBy(col("DaysSinceEpoch"), col("Carrier"), col("OriginState"))
        .agg(sum(col("DepDelay")).as("s"), count(lit(1)).as("n"))
        .orderBy(col("s").desc).limit(100)
      // interleaved A/B: fastmap on vs off, 3 rounds each
      (1 to 3).foreach { r =>
        spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "true")
        run(s"a4 fastmap r$r")(a4()); run(s"a5 fastmap r$r")(a5()); run(s"a6 fastmap r$r")(a6())
        spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "false")
        run(s"a4 nofast  r$r")(a4()); run(s"a5 nofast  r$r")(a5()); run(s"a6 nofast  r$r")(a6())
      }
      spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "true")
    }

    if (which == "all" || which == "hll") {
      run("h1 approx_count_distinct(0.065)")(
        t.agg(approx_count_distinct(col("FlightNum"), 0.065).as("v")))
      run("h1 approx_count_distinct(default)")(
        t.agg(approx_count_distinct(col("FlightNum")).as("v")))
      run("h1 hll_sketch_agg lgK=8")(
        t.agg(hll_sketch_estimate(hll_sketch_agg(col("FlightNum"), lit(8))).as("v")))
      run("h1 hll_sketch_agg lgK=12")(
        t.agg(hll_sketch_estimate(hll_sketch_agg(col("FlightNum"), lit(12))).as("v")))
    }

    if (which == "all" || which == "pct") {
      run("h2 percentile_approx acc=1000")(
        t.agg(percentile_approx(col("ArrDelay"), array(lit(0.5), lit(0.95)), lit(1000)).as("v")))
      run("h2 percentile_approx acc=200")(
        t.agg(percentile_approx(col("ArrDelay"), array(lit(0.5), lit(0.95)), lit(200)).as("v")))
      // int column with ~400 distinct values: exact histogram path
      run("h2 exact value-histogram")(
        t.groupBy(col("ArrDelay")).agg(count(lit(1)).as("c")))
      run("h2 exact percentile()")(
        t.agg(percentile(col("ArrDelay"), array(lit(0.5), lit(0.95))).as("v")))
      // grouped variant: histogram per (group, value) then window
      run("h2g percentile_approx by Carrier")(
        t.groupBy(col("Carrier"))
          .agg(percentile_approx(col("ArrDelay"), array(lit(0.5), lit(0.95)), lit(1000)).as("v")))
      run("h2g exact histogram by Carrier")(
        graft.operators.Percentiles.exact(
          t.select(col("Carrier"), col("ArrDelay").cast("double").as("v")),
          Seq("Carrier"), "v", Seq(0.5 -> "p50", 0.95 -> "p95")))
      // the rank-pass cliff case: a NEAR-UNIQUE int (~10^8 distinct
      // hash values over 100M rows). A single global window would sort
      // the whole ~100M-row histogram in one task; the two-level
      // bucketed prefix sum keeps every task at one bucket (~3K
      // values). This is the worst case for the EXACT path — the
      // sketch is the intended tool here — probed to show it degrades
      // to bounded-parallel work, not a one-task sort.
      run("h2u near-unique exact histogram")(
        graft.operators.Percentiles.histogramAggs(
          t.select(pmod(xxhash64(col("FlightNum"), col("ArrTime"), col("Distance")),
            lit(1L << 31)).cast("double").as("v")),
          Nil, "v", Seq(
            graft.operators.Percentiles.Spec(0.5, "p50", nearestRank = false),
            graft.operators.Percentiles.Spec(0.95, "p95", nearestRank = false))))
    }

    if (which == "rankselect") {
      // rank-narrowing selection vs the full-histogram shuffle on the
      // near-unique g2 shape (judge item 3, round 8)
      import graft.operators.Percentiles
      def nearUnique = t.select(
        pmod(xxhash64(col("FlightNum"), col("ArrTime"), col("Distance")),
          lit(1L << 31)).cast("double").as("v"))
      val specs = Seq(
        Percentiles.Spec(0.5, "p50", nearestRank = false),
        Percentiles.Spec(0.95, "p95", nearestRank = false))
      val a = Percentiles.rankSelect(nearUnique, "v", specs).head()
      val b = Percentiles.histogramAggs(nearUnique, Nil, "v", specs).head()
      println(s"[probe] rankSelect=$a histogram=$b equal=${a == b}")
      run("g2 rankSelect")(Percentiles.rankSelect(nearUnique, "v", specs))
      run("g2 histogramAggs")(
        Percentiles.histogramAggs(nearUnique, Nil, "v", specs))
    }

    if (which == "a5") {
      // which tree does a5 route to, and where does the 0.57 s go?
      import graft.plans.{StarTree, StarTreeRegistry}
      val t4 = StarTree.Index(Seq("Cancelled", "Origin", "Dest"),
        Seq("ArrDelay", "DepDelay"),
        spark.read.parquet(s"$dir/startree_cancel_od.parquet"), 0, 0)
      val t1 = StarTree.Index(Seq("Cancelled", "Carrier", "Origin", "Dest"),
        Seq("ArrDelay", "DepDelay"),
        spark.read.parquet(s"$dir/startree_cancel_carrier_od.parquet"), 0, 0)
      println(s"[probe] t4 rows=${t4.rollup.count()} t1 rows=${t1.rollup.count()}")
      Graft.enable(spark)
      val pql = BenchScale.workload.find(_._1 == "a5_groupby_2dim").get._3
      def df = graft.pql.Pql.toDataFrame(graft.pql.Pql.parse(pql), _ => t)
      StarTreeRegistry.register(s"$dir/ontime.parquet", t1)
      StarTreeRegistry.register(s"$dir/ontime.parquet", t4)
      try {
        val plan = df.queryExecution.executedPlan.toString
        println("[probe] a5 scans cancel_od: " + plan.contains("startree_cancel_od"))
        println("[probe] a5 scans carrier_od: " + plan.contains("startree_cancel_carrier_od"))
        run("a5 routed (both trees)")(df)
      } finally StarTreeRegistry.unregister(s"$dir/ontime.parquet")
      StarTreeRegistry.register(s"$dir/ontime.parquet", t1)
      try run("a5 routed (t1 only)")(df)
      finally StarTreeRegistry.unregister(s"$dir/ontime.parquet")
      // the slice itself, hand-written over t4's rollup
      val slice = t4.rollup.filter(col("Cancelled") === 0 &&
          col("Origin").isNotNull && col("Dest").isNotNull)
        .groupBy(col("Origin"), col("Dest"))
        .agg((sum(col("sum_ArrDelay")) / sum(col("star_count"))).as("a"))
        .orderBy(col("a").desc).limit(100)
      run("a5 hand slice over t4")(slice)
    }

    if (which == "s2") {
      // s2_page decomposition on the DSE-sorted copy: (a) today's
      // subset TakeOrdered, (b) + synthesized sorted-column bound
      // (page-index pruning), (c) dict-encoded subset (int Origin)
      val copy = spark.read.parquet(s"$dir/ontime_sorted_dse.parquet")
      val files = copy.inputFiles.sorted
      val sub = spark.read.schema(copy.schema).parquet(files.head)
      println(s"[probe] subset file rows=${sub.count()}")
      def page(df: DataFrame) = df
        .select(col("DaysSinceEpoch"), col("FlightNum"), col("Origin"))
        .orderBy(col("DaysSinceEpoch").asc, col("FlightNum").asc)
        .offset(1000).limit(100)
      run("s2 subset plain")(page(sub))
      run("s2 subset bound<=16000")(page(sub.filter(col("DaysSinceEpoch") <= 16000)))
      println(sub.filter(col("DaysSinceEpoch") <= 16000)
        .select(col("DaysSinceEpoch")).queryExecution.executedPlan.toString.take(800))
      println(s"[probe] bound rows=${sub.filter(col("DaysSinceEpoch") <= 16000).count()}")
      // keys parity
      val a = page(sub).select(col("DaysSinceEpoch")).collect().map(_.getInt(0)).toSeq
      val b = page(sub.filter(col("DaysSinceEpoch") <= 16000))
        .select(col("DaysSinceEpoch")).collect().map(_.getInt(0)).toSeq
      println(s"[probe] keys equal=${a == b}")
      // compound bound: (DSE < 16000) OR (DSE = 16000 AND FlightNum <= F)
      val fBound = sub.filter(col("DaysSinceEpoch") === 16000)
        .select(col("FlightNum")).orderBy(col("FlightNum").asc).limit(1100)
        .agg(max(col("FlightNum"))).head().getInt(0)
      println(s"[probe] fBound=$fBound")
      val compound = col("DaysSinceEpoch") < 16000 ||
        (col("DaysSinceEpoch") === 16000 && col("FlightNum") <= fBound)
      println(s"[probe] compound rows=${sub.filter(compound).count()}")
      run("s2 subset compound bound")(page(sub.filter(compound)))
      val c = page(sub.filter(compound))
        .select(col("DaysSinceEpoch")).collect().map(_.getInt(0)).toSeq
      println(s"[probe] compound keys equal=${a == c}")
      // floor reference: cheapest possible job
      run("floor range(1)")(spark.range(1).toDF("id"))
    }

    if (which == "sorted") {
      // why does the sorted-layout a2 gain lag DuckDB's? A/B the file
      // count: pruning skips row groups per task, so 64 near-empty
      // tasks still pay scheduling+footer cost
      val base = t.filter(col("Carrier") === "C03")
        .agg(sum(col("ArrDelay")).as("s"), min(col("DepDelay")).as("mn"),
          max(col("ArrDelay")).as("mx"), avg(col("DepDelay")).as("a"))
      run("a2 unsorted")(base)
      Seq(64, 16, 8).foreach { n =>
        val p = s"$dir/ontime_sorted_$n.parquet"
        if (!new java.io.File(s"$dir/_SORTED${n}_DONE").exists()) {
          t.repartitionByRange(n, col("Carrier"), col("FlightNum"))
            .sortWithinPartitions(col("Carrier"))
            .write.mode("overwrite").parquet(p)
          java.nio.file.Files.write(new java.io.File(s"$dir/_SORTED${n}_DONE").toPath,
            java.util.Arrays.asList("ok"))
        }
        val s = spark.read.parquet(p)
        exec(s)
        val q = s.filter(col("Carrier") === "C03")
          .agg(sum(col("ArrDelay")).as("s"), min(col("DepDelay")).as("mn"),
            max(col("ArrDelay")).as("mx"), avg(col("DepDelay")).as("a"))
        run(s"a2 sorted files=$n")(q)
      }
    }

    if (which == "dict") {
      // raw string group-by vs the dictionary-encoded copy: is the
      // int-keyed HashAggregate actually cheaper at 100M rows, and by
      // how much per shape?
      import graft.plans.{DictLayout, DictRegistry}
      import graft.pql.Pql
      val dPath = s"$dir/ontime_dict.parquet"
      val factPath = s"$dir/ontime.parquet"
      val idx =
        if (new java.io.File(s"$dir/_DICT_DONE").exists() &&
            new java.io.File(dPath).exists())
          DictLayout.load(spark, factPath, dPath)
        else {
          val i = DictLayout.build(spark, t, factPath, dPath,
            Seq("Carrier", "Origin", "Dest", "OriginState"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/_DICT_DONE"),
            java.util.Arrays.asList("ok"))
          i
        }
      exec(idx.encoded)
      Graft.enable(spark)
      val shapes = Seq(
        "a4" -> "SELECT count(*) FROM ontime GROUP BY Carrier TOP 20",
        "a5" -> "SELECT avg(ArrDelay) FROM ontime WHERE Cancelled = 0 GROUP BY Origin, Dest TOP 100",
        "a6" -> "SELECT sum(DepDelay), count(*) FROM ontime WHERE ArrDelay > 0 GROUP BY DaysSinceEpoch, Carrier, OriginState TOP 100")
      val loader: String => DataFrame = _ => t
      (1 to 2).foreach { r =>
        shapes.foreach { case (n, pql) =>
          run(s"$n raw  r$r")(Pql.toDataFrame(Pql.parse(pql), loader))
        }
        DictRegistry.register(factPath, idx)
        try shapes.foreach { case (n, pql) =>
          val df = Pql.toDataFrame(Pql.parse(pql), loader)
          require(df.queryExecution.executedPlan.toString.contains("ontime_dict"),
            s"$n did not route")
          run(s"$n dict r$r")(df)
        } finally DictRegistry.unregister(factPath)
      }
    }

    if (which == "dict2") {
      // isolate WHERE the dict-copy slowdown lives: routing rewrite vs
      // the encoded copy's storage shape (nullable int + 32 files)
      val enc = spark.read.parquet(s"$dir/ontime_dict.parquet")
      exec(enc)
      run("raw  groupBy(Carrier) cnt")(
        t.groupBy(col("Carrier")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc).limit(20))
      run("dict groupBy(Carrier__did) cnt")(
        enc.groupBy(col("Carrier__did")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc).limit(20))
      run("raw  count(*) scan")(t.select(col("Carrier")).groupBy().count())
      run("dict count(*) scan")(enc.select(col("Carrier__did")).groupBy().count())
      // non-null re-write of just the code column, 64 files
      val nn = s"$dir/probe_dict_nn.parquet"
      if (!new java.io.File(nn).exists()) {
        enc.select(coalesce(col("Carrier__did"), lit(0)).as("c0"))
          .repartition(64).write.mode("overwrite").parquet(nn)
      }
      val encNN = spark.read.parquet(nn)
      exec(encNN)
      run("dictNN groupBy(c0) cnt")(
        encNN.groupBy(col("c0")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc).limit(20))
    }

    if (which == "neardup") {
      // lazy-vs-cached staged near-dup at the sf100 point (10M docs,
      // 64 hashes / 16 bands — the recorded p4 configuration): the
      // lazy plan re-evaluates candidate generation 3× per action and
      // the shingled-docs subtree 2×; the cached plan runs each once
      val ndDir = s"${BenchScale.dataRoot}/scale_sf100"
      val ndRows = 10000000L
      graft.queries.ScaleDocs.ensureDocs(spark, ndDir, ndRows)
      val docs = spark.read.parquet(s"$ndDir/documents.parquet")
      val sigPath = s"$ndDir/minhash_sigs_probe.parquet"
      if (!new java.io.File(sigPath).exists()) {
        graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 64)
          .write.mode("overwrite").parquet(sigPath)
      }
      val sigs = spark.read.parquet(sigPath)
      def timeIt(name: String, reps: Int)(f: => Unit): Unit = {
        val ts = (1 to reps).map { _ => System.gc(); time(f) }
        println(f"[probe] $name%-40s p50=${p50(ts)}%.3f reps=${ts.map(x => f"$x%.3f").mkString(",")}")
      }
      timeIt("p4 cached staged", 3) {
        val r = graft.operators.Dedup.nearDupPairsStagedCached(
          docs, "doc_id", "text", sigs, numHashes = 64, bands = 16)
        r.pairs.count(); r.unpersist(); ()
      }
      timeIt("p4 lazy staged", 2) {
        graft.operators.Dedup.nearDupPairsStaged(
          docs, "doc_id", "text", sigs, numHashes = 64, bands = 16).count(); ()
      }
      // leave the probe signature segment for re-probing; it is
      // rebuilt only when absent and sits beside the scale data
    }

    if (which == "p4cfg") {
      // VERDICT r8 item 6: candidate-stage config sweep at 10M docs —
      // does widening the signature (16 hashes) pay at the SF1000
      // scale configuration? Funnel metrics + wall time + recall per
      // (numHashes, bands); recall bar 0.99 asserted like the bench.
      val ndDir = s"${BenchScale.dataRoot}/scale_sf100"
      val ndRows = 10000000L
      graft.queries.ScaleDocs.ensureDocs(spark, ndDir, ndRows)
      val docs = spark.read.parquet(s"$ndDir/documents.parquet")
      val planted = graft.queries.ScaleDocs.plantedPairs(spark, ndRows)
      val plantedN = planted.count()
      Seq((8, 4), (16, 4), (16, 8)).foreach { case (nh, nb) =>
        val sigPath = s"$ndDir/minhash_sigs_probe_${nh}_$nb.parquet"
        val sigSecs = time {
          if (!new java.io.File(sigPath).exists()) {
            graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", nh)
              .write.mode("overwrite").parquet(sigPath)
          }
        }
        val sigs = spark.read.parquet(sigPath)
        val staged = graft.operators.Dedup.nearDupPairsStagedCached(
          docs, "doc_id", "text", sigs, numHashes = nh, bands = nb)
        val cands = staged.candidateCount
        val verified = staged.pairs.count()
        val hit = staged.pairs.select(col("id_a"), col("id_b"))
          .join(planted, Seq("id_a", "id_b")).count()
        staged.unpersist()
        val recall = if (plantedN == 0) 1.0 else hit.toDouble / plantedN
        System.gc()
        val ts = (1 to 2).map { _ =>
          val t = time {
            val r = graft.operators.Dedup.nearDupPairsStagedCached(
              docs, "doc_id", "text", sigs, numHashes = nh, bands = nb)
            r.pairs.count(); r.unpersist()
          }
          System.gc(); t
        }
        println(f"[probe] p4cfg h=$nh%2d b=$nb%2d sig=${sigSecs}%.1fs " +
          f"cand=$cands verified=$verified recall=$recall%.4f " +
          f"p50=${p50(ts)}%.1f reps=${ts.map(x => f"$x%.1f").mkString(",")}")
        deleteRec(new java.io.File(sigPath))
      }
    }

    if (which == "knnpacked") {
      // array<float> vs packed-binary knn at the sf100 point (10M × 64
      // dims, the p5 shape): same 16 queries, k=10, answers asserted
      // set-equal; the packed copy is the fixed-width raw-forward-
      // index layout an embedding store would persist
      import graft.operators.Similarity
      val kDir = s"${BenchScale.dataRoot}/scale_sf100"
      val emb = spark.read.parquet(s"$kDir/emb_cells.parquet")
        .select(col("vec_id"), col("embedding"))
      val packedPath = s"$kDir/emb_packed_probe.parquet"
      if (!new java.io.File(packedPath).exists()) {
        emb.select(col("vec_id"),
            graft.functions.GraftFunctions.packFloats(col("embedding")).as("embedding"))
          .write.mode("overwrite").parquet(packedPath)
      }
      val packed = spark.read.parquet(packedPath)
      val qA = emb.filter(col("vec_id") < 16).cache(); qA.count()
      val qP = packed.filter(col("vec_id") < 16).cache(); qP.count()
      val arrSet = Similarity.knnJoin(qA, "vec_id", emb, "vec_id", "embedding", 10,
        excludeSelf = true).select("query_id", "corpus_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pkSet = Similarity.knnJoin(qP, "vec_id", packed, "vec_id", "embedding", 10,
        excludeSelf = true).select("query_id", "corpus_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      require(arrSet == pkSet, "packed knn answers diverged from array knn")
      def timeIt(name: String, reps: Int)(f: => Unit): Unit = {
        val ts = (1 to reps).map { _ => System.gc(); time(f) }
        println(f"[probe] $name%-40s p50=${p50(ts)}%.3f reps=${ts.map(x => f"$x%.3f").mkString(",")}")
      }
      timeIt("p5 knn array<float>", 3) {
        Similarity.knnJoin(qA, "vec_id", emb, "vec_id", "embedding", 10,
          excludeSelf = true).count(); ()
      }
      timeIt("p5 knn packed binary", 3) {
        Similarity.knnJoin(qP, "vec_id", packed, "vec_id", "embedding", 10,
          excludeSelf = true).count(); ()
      }
    }

    if (which == "all" || which == "page") {
      val s2 = () => t.select(col("DaysSinceEpoch"), col("FlightNum"), col("Origin"))
        .orderBy(col("DaysSinceEpoch"), col("FlightNum"))
        .limit(1100)
      run("s2 baseline limit1100")(s2())
      // packed single-long sort key: both columns are non-negative ints
      val packed = () => t.select(col("DaysSinceEpoch"), col("FlightNum"), col("Origin"),
          (col("DaysSinceEpoch").cast("long") * 1000000L + col("FlightNum")).as("__k"))
        .orderBy(col("__k")).limit(1100)
        .select(col("DaysSinceEpoch"), col("FlightNum"), col("Origin"))
      run("s2 packed-long key")(packed())
    }

    spark.stop()
  }
}
