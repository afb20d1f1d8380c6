package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{DictLayout, DictRegistry}
import graft.sources.Tables

/** Dictionary-encoded dimension layout ([[graft.plans.DictLayout]]):
  * every routed plan must (a) scan the ENCODED copy, not the raw
  * table, and (b) return cell-identical results to the raw plan — the
  * same two-sided contract StarTreeSpec pins for the rollup. */
class DictLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val factPath = s"$sfDir/lineitem.parquet"
  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_dict_${name}_${ProcessHandle.current().pid()}"

  private lazy val fact = Tables.load(spark, sfDir, "lineitem")
  private lazy val idx = {
    graft.Graft.enable(spark)
    DictLayout.build(spark, fact, factPath, tmp("li"),
      Seq("l_returnflag", "l_linestatus"))
  }

  private def assertRouted(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem.parquet"),
      s"plan still scans the raw table:\n$plan")
    assert(plan.contains("graft_dict_li"),
      s"plan does not scan the encoded copy:\n$plan")
  }

  private def withDict[A](body: => A): A = {
    DictRegistry.register(factPath, idx)
    try body finally DictRegistry.unregister(factPath)
  }

  private def compare(build: => DataFrame): Unit = {
    val raw = build.collect().map(_.toSeq).toSet
    withDict {
      val routed = build
      assertRouted(routed)
      assert(routed.collect().map(_.toSeq).toSet === raw)
    }
  }

  test("group-by on dict columns routes and matches the raw plan") {
    compare {
      fact.groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 3).as("s"),
          round(avg($"l_extendedprice"), 3).as("a"))
    }
  }

  test("EQ / IN / range / null predicates translate to id space and match") {
    compare {
      fact.filter($"l_linestatus" === "F" && $"l_returnflag".isin("A", "R"))
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("cnt"))
    }
    compare {
      fact.filter($"l_returnflag" > "A" && $"l_returnflag" <= "R")
        .groupBy($"l_returnflag")
        .agg(round(sum($"l_quantity"), 3).as("s"))
    }
    compare {
      fact.filter($"l_returnflag".isNotNull && $"l_linestatus" >= "F")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("cnt"))
    }
  }

  test("absent literals keep raw semantics (empty result, no error)") {
    compare {
      fact.filter($"l_returnflag" === "ZZZ_NOT_A_VALUE")
        .groupBy($"l_linestatus").agg(count(lit(1)).as("cnt"))
    }
    compare {
      fact.filter($"l_returnflag".isin("NOPE", "ALSO_NOPE"))
        .groupBy($"l_returnflag").agg(count(lit(1)).as("cnt"))
    }
  }

  test("non-translatable predicates fall back to per-row decode, still routed") {
    compare {
      fact.filter($"l_returnflag".startsWith("A"))
        .groupBy($"l_returnflag").agg(count(lit(1)).as("cnt"))
    }
  }

  test("aggregates OVER dict columns decode correctly") {
    compare {
      fact.groupBy($"l_returnflag")
        .agg(min($"l_linestatus").as("min_st"), max($"l_linestatus").as("max_st"),
          countDistinct($"l_linestatus").as("dc"))
    }
  }

  test("global aggregate with a dict predicate routes") {
    compare {
      fact.filter($"l_returnflag" === "A")
        .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 3).as("s"))
    }
  }

  test("mixed dict / non-dict group keys and predicates route") {
    compare {
      fact.filter($"l_linenumber" <= 3 && $"l_returnflag" =!= "N")
        .groupBy($"l_returnflag", $"l_linenumber")
        .agg(count(lit(1)).as("cnt"))
    }
  }

  test("TOP-n ordering above the routed aggregate keeps exprIds resolvable") {
    compare {
      fact.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"l_returnflag".asc)
        .limit(3)
    }
  }

  test("ordered selection routes: filter + sort + limit (late decode)") {
    // total order via unique tiebreak so raw and routed pick identical
    // rows at the limit boundary
    compare {
      fact.filter($"l_returnflag" === "A")
        .select($"l_returnflag", $"l_linestatus", $"l_quantity",
          $"l_orderkey", $"l_linenumber")
        .orderBy($"l_quantity".desc, $"l_orderkey".asc, $"l_linenumber".asc)
        .limit(25)
    }
    withDict {
      val df = fact.filter($"l_returnflag" === "A")
        .select($"l_linestatus", $"l_quantity", $"l_orderkey", $"l_linenumber")
        .orderBy($"l_quantity".desc, $"l_orderkey".asc, $"l_linenumber".asc)
        .limit(25)
      val plan = df.queryExecution.executedPlan.toString
      // the top-K operator fuses the decode projection → dictionary
      // values materialize for the LIMIT rows only
      assert(plan.contains("TakeOrderedAndProject"),
        s"selection did not fuse into TakeOrderedAndProject:\n$plan")
      assert(plan.contains("__did"),
        s"selection does not run in id space:\n$plan")
    }
  }

  test("ordered selection routes: offset page") {
    compare {
      fact.select($"l_orderkey", $"l_linenumber", $"l_returnflag")
        .orderBy($"l_orderkey".asc, $"l_linenumber".asc)
        .offset(100).limit(20)
    }
  }

  test("ORDER BY a dict column sorts by id with identical order") {
    compare {
      fact.select($"l_returnflag", $"l_linestatus", $"l_orderkey", $"l_linenumber")
        .orderBy($"l_returnflag".asc, $"l_orderkey".asc, $"l_linenumber".asc)
        .limit(30)
    }
    compare {
      fact.select($"l_returnflag", $"l_orderkey", $"l_linenumber")
        .orderBy($"l_returnflag".desc, $"l_orderkey".desc, $"l_linenumber".desc)
        .limit(30)
    }
  }

  test("unlimited sort still routes and matches row-for-row") {
    val build = () => fact.filter($"l_linestatus" === "F" && $"l_quantity" > 49)
      .select($"l_returnflag", $"l_orderkey")
      .orderBy($"l_orderkey".asc, $"l_returnflag".asc)
    val raw = build().collect().map(_.toSeq).toSeq
    withDict {
      val routed = build()
      assertRouted(routed)
      assert(routed.collect().map(_.toSeq).toSeq === raw)
    }
  }

  test("lookupExact refuses file-subset paths that prefix-lookup accepts") {
    idx // force the build
    DictRegistry.register(factPath, idx)
    try {
      val sub = s"$factPath/part-00000.parquet"
      assert(DictRegistry.lookup(sub).isDefined)
      assert(DictRegistry.lookupExact(sub).isEmpty,
        "a pruned file-subset read must not route onto the full encoded copy")
      assert(DictRegistry.lookupExact(factPath).isDefined)
    } finally DictRegistry.unregister(factPath)
  }

  test("unregistered tables and non-attribute groupings are untouched") {
    // no registration at all → raw scan
    val plain = fact.groupBy($"l_returnflag").agg(count(lit(1)))
    assert(plain.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
    // expression grouping → rule bails, raw scan even when registered
    withDict {
      val exprGroup = fact.groupBy(substring($"l_returnflag", 1, 1).as("m"))
        .agg(count(lit(1)).as("cnt"))
      assert(exprGroup.queryExecution.executedPlan.toString
        .contains("lineitem.parquet"))
    }
  }

  test("load reopens a built segment with identical dictionaries") {
    idx // force the build
    val reloaded = DictLayout.load(spark, factPath, tmp("li"))
    assert(reloaded.dicts.keySet === idx.dicts.keySet)
    reloaded.dicts.foreach { case (c, arr) =>
      assert(arr.toSeq === idx.dicts(c).toSeq, s"dictionary drift for $c")
    }
    DictRegistry.register(factPath, reloaded)
    try {
      val routed = fact.groupBy($"l_returnflag").agg(count(lit(1)).as("cnt"))
      assertRouted(routed)
    } finally DictRegistry.unregister(factPath)
  }

  test("high-cardinality columns are rejected at build") {
    val wide = spark.range(0, DictLayout.MaxCardinality + 1L)
      .select(format_string("v%09d", $"id").as("v"))
    val e = intercept[IllegalArgumentException] {
      DictLayout.build(spark, wide, "/nope", tmp("wide"), Seq("v"))
    }
    assert(e.getMessage.contains("cap"))
  }

  test("non-string dimensions are rejected at build") {
    val e = intercept[IllegalArgumentException] {
      DictLayout.build(spark, fact, "/nope", tmp("int"), Seq("l_linenumber"))
    }
    assert(e.getMessage.contains("StringType"))
  }

  test("supplementary-plane values: dictionary order matches UTF8 binary order") {
    // "ｚ" (U+FF5A, high BMP) sorts BEFORE "😀" (U+1F600, supplementary)
    // in UTF-8 byte order but AFTER it in UTF-16 code-unit (Java
    // String) order — a dictionary sorted with the wrong comparator
    // mis-encodes at build (silent nulls) and mis-orders routed sorts
    val uPath = tmp("uni_raw")
    val uEnc = tmp("uni_enc")
    Seq(("a", 1L), ("ｚ", 2L), ("😀", 3L), ("b", 4L),
      ("😀", 5L), ("ｚ", 6L))
      .toDF("dim", "m").write.mode("overwrite").parquet(uPath)
    val uFact = spark.read.parquet(uPath)
    val uIdx = DictLayout.build(spark, uFact, uPath, uEnc, Seq("dim"))
    // every value must be encodable (a UTF-16-sorted dictionary makes
    // binarySearch miss the emoji at build → null codes)
    val nullCodes = uIdx.encoded.filter(col("dim__did").isNull).count()
    assert(nullCodes === 0, "dictionary build silently dropped values")
    graft.Graft.enable(spark)
    DictRegistry.register(uPath, uIdx)
    try {
      def routedCheck(build: => DataFrame): Unit = {
        val routed = build
        val plan = routed.queryExecution.executedPlan.toString
        assert(plan.contains("uni_enc"), s"not routed:\n$plan")
      }
      // EQ on the supplementary-plane literal must hit its rows
      val eq = uFact.filter($"dim" === "😀")
        .groupBy($"dim").agg(count(lit(1)).as("cnt"))
      routedCheck(eq)
      assert(eq.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        Seq(("😀", 2L)))
      // range: > fullwidth z must select exactly the emoji (UTF-8
      // binary order, matching Spark's raw string sort)
      val rawRange = uFact.filter($"dim" > "ｚ")
        .groupBy($"dim").agg(count(lit(1)).as("cnt")).collect().map(_.toSeq).toSet
      val routedRange = uFact.filter($"dim" > "ｚ")
        .groupBy($"dim").agg(count(lit(1)).as("cnt"))
      routedCheck(routedRange)
      assert(routedRange.collect().map(_.toSeq).toSet === rawRange)
      // routed ORDER BY on the dict column == raw string sort
      val rawOrder = uFact.select($"dim", $"m").orderBy($"dim".asc, $"m".asc)
        .collect().map(_.toSeq).toSeq
      val routedOrder = uFact.select($"dim", $"m").orderBy($"dim".asc, $"m".asc)
      assert(routedOrder.collect().map(_.toSeq).toSeq === rawOrder)
    } finally DictRegistry.unregister(uPath)
  }

  test("self-join of two routed aggregates gets fresh exprIds per splice") {
    withDict {
      val l = fact.groupBy($"l_returnflag").agg(count(lit(1)).as("cnt_l"))
      val r = fact.groupBy($"l_returnflag").agg(sum($"l_quantity").as("s_r"))
      val joined = l.join(r, "l_returnflag").orderBy($"l_returnflag")
      assertRouted(joined)
      val rows = joined.collect()
      assert(rows.nonEmpty)
      // values must match the raw twin computed without routing
      DictRegistry.unregister(factPath)
      val raw = fact.groupBy($"l_returnflag").agg(count(lit(1)).as("cnt_l"))
        .join(fact.groupBy($"l_returnflag").agg(sum($"l_quantity").as("s_r")),
          "l_returnflag").orderBy($"l_returnflag").collect()
      DictRegistry.register(factPath, idx)
      assert(rows.map(_.toSeq).toSeq === raw.map(_.toSeq).toSeq)
    }
  }

  test("composed route: sorted encoded subset + id-space sort + late decode") {
    import graft.pql.Pql
    // a copy of lineitem range-partitioned on l_orderkey (the sorted
    // segment), dict-encoded WITH the same layout — the two levers the
    // r7 design kept mutually exclusive
    val rawPath = tmp("comp_raw")
    val encPath = tmp("comp_enc")
    fact.repartitionByRange(8, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey", $"l_linenumber")
      .write.mode("overwrite").parquet(rawPath)
    val sortedRaw = spark.read.parquet(rawPath)
    val cIdx = DictLayout.build(spark, sortedRaw, rawPath, encPath,
      Seq("l_returnflag", "l_linestatus"),
      layoutBy = Seq("l_orderkey", "l_linenumber"))
    graft.Graft.enable(spark)
    DictRegistry.register(rawPath, cIdx)
    try {
      val resolve: String => org.apache.spark.sql.DataFrame = {
        case "li_sorted" => sortedRaw
        case n => graft.sources.Tables.load(spark, sfDir, n)
      }
      val pql = "SELECT l_orderkey, l_linenumber, l_returnflag FROM li_sorted " +
        "ORDER BY l_orderkey, l_linenumber LIMIT 40, 25"
      val df = Pql.toDataFrame(Pql.parse(pql), resolve)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("comp_enc"), s"page not composed onto the encoded copy:\n$plan")
      // the decode projection fuses INTO TakeOrderedAndProject (whose
      // simpleString hides the project list) — assert it on the
      // optimized plan + the fused top-K operator on the physical one
      assert(df.queryExecution.optimizedPlan.toString.contains("dict_decode"),
        s"page does not late-decode:\n${df.queryExecution.optimizedPlan}")
      assert(plan.contains("TakeOrderedAndProject"),
        s"page did not fuse into the top-K operator:\n$plan")
      assert(df.inputFiles.length < cIdx.encoded.inputFiles.length,
        s"encoded subset not pruned (${df.inputFiles.length})")
      // values: (l_orderkey, l_linenumber) is a total order over the
      // page, so full-row equality with the raw plan holds
      val expect = fact.select($"l_orderkey", $"l_linenumber", $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber").offset(40).limit(25)
        .collect().map(_.toSeq).toSeq
      assert(df.collect().map(_.toSeq).toSeq === expect)
      // dict column as the SECONDARY sort key: the id-space sort and
      // the boundary-tightening probe both run on the int code column,
      // whose order equals value order by the UTF8-binary dictionary
      val dpql = "SELECT l_orderkey, l_returnflag, l_linenumber FROM li_sorted " +
        "ORDER BY l_orderkey, l_returnflag LIMIT 10, 30"
      val ddf = Pql.toDataFrame(Pql.parse(dpql), resolve)
      assert(ddf.queryExecution.executedPlan.toString.contains("comp_enc"))
      val dexp = fact.select($"l_orderkey", $"l_returnflag", $"l_linenumber")
        .orderBy($"l_orderkey", $"l_returnflag").offset(10).limit(30)
        .select($"l_orderkey", $"l_returnflag")
        .collect().map(_.toSeq).toSeq
      // (l_orderkey, l_returnflag) may tie inside a page row-set, so
      // compare the ORDER-pinned columns only
      assert(ddf.select($"l_orderkey", $"l_returnflag")
        .collect().map(_.toSeq).toSeq === dexp)
      // a RAW-column filtered page composes too (r9): the predicate
      // passes through by name and the subset walk adaptively doubles
      val fpql = "SELECT l_orderkey, l_returnflag FROM li_sorted " +
        "WHERE l_quantity > 10 ORDER BY l_orderkey LIMIT 15"
      val fdf = Pql.toDataFrame(Pql.parse(fpql), resolve)
      assert(fdf.queryExecution.executedPlan.toString.contains("comp_enc"),
        "raw-predicate page should compose onto the encoded copy")
      val fexp = fact.filter($"l_quantity" > 10)
        .select($"l_orderkey", $"l_returnflag")
        .orderBy($"l_orderkey").limit(15)
        .collect().map(_.toSeq).toSeq
      assert(fdf.collect().map(_.toSeq).toSeq.map(_.head) === fexp.map(_.head))

      // DICT-column predicates translate to id space (EQ pushes as an
      // int filter on the code column), decode stays post-cut
      val dfpql = "SELECT l_orderkey, l_linenumber, l_returnflag FROM li_sorted " +
        "WHERE l_returnflag = 'R' AND l_quantity > 5 " +
        "ORDER BY l_orderkey, l_linenumber LIMIT 5, 20"
      val dfdf = Pql.toDataFrame(Pql.parse(dfpql), resolve)
      val dplan = dfdf.queryExecution.executedPlan.toString
      assert(dplan.contains("comp_enc"), s"dict-filtered page not composed:\n$dplan")
      assert(dplan.contains("l_returnflag__did"),
        s"dict predicate must run in id space:\n$dplan")
      assert(dplan.contains("TakeOrderedAndProject"), dplan)
      val dfexp = fact.filter($"l_returnflag" === "R" && $"l_quantity" > 5)
        .select($"l_orderkey", $"l_linenumber", $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber").offset(5).limit(20)
        .collect().map(_.toSeq).toSeq
      assert(dfdf.collect().map(_.toSeq).toSeq === dfexp)

      // range + IN + IS NOT NULL on the dict column; REGEXP falls back
      // to per-row decode but STILL composes
      val rpql = "SELECT l_orderkey, l_linenumber, l_linestatus FROM li_sorted " +
        "WHERE l_linestatus IN ('F', 'O') AND l_returnflag >= 'N' " +
        "ORDER BY l_orderkey, l_linenumber LIMIT 25"
      val rdf = Pql.toDataFrame(Pql.parse(rpql), resolve)
      assert(rdf.queryExecution.executedPlan.toString.contains("comp_enc"))
      val rexp = fact.filter($"l_linestatus".isin("F", "O") && $"l_returnflag" >= "N")
        .select($"l_orderkey", $"l_linenumber", $"l_linestatus")
        .orderBy($"l_orderkey", $"l_linenumber").limit(25)
        .collect().map(_.toSeq).toSeq
      assert(rdf.collect().map(_.toSeq).toSeq === rexp)
      val xpql = "SELECT l_orderkey, l_linenumber FROM li_sorted " +
        "WHERE REGEXP_LIKE(l_returnflag, '^[AR]$') " +
        "ORDER BY l_orderkey, l_linenumber LIMIT 20"
      val xdf = Pql.toDataFrame(Pql.parse(xpql), resolve)
      val xplan = xdf.queryExecution.executedPlan.toString
      assert(xplan.contains("comp_enc"), s"regexp page should still compose:\n$xplan")
      assert(xdf.queryExecution.optimizedPlan.toString.contains("dict_decode"),
        "non-translatable dict predicate must decode per row")
      val xexp = fact.filter($"l_returnflag".rlike("^[AR]$"))
        .select($"l_orderkey", $"l_linenumber")
        .orderBy($"l_orderkey", $"l_linenumber").limit(20)
        .collect().map(_.toSeq).toSeq
      assert(xdf.collect().map(_.toSeq).toSeq === xexp)

      // absent dict literal: empty result, no error, still composed-or-
      // correct (id -1 never matches a stored row)
      val apql = "SELECT l_orderkey FROM li_sorted WHERE l_returnflag = 'Z' " +
        "ORDER BY l_orderkey LIMIT 10"
      val adf = Pql.toDataFrame(Pql.parse(apql), resolve)
      assert(adf.count() === 0)
    } finally DictRegistry.unregister(rawPath)
  }

  test("dict_decode fails loudly (named) on an out-of-range id") {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.unsafe.types.UTF8String
    val small = Array(UTF8String.fromString("x"), UTF8String.fromString("y"))
    val bad = spark.range(1).select(GraftSqlBridge.column(
      graft.functions.exprs.DictDecode(
        GraftSqlBridge.expression(lit(17)), small)).as("v"))
    val e = intercept[Throwable] { bad.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("dict_decode")),
      s"expected a named dict_decode failure, got: $e")
  }
}
