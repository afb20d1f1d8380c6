package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import graft.pql.{BrokerServer, FilterOptimizer}
import graft.pql.Pql._
import graft.pql.FilterOptimizer._

/** Per-request filter-tree optimizers + optimizationFlags toggles
  * ([[graft.pql.FilterOptimizer]]): flag parsing, the three rewrites'
  * reference semantics, gating, and the debugOptions plumbing through
  * a live broker socket. */
class FilterOptimizerSpec extends SparkSpec {

  private def lit(i: Int) = NumLit(BigDecimal(i))
  private def eq(c: String, i: Int) = Cmp(Ident(c), "=", lit(i))

  test("flag parsing: +only, -only, mixed rejected, bad prefix rejected") {
    val plus = parseFlags("+flattenNestedPredicates, +rangeMergeOptimizer")
    assert(plus.isEnabled("flattenNestedPredicates"))
    assert(!plus.isEnabled("multipleOrEqualitiesToInClause")) // + flips default to deny
    val minus = parseFlags("-multipleOrEqualitiesToInClause")
    assert(minus.isEnabled("flattenNestedPredicates"))
    assert(!minus.isEnabled("multipleOrEqualitiesToInClause"))
    intercept[IllegalArgumentException](parseFlags("+a,-b"))
    intercept[IllegalArgumentException](parseFlags("noPrefix"))
  }

  test("debugOptions string parses as ;-separated k=v pairs") {
    assert(parseDebugOptions("optimizationFlags=+a; routingOptions=x") ===
      Map("optimizationFlags" -> "+a", "routingOptions" -> "x"))
  }

  test("flatten collapses same-operator nesting, capped at depth 5") {
    val nested = AndP(Seq(eq("a", 1), AndP(Seq(eq("b", 2), AndP(Seq(eq("c", 3)))))))
    assert(flatten(nested) === AndP(Seq(eq("a", 1), eq("b", 2), eq("c", 3))))
    val or = OrP(Seq(OrP(Seq(eq("a", 1), eq("a", 2))), eq("a", 3)))
    assert(flatten(or) === OrP(Seq(eq("a", 1), eq("a", 2), eq("a", 3))))
    // AND under OR is not collapsible
    val mixed = OrP(Seq(AndP(Seq(eq("a", 1), eq("b", 2))), eq("c", 3)))
    assert(flatten(mixed) === mixed)
    // beyond the depth cap the innermost nesting survives
    def deep(n: Int): Pred =
      if (n == 0) eq("x", 0) else AndP(Seq(eq("a", n), deep(n - 1)))
    val d = flatten(deep(8))
    assert(d.asInstanceOf[AndP].ps.exists(_.isInstanceOf[AndP]) === false ||
      d.asInstanceOf[AndP].ps.size < 9) // partially flattened, not fully
  }

  test("orToIn merges OR'd equalities and INs per column") {
    // a=1 OR a=2 OR a IN (3) → a IN (1,2,3), OR eliminated
    val p = OrP(Seq(eq("a", 1), eq("a", 2), In(Ident("a"), Seq(lit(3)), false)))
    assert(orToIn(p) === In(Ident("a"), Seq(lit(1), lit(2), lit(3)), false))
    // duplicates collapse: a=1 OR a=1 → a=1
    assert(orToIn(OrP(Seq(eq("a", 1), eq("a", 1)))) === eq("a", 1))
    // numeric identity: a=1 OR a=1.0 is one value
    assert(orToIn(OrP(Seq(eq("a", 1), Cmp(Ident("a"), "=", NumLit(BigDecimal("1.0")))))) ===
      eq("a", 1))
    // multi-column + non-equality sibling: merged per column, sibling kept
    val q = OrP(Seq(eq("a", 1), eq("a", 2), eq("b", 7), Cmp(Ident("c"), ">", lit(0))))
    assert(orToIn(q) === OrP(Seq(
      In(Ident("a"), Seq(lit(1), lit(2)), false), eq("b", 7),
      Cmp(Ident("c"), ">", lit(0)))))
    // nothing to merge → tree unchanged
    val noop = OrP(Seq(eq("a", 1), eq("b", 2)))
    assert(orToIn(noop) === noop)
    // negated IN is not mergeable
    val neg = OrP(Seq(eq("a", 1), In(Ident("a"), Seq(lit(2)), true)))
    assert(orToIn(neg) ===
      OrP(Seq(eq("a", 1), In(Ident("a"), Seq(lit(2)), true))))
    // recursion reaches ORs under AND
    assert(orToIn(AndP(Seq(OrP(Seq(eq("a", 1), eq("a", 2))), eq("b", 3)))) ===
      AndP(Seq(In(Ident("a"), Seq(lit(1), lit(2)), false), eq("b", 3))))
  }

  test("rangeMerge intersects conjunctive time-column ranges") {
    val t = "daysSinceEpoch"
    // t > 5 AND t <= 10 AND other → AND(other, t>5 AND t<=10 folded)
    val p = AndP(Seq(
      Cmp(Ident(t), ">", lit(5)), Cmp(Ident(t), "<=", lit(10)), eq("a", 1)))
    assert(rangeMerge(p, t) === AndP(Seq(eq("a", 1),
      AndP(Seq(Cmp(Ident(t), ">", lit(5)), Cmp(Ident(t), "<=", lit(10)))))))
    // BETWEEN 0 AND 20 ∩ BETWEEN 10 AND 30 → BETWEEN 10 AND 20 (pure
    // ranges collapse to the single merged node)
    val b = AndP(Seq(
      Between(Ident(t), lit(0), lit(20)), Between(Ident(t), lit(10), lit(30))))
    assert(rangeMerge(b, t) === Between(Ident(t), lit(10), lit(20)))
    // tighter bound wins regardless of order; equal bound ANDs inclusivity
    val c = AndP(Seq(
      Cmp(Ident(t), ">=", lit(10)), Cmp(Ident(t), ">", lit(10)),
      Between(Ident(t), lit(0), lit(50))))
    assert(rangeMerge(c, t) ===
      AndP(Seq(Cmp(Ident(t), ">", lit(10)), Cmp(Ident(t), "<=", lit(50)))))
    // non-time columns untouched; OR children optimized without pull-up
    val o = OrP(Seq(
      AndP(Seq(Between(Ident(t), lit(0), lit(9)), Between(Ident(t), lit(5), lit(20)))),
      eq("a", 1)))
    assert(rangeMerge(o, t) === OrP(Seq(Between(Ident(t), lit(5), lit(9)), eq("a", 1))))
  }

  test("optimize respects flags: family gate and per-optimizer names") {
    val p = OrP(Seq(eq("a", 1), eq("a", 2)))
    val merged = In(Ident("a"), Seq(lit(1), lit(2)), false)
    assert(optimize(p, None, None) === merged)
    assert(optimize(p, None, Some(parseFlags("-multipleOrEqualitiesToInClause"))) === p)
    assert(optimize(p, None, Some(parseFlags("-filterQueryTree"))) === p)
    // reference quirk (BrokerRequestOptimizer.java:76-84): a +list that
    // omits filterQueryTree disables the whole filter family
    assert(optimize(p, None, Some(parseFlags("+multipleOrEqualitiesToInClause"))) === p)
    assert(optimize(p, None,
      Some(parseFlags("+filterQueryTree,+multipleOrEqualitiesToInClause"))) === merged)
    // + list excludes unlisted optimizers
    val nested = AndP(Seq(eq("x", 1), AndP(Seq(OrP(Seq(eq("a", 1), eq("a", 2)))))))
    val flat = optimize(nested, None,
      Some(parseFlags("+filterQueryTree,+flattenNestedPredicates")))
    assert(flat === AndP(Seq(eq("x", 1), OrP(Seq(eq("a", 1), eq("a", 2))))))
  }

  test("optimized filters compile to the same results (semantic no-op)") {
    import graft.sources.Tables
    val q1 = parse("SELECT count(*) FROM lineitem WHERE l_linenumber = 1 OR l_linenumber = 2 OR l_linenumber = 3")
    val opt = q1.copy(where = q1.where.map(w => optimize(w, None, None)))
    assert(opt.where.get.isInstanceOf[In]) // rewrite actually fired
    val resolve = (n: String) => Tables.load(spark, sfDir, n)
    val a = toDataFrame(q1, resolve).collect().map(_.toSeq)
    val b = toDataFrame(opt, resolve).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  private def http(method: String, url: String, body: Option[String] = None): String = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val os = conn.getOutputStream
      try os.write(b.getBytes(StandardCharsets.UTF_8)) finally os.close()
    }
    val in = conn.getInputStream
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  test("broker: debugOptions flow end-to-end; bad flag list → code 700") {
    val broker = new BrokerServer(spark, sfDir,
      timeColumns = Map("lineitem" -> "l_linenumber"))
    val port = broker.start()
    try {
      val base = s"http://127.0.0.1:$port/query"
      val pql = "SELECT count(*) FROM lineitem WHERE l_returnflag = 'A' OR l_returnflag = 'R'"
      val plain = http("POST", base, Some(s"""{"pql": "$pql"}"""))
      assert(plain.contains("aggregationResults"), plain.take(300))
      // same query with the optimizer disabled answers identically
      val noOpt = http("POST", base, Some(
        s"""{"pql": "$pql", "debugOptions": "optimizationFlags=-multipleOrEqualitiesToInClause"}"""))
      def value(j: String) = """"value":\s*"?(\d+)"?""".r.findFirstMatchIn(j).map(_.group(1))
      assert(value(plain).isDefined && value(plain) === value(noOpt))
      // malformed flag entry (missing +/-) → QueryValidation error 700
      val bad = http("POST", base, Some(
        s"""{"pql": "$pql", "debugOptions": "optimizationFlags=oops"}"""))
      assert(bad.contains("\"errorCode\": 700"), bad.take(300))
      // a malformed debugOptions STRING (entry without '=') is the
      // same request error, not silently dropped options
      val badStr = http("POST", base, Some(
        s"""{"pql": "$pql", "debugOptions": "optimizationFlags+oops"}"""))
      assert(badStr.contains("\"errorCode\": 700"), badStr.take(300))
      // time-range merge path via GET debugOptions param
      val ranged = http("GET", s"$base?pql=" + java.net.URLEncoder.encode(
        "SELECT count(*) FROM lineitem WHERE l_linenumber >= 2 AND l_linenumber <= 5 AND l_linenumber >= 3",
        StandardCharsets.UTF_8) + "&debugOptions=" + java.net.URLEncoder.encode(
        "optimizationFlags=+filterQueryTree,+rangeMergeOptimizer", StandardCharsets.UTF_8))
      assert(ranged.contains("aggregationResults"), ranged.take(300))
      assert(value(ranged) === value(http("GET", s"$base?pql=" + java.net.URLEncoder.encode(
        "SELECT count(*) FROM lineitem WHERE l_linenumber >= 3 AND l_linenumber <= 5",
        StandardCharsets.UTF_8))))
    } finally broker.stop()
  }
}
