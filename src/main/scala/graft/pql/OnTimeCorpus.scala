package graft.pql

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, try_element_at, lit}
import org.apache.spark.sql.types._

/** The reference's 10,000-query golden corpus, executable: loader for
  * the `{"hsqls":[...], "pql":"..."}` query file, a deterministic
  * synthesizer for OnTime-schema data, and the H2-style multi-value
  * flattening.
  *
  * The reference's integration harness builds segments from an OnTime
  * Avro file and mirrors every record into an H2 table, splitting each
  * multi-value field into `<name>__MV0..4` scalar columns
  * (`ClusterIntegrationTestUtils.java:84-180`,
  * `MAX_NUM_ELEMENTS_IN_MULTI_VALUE_TO_COMPARE = 5` at line 70). The
  * data file itself is not shipped in the repo, so we synthesize rows
  * against the published schema
  * (`On_Time_On_Time_Performance_2014_100k_subset_nonulls.schema`),
  * drawing values from the literal pools mined out of the corpus's own
  * predicates — that guarantees the WHERE clauses have non-trivial
  * selectivity on both engines, so comparisons are not vacuous.
  *
  * Everything is seeded and iteration-ordered: the same (seed, rows)
  * always produces byte-identical data, so the DuckDB oracle can be
  * run against a parquet dump of the very frame the queries ran on.
  *
  * This file is test-harness plumbing, not engine code: driver-side
  * row building is bounded by `numRows` (thousands), and the corpus
  * file is a 10K-line local resource.
  */
object OnTimeCorpus {

  val ResourceDir = "/root/reference/pinot-integration-tests/src/test/resources"
  val CorpusPath = s"$ResourceDir/On_Time_On_Time_Performance_2014_100k_subset.test_queries_10K"
  val SchemaPath = s"$ResourceDir/On_Time_On_Time_Performance_2014_100k_subset_nonulls.schema"

  /** One corpus line: the PQL under test plus its paired H2 SQLs (one
    * per aggregation for aggregation queries, one for selections). */
  final case class Line(id: Int, pql: String, hsqls: Seq[String])

  // ---- corpus file ------------------------------------------------------

  /** Minimal JSON reader for the corpus line shape — the file is
    * machine-generated `{"hsqls":["…"],"pql":"…"}` with standard JSON
    * string escaping; no external JSON dependency needed. */
  private def jsonString(s: String, from: Int): (String, Int) = {
    require(s.charAt(from) == '"', s"expected string at $from")
    val sb = new StringBuilder
    var i = from + 1
    while (s.charAt(i) != '"') {
      val c = s.charAt(i)
      if (c == '\\') {
        val e = s.charAt(i + 1)
        e match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => throw new IllegalArgumentException(s"bad escape \\$other")
        }
      } else { sb.append(c); i += 1 }
    }
    (sb.toString, i + 1)
  }

  private def parseLine(id: Int, s: String): Line = {
    var pql: String = null
    val hsqls = Vector.newBuilder[String]
    var i = 0
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    skipWs(); require(s.charAt(i) == '{'); i += 1
    var done = false
    while (!done) {
      skipWs()
      val (key, i2) = jsonString(s, i); i = i2
      skipWs(); require(s.charAt(i) == ':'); i += 1; skipWs()
      key match {
        case "pql" =>
          val (v, i3) = jsonString(s, i); pql = v; i = i3
        case "hsqls" =>
          require(s.charAt(i) == '['); i += 1; skipWs()
          while (s.charAt(i) != ']') {
            val (v, i3) = jsonString(s, i); hsqls += v; i = i3
            skipWs()
            if (s.charAt(i) == ',') { i += 1; skipWs() }
          }
          i += 1
        case other => throw new IllegalArgumentException(s"unexpected key $other")
      }
      skipWs()
      if (s.charAt(i) == ',') i += 1 else done = true
    }
    Line(id, pql, hsqls.result())
  }

  def loadCorpus(path: String = CorpusPath): Vector[Line] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().zipWithIndex.collect {
      case (l, i) if l.trim.nonEmpty => parseLine(i, l.trim)
    }.toVector
    finally src.close()
  }

  // ---- literal-pool mining ---------------------------------------------

  /** Every (column → predicate literal) pair in the corpus, via the
    * PQL AST — the synthesized data draws from these pools so corpus
    * predicates select real subsets. */
  def minePools(lines: Seq[Line]): Map[String, Vector[Any]] = {
    val pools = mutable.Map.empty[String, mutable.LinkedHashSet[Any]]
    def add(e: Pql.Expr, v: Pql.Expr): Unit = (e, v) match {
      case (Pql.Ident(n), Pql.NumLit(x)) =>
        pools.getOrElseUpdate(n, mutable.LinkedHashSet.empty) += x
      case (Pql.Ident(n), Pql.StrLit(x)) =>
        pools.getOrElseUpdate(n, mutable.LinkedHashSet.empty) += x
      case _ => ()
    }
    def walk(p: Pql.Pred): Unit = p match {
      case Pql.Cmp(e, _, v) => add(e, v)
      case Pql.Between(e, lo, hi) => add(e, lo); add(e, hi)
      case Pql.In(e, vals, _) => vals.foreach(add(e, _))
      case Pql.AndP(ps) => ps.foreach(walk)
      case Pql.OrP(ps) => ps.foreach(walk)
      case _ => ()
    }
    lines.foreach { l =>
      try Pql.parse(l.pql).where.foreach(walk)
      catch { case _: IllegalArgumentException => () }
    }
    pools.map { case (k, v) => k -> v.toVector }.toMap
  }

  // ---- synthesis --------------------------------------------------------

  /** Deterministic OnTime-shaped rows. Per column: ~70% of values come
    * from its mined literal pool (typed), the rest fill a slightly
    * widened [min, max] range (numerics) or re-draw from the pool
    * (strings). Multi-value columns get 1–4 elements — the reference
    * harness compares at most 5 (`MAX_NUM_ELEMENTS_..._TO_COMPARE`),
    * so staying ≤5 keeps the H2 flattening lossless. */
  def synthesize(spark: SparkSession, schema: StructType,
      pools: Map[String, Vector[Any]], numRows: Int, seed: Long = 42L): DataFrame = {
    val rnd = new Random(seed)

    // typed pool + numeric range per column, resolved once
    final case class Gen(typed: Vector[Any], lo: Double, hi: Double)
    def resolve(name: String, dt: DataType): Gen = {
      val raw = pools.getOrElse(name, Vector.empty)
      val typed: Vector[Any] = dt match {
        case IntegerType => raw.collect { case d: BigDecimal if d.isWhole => d.toInt }
        case LongType => raw.collect { case d: BigDecimal if d.isWhole => d.toLong }
        case FloatType => raw.collect { case d: BigDecimal => d.toFloat }
        case DoubleType => raw.collect { case d: BigDecimal => d.toDouble }
        case StringType => raw.collect { case s: String => s }
        case other => throw new IllegalArgumentException(s"unsupported type $other")
      }
      val nums = typed.collect {
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case f: Float => f.toDouble
        case d: Double => d
      }
      if (nums.nonEmpty) {
        val (mn, mx) = (nums.min, nums.max)
        val pad = math.max(2.0, (mx - mn) * 0.1)
        Gen(typed, mn - pad, mx + pad)
      } else Gen(typed, 0, 500)
    }

    def draw(g: Gen, dt: DataType): Any = {
      val fromPool = g.typed.nonEmpty && rnd.nextDouble() < 0.7
      dt match {
        case StringType =>
          if (g.typed.nonEmpty) g.typed(rnd.nextInt(g.typed.size))
          else f"${('A' + rnd.nextInt(26)).toChar}${('A' + rnd.nextInt(26)).toChar}${('A' + rnd.nextInt(26)).toChar}"
        case _ if fromPool => g.typed(rnd.nextInt(g.typed.size))
        case IntegerType => g.lo.toInt + rnd.nextInt(math.max(1, g.hi.toInt - g.lo.toInt + 1))
        case LongType => g.lo.toLong + (rnd.nextLong() & Long.MaxValue) % math.max(1L, g.hi.toLong - g.lo.toLong + 1)
        // halves only: dyadic values survive float→double promotion and
        // sum exactly in both engines, so SUM/AVG compare bit-clean
        case FloatType => (g.lo + rnd.nextInt(math.max(1, ((g.hi - g.lo) * 2).toInt + 1)) / 2.0).toFloat
        case DoubleType => g.lo + rnd.nextInt(math.max(1, ((g.hi - g.lo) * 2).toInt + 1)) / 2.0
        case other => throw new IllegalArgumentException(s"unsupported type $other")
      }
    }

    val gens = schema.fields.map { f =>
      f.dataType match {
        case ArrayType(el, _) => (resolve(f.name, el), el, true)
        case dt => (resolve(f.name, dt), dt, false)
      }
    }
    val rows = (0 until numRows).map { _ =>
      Row.fromSeq(gens.toSeq.map {
        case (g, el, true) => Seq.fill(1 + rnd.nextInt(4))(draw(g, el))
        case (g, dt, false) => draw(g, dt)
      })
    }
    // few, fat partitions: thousands of corpus micro-queries scan this
    // cached frame, and per-task scheduling overhead dominates at this
    // row count — 4 tasks/scan is plenty for thousands of rows
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4),
      StructType(schema.fields.map(_.copy(nullable = true))))
  }

  /** H2-style flattening: every ArrayType column becomes five scalar
    * `<name>__MV0..4` columns (null-padded), matching how the paired
    * hsqls reference multi-value data
    * (`ClusterIntegrationTestUtils.java:120-127,156-168`). */
  def flatten(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.flatMap {
      case StructField(n, ArrayType(_, _), _, _) =>
        // try_element_at: null past the array end (ANSI element_at
        // throws), matching H2's null-padded __MV columns
        (0 until 5).map(i => try_element_at(col(n), lit(i + 1)).as(s"${n}__MV$i"))
      case f => Seq(col(f.name))
    }
    df.select(cols.toSeq: _*)
  }
}
