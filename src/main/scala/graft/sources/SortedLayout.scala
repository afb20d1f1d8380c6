package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{col, lit}

/** Ordered selection over a SORTED segment layout — the Spark-native
  * analog of the reference's sorted-column fast path
  * (`IndexingConfig.sortedColumn` + per-column `isSorted` segment
  * metadata; `operator/filter/SortedInvertedIndexBasedFilterOperator
  * .java:1-164` answers sorted-column predicates by binary search on
  * the sorted forward index instead of scanning).
  *
  * Here the "sorted segment" is a table written range-partitioned +
  * sorted by a column (the [[Ingest]] sorted sink at scale): each
  * parquet file covers a disjoint key range, recorded in its footer's
  * column min/max statistics. An `ORDER BY <sortedCol> ... LIMIT
  * offset, size` query then needs only the head (or tail, DESC) files
  * whose cumulative row counts cover `offset + size` rows — the other
  * files cannot contribute to the page. Like the reference, sortedness
  * is DETECTED from the data's own metadata (Pinot computes `isSorted`
  * at segment load rather than trusting the config), so a table that
  * merely claims a sort order never returns wrong pages.
  *
  * At 100 TB the footer sweep is one distributed metadata job over
  * ~10⁵ file footers (memoized per immutable file set) and the query
  * then scans 1-2 files instead of every segment — the same
  * read-bound-by-answer-size property the reference gets from its
  * sorted index.
  */
object SortedLayout {

  /** Per-file footer stats for one column. `min`/`max` are unified to
    * Double for numeric physical types and String for UTF-8 binary —
    * only used for ORDERING files, never returned to the query. */
  final case class FileStat(path: String, rows: Long,
      minD: Double, maxD: Double, minS: String, maxS: String,
      numeric: Boolean) {
    def minKey: Either[Double, String] = if (numeric) Left(minD) else Right(minS)
    def maxKey: Either[Double, String] = if (numeric) Left(maxD) else Right(maxS)
  }

  private def leq(a: Either[Double, String], b: Either[Double, String]): Boolean =
    (a, b) match {
      case (Left(x), Left(y)) => x <= y
      case (Right(x), Right(y)) => x <= y
      case _ => false
    }
  private def eqK(a: Either[Double, String], b: Either[Double, String]): Boolean =
    (a, b) match {
      case (Left(x), Left(y)) => x == y
      case (Right(x), Right(y)) => x == y
      case _ => false
    }

  // memoized per (file set incl. size+mtime, column): footers are
  // immutable once written, and repeated pages over the same segment
  // must not re-open 10^5 footers per query. Bounded like
  // [[Tables.footerCountCache]] — a long-lived session paging over
  // ever-changing table versions must not accumulate driver memory
  // (each entry holds per-file stats, ~100 B × file count).
  private val layoutCache =
    new scala.collection.concurrent.TrieMap[(Seq[String], String), Option[Seq[FileStat]]]

  /** The sorted layout of `df`'s scan for `column`, or None when the
    * frame is not a bare parquet scan, the column's per-file ranges
    * overlap (not a sorted layout), any footer lacks stats, or any
    * file contains nulls in the column (null ordering cannot be
    * decided from range stats). Result is ASC-ordered by file min. */
  def layoutFor(df: DataFrame, column: String): Option[Seq[FileStat]] = {
    df.queryExecution.optimizedPlan match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
          try {
            val statuses = fs.location.listFiles(Nil, Nil).flatMap(_.files)
            val key = (statuses
              .map(f => s"${f.getPath}@${f.getLen}:${f.getModificationTime}").sorted,
              column.toLowerCase)
            if (layoutCache.size > 256) layoutCache.clear()
            layoutCache.getOrElseUpdate(key, {
              val spark = df.sparkSession
              val confBc = spark.sparkContext.broadcast(
                new org.apache.spark.util.SerializableConfiguration(
                  spark.sessionState.newHadoopConf()))
              val files = statuses.map(_.getPath.toString).sorted
              val stats =
                try spark.sparkContext
                  .parallelize(files, math.min(math.max(files.size, 1), 32))
                  .map(p => fileStat(p, column, confBc.value.value))
                  .collect().toSeq
                finally confBc.destroy()
              if (stats.exists(_.isEmpty)) None
              else {
                val flat = stats.flatten.filter(_.rows > 0)
                val asc = flat.sortBy(s =>
                  s.minKey.fold(d => (0, d, ""), str => (1, 0.0, str)))
                // disjoint ranges: each file starts at or after the
                // previous file's end (boundary ties legal — absorbed
                // by the subset walk)
                val disjoint = asc.zip(asc.drop(1)).forall { case (a, b) =>
                  a.numeric == b.numeric && leq(a.maxKey, b.minKey)
                }
                // a single file is "sorted" but prunes nothing
                if (disjoint && asc.size > 1) Some(asc) else None
              }
            })
          } catch { case scala.util.control.NonFatal(_) => None }
        case _ => None
      }
      case _ => None
    }
  }

  /** Footer stats of one file for one column: Some(None) propagation —
    * outer None = this file disqualifies the layout (missing stats,
    * nulls present, unsupported type). */
  private def fileStat(path: String, column: String,
      conf: org.apache.hadoop.conf.Configuration): Option[FileStat] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    try {
      val blocks = r.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      if (rows == 0) return Some(FileStat(path, 0, 0, 0, "", "", numeric = true))
      val perBlock = blocks.map { b =>
        b.getColumns.asScala.find(c =>
          c.getPath.toDotString.equalsIgnoreCase(column)).flatMap { c =>
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue || st.getNumNulls > 0) None
          else st match {
            case s: org.apache.parquet.column.statistics.IntStatistics =>
              Some((s.getMin.toDouble, s.getMax.toDouble, "", "", true))
            case s: org.apache.parquet.column.statistics.LongStatistics =>
              Some((s.getMin.toDouble, s.getMax.toDouble, "", "", true))
            case s: org.apache.parquet.column.statistics.FloatStatistics =>
              Some((s.getMin.toDouble, s.getMax.toDouble, "", "", true))
            case s: org.apache.parquet.column.statistics.DoubleStatistics =>
              Some((s.getMin, s.getMax, "", "", true))
            case s: org.apache.parquet.column.statistics.BinaryStatistics =>
              Some((0.0, 0.0, s.genericGetMin.toStringUsingUTF8,
                s.genericGetMax.toStringUsingUTF8, false))
            case _ => None
          }
        }
      }
      if (perBlock.exists(_.isEmpty)) None
      else {
        val bs = perBlock.flatten
        val numeric = bs.head._5
        if (!bs.forall(_._5 == numeric)) None
        else if (numeric)
          Some(FileStat(path, rows, bs.map(_._1).min, bs.map(_._2).max, "", "",
            numeric = true))
        else
          Some(FileStat(path, rows, 0, 0, bs.map(_._3).min, bs.map(_._4).max,
            numeric = false))
      }
    } finally r.close()
  }

  /** Literal-embeddable probe values — the tightening bound becomes a
    * pushable `lit(v)` of the COLUMN's own type (a mismatched literal
    * type would wrap the column in a Cast and kill pushdown). */
  private def litable(v: Any): Boolean = v match {
    case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short |
        _: java.lang.Byte | _: java.lang.Float | _: java.lang.Double |
        _: String | _: java.math.BigDecimal | _: java.sql.Date |
        _: java.sql.Timestamp | _: java.lang.Boolean => true
    case _ => false
  }

  /** Boundary tightening: ONE plan-time probe reads the sort-key row
    * at rank `needed` and synthesizes a pushed predicate keeping only
    * rows at-or-before it in the requested order — the reference's
    * sorted-index "stop at docId offset+size" made declarative. The
    * subset chosen from footer row counts still reads every row of its
    * head file (file = one row group at our segment sizes); the bound
    * predicate re-cuts INSIDE the file via the parquet page index
    * (column-index row ranges), so the top-K heap sees ~`needed` rows,
    * not ~file rows. Measured 0.30 → 0.14 s on the SF1000 s2 page.
    *
    * Correctness: every kept row is lexicographically ≤ (≥, desc) the
    * probed rank-`needed` sort key — a SUPERSET of the page for ANY
    * tie-breaking, since ties at the boundary all pass. Null secondary
    * keys follow Spark's default null ordering (asc = nulls FIRST →
    * kept via isNull; desc = nulls LAST → correctly beyond the bound).
    * A probe miss (fewer rows than `needed`) or a non-embeddable type
    * just skips tightening. */
  private def tighten(frame: DataFrame, order: Seq[(String, Boolean)],
      needed: Long): DataFrame = {
    if (needed < 1 || needed - 1 > Int.MaxValue) return frame
    val cols = order.take(2).filter(c => frame.schema.fieldNames.contains(c._1))
    if (cols.isEmpty || cols.head._1 != order.head._1) return frame
    val sortCols = cols.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    val probe = frame.select(cols.map(c => col(c._1)): _*)
      .orderBy(sortCols: _*).offset((needed - 1).toInt).limit(1)
      .collect().headOption
    // the literal must carry the COLUMN's exact DataType: lit() on a
    // collected BigDecimal typically derives a different precision/
    // scale than the column, so the comparison gets wrapped in Casts
    // and silently loses the parquet page-index pushdown this whole
    // optimization exists for (ADVICE r8). Literal.create with the
    // column's own type produces a cast-free pushable predicate; any
    // conversion failure just skips tightening (correct either way).
    def typedLit(name: String, v: Any): Option[Column] =
      try Some(org.apache.spark.sql.GraftSqlBridge.column(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, frame.schema(name).dataType)))
      catch { case scala.util.control.NonFatal(_) => None }
    probe match {
      case None => frame // fewer matching rows than the page — no cut
      case Some(r) =>
        val (pName, pAsc) = cols.head
        val pv = r.get(0)
        if (pv == null || !litable(pv)) return frame
        val pLit = typedLit(pName, pv).getOrElse(return frame)
        val pCol = col(pName)
        val strictPrim = if (pAsc) pCol < pLit else pCol > pLit
        val tiePred =
          if (cols.size < 2) lit(true)
          else {
            val (sName, sAsc) = cols(1)
            val sv = r.get(1)
            val sCol = col(sName)
            if (sv == null) { if (sAsc) sCol.isNull else lit(true) }
            else if (!litable(sv)) lit(true)
            else typedLit(sName, sv) match {
              case None => lit(true)
              case Some(sLit) =>
                if (sAsc) (sCol <= sLit) || sCol.isNull else sCol >= sLit
            }
          }
        frame.where(strictPrim || (pCol === pLit && tiePred))
    }
  }

  /** Build the pruned ordered-selection frame, or None when the fast
    * path does not apply (unsorted layout, or pruning would read
    * every file anyway — the plain plan is then strictly simpler).
    *
    * `order` is the query's ORDER BY as (column, ascending); its HEAD
    * is the sorted column deciding which files can contribute, and the
    * first two columns feed the [[tighten]] bound. With a filter,
    * footer row counts over-estimate the matching rows, so the subset
    * grows by doubling until the filtered page is full — each probe is
    * one job over the candidate files, and the final frame is a plain
    * lazy plan over the chosen subset. */
  def orderedSelection(table: DataFrame, order: Seq[(String, Boolean)],
      filter: Option[Column], needed: Long,
      finish: DataFrame => DataFrame): Option[DataFrame] = {
    if (needed <= 0 || order.isEmpty) return None
    val column = order.head._1
    val primaryAsc = order.head._2
    layoutFor(table, column).flatMap { asc =>
      val ordered = if (primaryAsc) asc else asc.reverse
      def headKey(s: FileStat) = if (primaryAsc) s.minKey else s.maxKey
      def tailKey(s: FileStat) = if (primaryAsc) s.maxKey else s.minKey
      // prefix of `ordered` holding ≥ wantRows rows, extended over
      // files whose head TIES the prefix's boundary value (equal keys
      // may span the range-partition cut and the page must see all of
      // them). The boundary is FIXED at the original prefix's end —
      // re-deriving it from each absorbed file would chain through a
      // layout whose every file boundary splits inside one key value
      // (compound-key range partitioning does exactly that) and
      // absorb the whole table. Only rows EQUAL to the boundary can
      // displace prefix rows within their tie group; anything past it
      // sorts after ≥ wantRows rows and can never enter the page.
      def prefix(wantRows: Long): Seq[FileStat] = {
        var acc = 0L
        var i = 0
        while (i < ordered.size && acc < wantRows) { acc += ordered(i).rows; i += 1 }
        if (i > 0) {
          val boundary = tailKey(ordered(i - 1))
          while (i < ordered.size && eqK(headKey(ordered(i)), boundary)) i += 1
        }
        ordered.take(i)
      }
      def filteredOver(subset: Seq[FileStat]): DataFrame = {
        val raw = table.sparkSession.read.schema(table.schema)
          .parquet(subset.map(_.path): _*)
        filter.map(raw.where).getOrElse(raw)
      }
      filter match {
        case None =>
          val subset = prefix(needed)
          if (subset.size >= ordered.size) None
          else if (needed >= subset.map(_.rows).sum)
            Some(finish(filteredOver(subset))) // subset IS the page
          else Some(finish(tighten(filteredOver(subset), order, needed)))
        case Some(_) =>
          // adaptive: footer counts bound UNFILTERED rows only, so the
          // subset doubles until the filtered page is full (the probe
          // is a limit-bounded count — it stops scanning as soon as
          // `needed` matches are found)
          var want = needed
          var subset = prefix(want)
          var full = subset.size >= ordered.size
          while (!full && filteredOver(subset).limit(needed.toInt).count() < needed) {
            want *= 8
            subset = prefix(want)
            full = subset.size >= ordered.size
          }
          if (full) None
          else Some(finish(tighten(filteredOver(subset), order, needed)))
      }
    }
  }
}
