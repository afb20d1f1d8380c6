package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet test tables.
  *
  * Mirrors the reference's notion of a named table backed by columnar
  * segments (Pinot: `pinot-common/.../common/data/Segment.java`,
  * `pinot-core/.../indexsegment/immutable/`): here one logical table =
  * one parquet dataset; a Spark task over a parquet split plays the role
  * of Pinot's per-segment operator tree. At 100 TB the same code path
  * holds — parquet row-group stats give min/max pruning, dictionary
  * pages give the dictionary-encoding benefits Pinot hand-builds.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table. Plain `spark.read.parquet` keeps the scan fully
    * declarative so Catalyst pushes filters/projections into the
    * parquet reader (PushedFilters / ReadSchema in explain output).
    *
    * `events.ts` has appeared in two physical encodings across
    * test-data generations: TIMESTAMP(NANOS) — which Spark 4 only
    * reads via `spark.sql.legacy.parquet.nanosAsLong`, as an
    * epoch-nanos LongType — and TIMESTAMP(MICROS, isAdjustedToUTC =
    * false), which reads as TIMESTAMP_NTZ. Either way queries see one
    * session-zone TimestampType column: nanos normalize with integer
    * division (`div 1000`, no double round-trip, so no precision loss
    * on ~1.7e18 nano epochs) and NTZ casts wall-clock-preserving under
    * the UTC session zone every entry point sets. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val tsType = df.schema.fields.find(_.name == "ts").map(_.dataType)
    if (name == "events" && tsType.contains(org.apache.spark.sql.types.LongType)) {
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else if (name == "events" &&
        tsType.contains(org.apache.spark.sql.types.TimestampNTZType)) {
      df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast(org.apache.spark.sql.types.TimestampType))
    } else df
  }

  /** Register every table as a temp view so `spark.sql` and the PQL
    * front-end resolve names like the reference's broker routing does
    * (`BaseBrokerRequestHandler.java:156-187` maps table name → route;
    * here the catalog does). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Exact row count from parquet FOOTER metadata when — and only
    * when — the frame is a bare unfiltered parquet scan: the
    * `MetadataBasedAggregationOperator` path (InstancePlanMakerImplV2
    * .java:148-169 plans filterless group-by-less COUNT(*) against
    * segment metadata, zero docs scanned). Footer reads are
    * DISTRIBUTED over executors — at 100 TB a table is 10⁵+ segments
    * and a driver-side loop would serialize on the driver exactly like
    * a collect. Any transform, filter, or non-parquet source returns
    * None and the caller falls back to the ordinary scan-based count. */
  private val footerCountCache =
    new scala.collection.concurrent.TrieMap[Seq[String], Long]

  def metadataRowCount(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    df.queryExecution.optimizedPlan match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
          try {
            // ALL files the scan would read — filtering by a ".parquet"
            // suffix here would silently undercount tables whose part
            // files carry other names (Hive/Impala writers), a wrong
            // answer rather than a fallback
            val statuses = fs.location.listFiles(Nil, Nil).flatMap(_.files)
            val files = statuses.map(_.getPath.toString).sorted
            // cache key carries size+mtime (free — the FileIndex has
            // the statuses cached): an in-place overwrite that reuses
            // part-file names must not serve a stale count
            val cacheKey = statuses
              .map(f => s"${f.getPath}@${f.getLen}:${f.getModificationTime}").sorted
            if (files.isEmpty) Some(0L)
            else footerCountCache.get(cacheKey).orElse {
              val spark = df.sparkSession
              // the session's hadoop conf, not a blank Configuration —
              // object-store credentials/filesystems live there
              val confBc = spark.sparkContext.broadcast(
                new org.apache.spark.util.SerializableConfiguration(
                  spark.sessionState.newHadoopConf()))
              val n =
                try spark.sparkContext
                  .parallelize(files, math.min(files.size, 32))
                  .map { p =>
                    import org.apache.hadoop.fs.Path
                    import org.apache.parquet.hadoop.ParquetFileReader
                    import org.apache.parquet.hadoop.util.HadoopInputFile
                    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
                      new Path(p), confBc.value.value))
                    try r.getRecordCount finally r.close()
                  }.sum().toLong
                // the broadcast only serves this one job — destroy it
                // eagerly; caching the count while leaving the conf
                // broadcast alive would accumulate driver+executor
                // memory across a long-lived session's cache misses
                finally confBc.destroy()
              // memoize per (path, size, mtime) file set — repeated
              // COUNT(*) must not re-open 10^5 footers per query
              if (footerCountCache.size > 256) footerCountCache.clear()
              footerCountCache.put(cacheKey, n)
              Some(n)
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        case _ => None
      }
      case _ => None
    }
  }

  /** Top-level column names of a segment, from parquet FOOTER metadata
    * only — the `SegmentMetadata.getSchema()` the reference's pruners
    * consult without touching data. Empty when the dir has no parquet
    * files. All files of a segment share one schema (single write),
    * so the first footer speaks for the segment. */
  def segmentColumns(spark: SparkSession, segmentDir: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    Option(new java.io.File(segmentDir).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).headOption.map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .map(_.getName).toSet
        finally r.close()
      }.getOrElse(Set.empty)
  }

  /** Schema-evolution segment pruning (`query/pruner/
    * DataSchemaSegmentPruner.java:36-40`): a query over an evolved
    * table touches only the segments whose schema contains EVERY
    * queried column — a segment written before a column existed
    * contributes nothing, it is not padded with nulls. Footer-metadata
    * decision per segment (no rows read to prune), then one
    * `unionByName` scan over the covering segments projected to the
    * queried columns. Returns the surviving scan plus the pruned dirs
    * (the reference logs the same). */
  def loadEvolved(spark: SparkSession, segmentDirs: Seq[String],
      queryColumns: Seq[String]): (Option[DataFrame], Seq[String]) = {
    require(queryColumns.nonEmpty, "at least one query column required")
    val (covered, pruned) = segmentDirs.partition { dir =>
      val cols = segmentColumns(spark, dir)
      queryColumns.forall(cols.contains)
    }
    val df = covered.map { dir =>
      spark.read.parquet(dir).select(queryColumns.map(
        org.apache.spark.sql.functions.col): _*)
    }.reduceOption(_ unionByName _)
    (df, pruned)
  }
}
