package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.DateTimeOps

/** Batch ingest: file readers + the record-transformer chain + the
  * segment sink — the reference's batch ingestion pipeline
  * (`pinot-core/.../data/readers/{CSVRecordReader,JSONRecordReader,
  * AvroRecordReader}.java` feeding
  * `data/recordtransformer/{ExpressionTransformer,DataTypeTransformer,
  * TimeTransformer,SanitationTransformer,CompoundTransformer}.java`,
  * then `segment/creator/impl/SegmentIndexCreationDriverImpl.java`).
  *
  * Spark-native shape: readers are `spark.read` with an EXPLICIT
  * schema and FAILFAST mode (the reference validates every row against
  * the table schema at ingest — silently-permissive inference would
  * be a behavior change); transformers are declarative `Column`
  * rewrites composed left-to-right, so the whole ingest chain is one
  * codegen'd projection over the scan — per-row, distributed, no
  * driver involvement, which is what makes it hold at 100 TB.
  *
  * Avro: the spark-avro datasource jar is not in this build's jar
  * set, so [[readAvro]] goes through `avro-mapred`'s
  * `AvroKeyInputFormat` (splittable container reads, one task per
  * block) and converts GenericRecord → Row against the DECLARED
  * schema — the `AvroRecordReader.java` semantics: fields matched by
  * name, union-wrapped nullables unwrapped, missing fields null (the
  * transformer chain fills defaults). Swap to
  * `spark.read.format("avro")` when the datasource jar ships; the
  * transformer chain downstream is unchanged.
  */
object Ingest {

  /** A record transformer: one declarative rewrite stage
    * (recordtransformer/RecordTransformer.java's per-row contract,
    * expressed over whole columns). */
  sealed trait RecordTransformer {
    def apply(df: DataFrame): DataFrame
  }

  /** Derived columns from expressions over existing ones
    * (ExpressionTransformer.java + the FunctionRegistry UDF hook —
    * here any Column expression, which subsumes the reflection
    * registry). */
  final case class ExpressionTransform(exprs: Seq[(String, Column)])
      extends RecordTransformer {
    def apply(df: DataFrame): DataFrame =
      exprs.foldLeft(df) { case (d, (name, e)) => d.withColumn(name, e) }
  }

  object ExpressionTransform {
    /** From ingest-config strings, compiled through the PQL expression
      * grammar — the reference's `FunctionExpressionEvaluator.java`
      * evaluating registry-resolved functions per row
      * (`FunctionRegistry.java:30-55`); here the string compiles ONCE
      * to a codegen'd Column. */
    def fromConfig(exprs: Seq[(String, String)]): ExpressionTransform =
      ExpressionTransform(exprs.map { case (name, e) =>
        name -> graft.pql.Pql.compileExpression(e)
      })
  }

  /** Coerce to the declared schema: project exactly its fields, cast
    * each to the declared type (DataTypeTransformer.java). Fails at
    * analysis if a declared field is missing — schema drift surfaces
    * at ingest, not at query time. */
  final case class DataTypeTransform(schema: StructType) extends RecordTransformer {
    def apply(df: DataFrame): DataFrame =
      df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Incoming→outgoing time-unit conversion of the time column
    * (TimeTransformer.java + TimeGranularitySpec). */
  final case class TimeTransform(column: String, fromUnit: String, toUnit: String)
      extends RecordTransformer {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column, DateTimeOps.timeConvert(col(column), fromUnit, toUnit))
  }

  /** String sanitation (SanitationTransformer.java): strip control
    * characters, trim, cap at maxLength (FieldSpec.java:75-77). */
  final case class SanitationTransform(columns: Seq[String], maxLength: Int = 512)
      extends RecordTransformer {
    def apply(df: DataFrame): DataFrame =
      columns.foldLeft(df) { (d, c) =>
        d.withColumn(c,
          substring(trim(regexp_replace(col(c), "[\\p{Cntrl}]", "")), 1, maxLength))
      }
  }

  /** defaultNullValue substitution (FieldSpec.java:52-64 — the
    * reference has no physical nulls; every field declares a default
    * filled at ingest). */
  final case class NullDefaultTransform(defaults: Map[String, Any])
      extends RecordTransformer {
    def apply(df: DataFrame): DataFrame = df.na.fill(defaults)
  }

  /** Left-to-right composition (CompoundTransformer.java). */
  final case class CompoundTransform(chain: Seq[RecordTransformer])
      extends RecordTransformer {
    def apply(df: DataFrame): DataFrame = chain.foldLeft(df)((d, t) => t(d))
  }

  /** CSV → rows (CSVRecordReader.java + CSVRecordReaderConfig.java:
    * configurable header/delimiter, schema-validated). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  /** Avro container files → rows (AvroRecordReader.java). Reads with
    * the file's writer schema via `AvroKeyInputFormat` (block-aligned
    * splits — parallel at any file size), then projects/converts each
    * GenericRecord onto the declared StructType by field name. The
    * per-record conversion happens inside the partition iterator, so
    * the input format's object reuse never leaks. */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.avro.generic.GenericRecord
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.AvroKeyInputFormat
    import org.apache.hadoop.io.NullWritable
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable])
    val fields = schema.fields // serializable capture, not the SparkSession
    val rows = rdd.mapPartitions(_.map { case (k, _) =>
      AvroConvert.toRow(k.datum(), fields)
    })
    spark.createDataFrame(rows, schema)
  }

  /** Thrift binary files → rows (ThriftRecordReader.java): each file
    * is a stream of back-to-back TBinaryProtocol-serialized structs of
    * a user-generated thrift class; fields map to the declared schema
    * by NAME via the class's own TFieldIdEnum metadata (the
    * reference's `fieldForId` index loop). One task per file — a bare
    * thrift stream has no sync markers to split on (the reference
    * reads it single-threaded for the same reason); shard input across
    * files for parallelism. The thrift class is resolved and the
    * fieldName→id map built once per task, records decode straight to
    * Rows inside the iterator. */
  def readThrift(spark: SparkSession, path: String, thriftClassName: String,
      schema: StructType): DataFrame = {
    val fields = schema.fields
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (_, pds) =>
      ThriftConvert.readStream(pds.open(), thriftClassName, fields)
    }
    spark.createDataFrame(rows, schema)
  }

  /** JSON-lines → rows (JSONRecordReader.java). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** Transform + write the immutable segment
    * (SegmentIndexCreationDriverImpl: rows → columnar segment; here
    * parquet, whose dictionary/stats/bloom machinery replaces the
    * hand-built indexes). `sortBy` mirrors the sorted-column segment
    * option (SegmentGeneratorConfig sorted column): sorting within
    * partitions gives parquet row-group min/max stats their pruning
    * power on that column.
    *
    * `bloomFilterColumns` mirrors the reference's per-column segment
    * bloom filters (`segment/creator/impl/bloom/BloomFilterCreator
    * .java`, read back by `ColumnValueSegmentPruner.java:41-126` to
    * prune segments on EQ predicates whose value the filter rules
    * out): each named column gets a parquet bloom filter written in
    * the footer, and the reader consults it for pushed EQ/IN filters
    * exactly where the reference consults its pruner — useful for
    * high-cardinality unsorted columns whose row-group min/max spans
    * overlap (where stats pruning is blind). */
  def writeSegment(df: DataFrame, transformer: RecordTransformer,
      segmentDir: String, sortBy: Seq[String] = Nil,
      bloomFilterColumns: Seq[String] = Nil): Unit = {
    val transformed = transformer(df)
    val sorted =
      if (sortBy.isEmpty) transformed
      else transformed.sortWithinPartitions(sortBy.map(col): _*)
    val writer = bloomFilterColumns.foldLeft(sorted.write) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    writer.mode("overwrite").parquet(segmentDir)
  }

  /** Bucketed segment sink — the reference's partition-aware segment
    * layout: ingest hashes one column into N partitions
    * (`pinot-core/.../data/partition/MurmurPartitionFunction.java`,
    * `ModuloPartitionFunction.java`, factory
    * `PartitionFunctionFactory.java:35-60`), records the partition id
    * in segment metadata, and the broker prunes/routes segments by it
    * (`pinot-core/.../query/pruner/PartitionSegmentPruner.java`).
    * Spark bucketing is the same contract — `hash(col) % n` recorded
    * in the table catalog — and additionally makes joins and
    * aggregations ON the bucket key shuffle-free: both sides read
    * co-located buckets, so the exchange disappears from the plan
    * (asserted in BucketedJoinSpec). At 100 TB that is the difference
    * between a full-fact shuffle per join and none. `saveAsTable` is
    * required because bucket metadata lives in the catalog, not the
    * parquet footers; `path` pins where the files land. */
  def writeBucketedSegment(df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
    val ws = if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*)
    ws.saveAsTable(table)
  }

  /** Partitioned segment sink — the reference's segment pruning: the
    * broker routes around segments whose time range can't match
    * (`TimeBoundaryService`, routing by `SegmentZKMetadata` time
    * metadata) and servers skip segments whose column min/max excludes
    * the predicate (`pinot-core/.../query/pruner/
    * ColumnValueSegmentPruner.java:40-76`). Hive-style partition
    * directories are Spark's form of the same contract: a filter on a
    * partition column prunes whole directories AT PLAN TIME
    * (`PartitionFilters` in the scan — asserted in
    * PartitionPruneSpec), so a day-scoped query over 100 TB reads one
    * day, not 100 TB. Partition columns should be low-cardinality
    * (day, event type); high-cardinality keys belong in
    * [[writeBucketedSegment]] buckets instead. */
  def writePartitionedSegment(df: DataFrame, segmentDir: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    sorted.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(segmentDir)
  }
}
