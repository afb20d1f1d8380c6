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
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * only reads via `spark.sql.legacy.parquet.nanosAsLong` (as an
    * epoch-nanos LongType). We normalize it back to a TimestampType
    * with integer division (`div 1000`) — no double round-trip, so no
    * precision loss on ~1.7e18 nano epochs. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType)) {
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else df
  }

  /** Register every table as a temp view so `spark.sql` and the PQL
    * front-end resolve names like the reference's broker routing does
    * (`BaseBrokerRequestHandler.java:156-187` maps table name → route;
    * here the catalog does). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
