package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Catalyst Expression
  * converters. Lives in the `org.apache.spark.sql` package solely to
  * satisfy the access modifier — the standard pattern for libraries
  * that register custom expressions without forking Spark. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** FULLY-CONVERTED expression tree of a Column. `expression` wraps a
    * Column-API tree in one opaque `ColumnNodeExpression` leaf (the
    * conversion happens lazily at analysis), so plan-level pattern
    * matching sees no structure; this runs the converter eagerly —
    * `===`/`isin`/`&&` become `UnresolvedFunction("="/"in"/"and", …)`
    * over `UnresolvedAttribute`/`Literal` leaves, transformable before
    * any analyzer runs. */
  def deepExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** `AbstractDataType` is `private[sql]` in Spark 4; this public alias
    * lets graft expressions declare `inputTypes` (ExpectsInputTypes)
    * for analysis-time type checking. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** `TypeCollection` constructor access (`private[sql]`): lets an
    * expression accept several input types WITHOUT an implicit cast —
    * e.g. the vector kernels take array<float> natively instead of
    * paying a per-evaluation Cast allocation to array<double>. */
  def typeCollection(ts: org.apache.spark.sql.types.AbstractDataType*): AbstractType =
    org.apache.spark.sql.types.TypeCollection(ts: _*)

  /** `internalCreateDataFrame` is `private[sql]`: build a DataFrame
    * over an RDD of InternalRows without the row-encoder round-trip —
    * the seam for per-partition imperative operators whose output
    * re-enters the declarative plan (e.g. the HLL register build). */
  def internalDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      rdd, schema, isStreaming = false)

  /** Register a temp SQL function on an existing session (the
    * session-state function registry is `private[sql]`). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
