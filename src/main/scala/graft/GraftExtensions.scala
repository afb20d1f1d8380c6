package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.SqlFunctions
import graft.plans.{DictRoutingRule, StarTreeRoutingRule}

/** The engine's `SparkSessionExtensions` entry point — the preference-
  * order capstone for operators Spark can't express natively (project
  * brief option (c)): custom expressions registered as SQL functions
  * and the star-tree routing optimizer rule, injected at session build
  * via
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * For an ALREADY-RUNNING session (tests, notebooks), [[Graft.enable]]
  * applies the same pieces through the public `experimental` hooks.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    SqlFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.exprs", name), builder))
    }
    ext.injectOptimizerRule(StarTreeRoutingRule.apply)
    // after star-tree: a full pre-aggregation answer wins over the
    // dictionary-encoded scan when both artifacts are registered
    ext.injectOptimizerRule(DictRoutingRule.apply)
  }
}

/** Runtime enabling of the graft extensions on an existing session. */
object Graft {
  def enable(spark: SparkSession): Unit = {
    SqlFunctions.all.foreach { case (name, builder) =>
      GraftSqlBridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[StarTreeRoutingRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ StarTreeRoutingRule(spark)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[DictRoutingRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DictRoutingRule(spark)
  }
}
