package graft.pql

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Column

/** Pluggable transform-function registry for the PQL layer — the
  * reference resolves functions by name + arity from a registry
  * (`pinot-core/.../data/function/FunctionRegistry.java:30-55`,
  * reflection over static methods; query-side
  * `TransformFunctionFactory.java:43-50`). Here a registered function
  * maps argument Columns to a result Column, so custom functions are
  * full Catalyst citizens (codegen, pushdown through the plan) instead
  * of per-row reflective calls.
  *
  * Built-ins (add/sub/mult/div/timeconvert/datetimeconvert) resolve
  * first in [[Pql]]; the registry extends the surface without touching
  * the parser.
  */
object PqlFunctions {
  type Impl = Seq[Column] => Column

  private val registry = new TrieMap[(String, Int), Impl]

  /** Register `name` at `arity`. Names are case-insensitive; the last
    * registration wins (matching the reference's registry overwrite). */
  def register(name: String, arity: Int)(impl: Impl): Unit =
    registry.put((name.toLowerCase, arity), impl)

  def lookup(name: String, arity: Int): Option[Impl] =
    registry.get((name.toLowerCase, arity))

  def registered: Set[(String, Int)] = registry.keySet.toSet
}
