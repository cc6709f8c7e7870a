package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API.
  *
  * Spark 4 split `Column` away from Catalyst (`Column` now wraps a
  * `ColumnNode`); building a `Column` from a custom `Expression` — the
  * documented extension path for native, codegen'd functions — goes
  * through `private[sql]` converters, so this one-file shim lives in the
  * `org.apache.spark.sql` package tree (the standard pattern used by
  * open-source Spark extension libraries). No Spark internals are
  * modified; this only re-exports two conversions.
  */
object ColumnBridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  /** Resolve a Column back to the Catalyst expression it denotes. */
  def expression(c: Column): Expression = ColumnConversions.expression(c)

  /** Register a native function into an EXISTING session's function
    * registry — for sessions the caller did not build (a host-provided
    * SparkSession, where `spark.sql.extensions` was not configurable).
    * Sessions built by the caller should prefer the public
    * `spark.sql.extensions` config with graft.functions.GraftExtensions.
    */
  def registerFunction(
      spark: SparkSession,
      id: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
