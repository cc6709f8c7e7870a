package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
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
}
