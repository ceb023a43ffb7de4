package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column <-> Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 unified the
  * public Column API over ColumnNode, so library code defining custom
  * Catalyst Expressions needs this one-hop package-private access —
  * the same pattern Spark's own extensions use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `org.apache.spark.sql.types.AbstractDataType` is `private[sql]`, so a
  * library-package Expression cannot name it in an `inputTypes` override
  * signature directly; this public alias is the same one-hop bridge. */
object TypeBridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}

/** `StateStore.unloadAll()` is `private[sql]`; the finite-replay runner
  * (graft.streaming.Streams.runToMemory) needs it to close each query's
  * throwaway state providers eagerly instead of letting native RocksDB
  * handles accumulate until JVM exit (where their teardown raced
  * shutdown and could SIGABRT). */
object StateStoreBridge {
  def unloadAll(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
