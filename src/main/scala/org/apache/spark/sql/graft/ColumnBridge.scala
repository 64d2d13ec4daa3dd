package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. `classic.ExpressionUtils` is private[sql],
  * so this one-file shim lives inside the org.apache.spark.sql package —
  * the conventional pattern for Spark-native libraries that ship custom
  * Catalyst expressions (public Spark API offers no other classic-mode
  * wrap). Everything else in graft stays in its own namespace. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (possibly custom) resolved LogicalPlan as a DataFrame —
    * `Dataset.ofRows` is private[sql]; custom whole-operator nodes
    * (graft.plans.AsOfJoin) need it to enter the public API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap an RDD[InternalRow] as a DataFrame without the external-Row
    * round trip — `internalCreateDataFrame` is private[sql]; the
    * distributed-ranking machinery (graft.functions.Ranks) needs it to
    * stay in Tungsten format end to end. */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
