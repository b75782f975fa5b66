package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's Column <-> Expression converters, which are
  * `private[sql]` in Spark 4 (columnNodeSupport.scala). Living under
  * `org.apache.spark.sql` grants access — the standard pattern for
  * libraries contributing native Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `CatalogV2Util.v2ColumnsToStructType` is `private[sql]`; the identity-
  * aware createTable overload needs it to keep the schema conversion
  * identical to the default interface method's. */
object CatalogV2UtilBridge {
  def v2ColumnsToStructType(
      columns: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .v2ColumnsToStructType(columns)
}
