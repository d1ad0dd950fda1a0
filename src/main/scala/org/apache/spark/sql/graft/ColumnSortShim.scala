package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.SortOrder

/** Spark 4 made `Column.expr`/the column-node types `private[sql]`; the
  * two-phase window planner only needs ONE bit of that metadata — is a
  * sort column plain `ASC NULLS FIRST`? — to decide whether the stats
  * aggregate can carry lag/lead boundary values (struct-max over the
  * sort keys is only order-equivalent for all-ascending, nulls-first
  * keys). This shim lives in an `org.apache.spark.sql` subpackage for
  * access and exposes exactly that predicate. */
object ColumnSortShim {
  def isAscendingNullsFirst(c: Column): Boolean = c.node match {
    case so: SortOrder =>
      so.sortDirection == SortOrder.Ascending &&
        so.nullOrdering == SortOrder.NullsFirst
    case _ => false
  }
}
