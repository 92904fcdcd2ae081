package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter

/** Minimal accessor for the attribute names a [[Column]] expression
  * references. Spark 4 made `Column.expr` private[sql] (the Column API is
  * connect/classic-agnostic); this shim lives under the sql package solely
  * to reach the column's node and the classic node->Catalyst converter, so
  * the engine can decide EXACTLY (not by string-matching) whether a
  * caller's sort columns reference the score column
  * (IndexSearcher.searchSortBy's non-scoring fast path is only legal when
  * they don't).
  */
object ColumnRefs {
  def referencedNames(c: Column): Set[String] =
    ColumnNodeToExpressionConverter(c.node).collect {
      // caller-supplied columns are UNRESOLVED at this point (no plan has
      // analyzed them yet), so `references` would be empty — collect both
      // unresolved and resolved attribute leaves
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.nameParts.last
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
    }.toSet
}
