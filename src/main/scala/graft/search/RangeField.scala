package graft.search

import org.apache.spark.sql.Column

/** RangeField query relations (`/root/reference/core/query/rangefieldquery.go:11`
  * QueryType INTERSECTS / WITHIN / CONTAINS / CROSSES): each document carries
  * an interval [lo, hi]; a query interval [qlo, qhi] selects docs by the
  * named topological relation.
  *
  * Spark-first mapping: the interval is a pair of doc-values columns, each
  * relation a codegen'd Catalyst predicate — pushed into the parquet scan as
  * min/max range filters (the BKD-tree's role in the reference). Works for
  * any orderable column type (numeric, date, string).
  */
object RangeField {

  /** doc ∩ query non-empty (closed intervals). */
  def intersects(lo: Column, hi: Column, qlo: Column, qhi: Column): Column =
    lo <= qhi && hi >= qlo

  /** doc ⊆ query. */
  def within(lo: Column, hi: Column, qlo: Column, qhi: Column): Column =
    lo >= qlo && hi <= qhi

  /** doc ⊇ query. */
  def contains(lo: Column, hi: Column, qlo: Column, qhi: Column): Column =
    lo <= qlo && hi >= qhi

  /** Overlaps without either containment — the reference's CROSSES
    * (`rangefieldquery.go`: matches that are neither WITHIN nor CONTAINS
    * but still intersect). */
  def crosses(lo: Column, hi: Column, qlo: Column, qhi: Column): Column =
    intersects(lo, hi, qlo, qhi) &&
      !within(lo, hi, qlo, qhi) && !contains(lo, hi, qlo, qhi)
}
