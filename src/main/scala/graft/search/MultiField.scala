package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{BuildConfig, BuiltIndex, IndexBuilder}

/** Multi-field index: the reference's `Term` is (field, text) and every
  * statistic is per-field (`core/search/termquery.go:61`,
  * `core/index/fieldinfos.go`, `core/document/field.go`). Lucene stores each
  * field's postings/norms in per-field keyed structures of shared segment
  * files; the Spark-native mapping is one SUBINDEX per field under
  * `indexDir/field=<name>/`, all sharing the SAME docId space and segment
  * geometry (same input ids + config => identical segSize, asserted below).
  * Per-field idf/avgdl then come for free from each subindex's manifest —
  * exactly the per-field CollectionStatistics the reference computes.
  */
final class MultiFieldIndex(val indexDir: String, val perField: Map[String, BuiltIndex])
    extends Serializable {
  require(perField.nonEmpty, "at least one field")
  require(perField.values.map(_.segmentSize).toSet.size == 1,
    "all fields must share the segment geometry (same docId space)")
  def apply(field: String): BuiltIndex = perField(field)
  def fields: Set[String] = perField.keySet
}

object MultiFieldIndex {
  /** Build (or load committed generations of) one subindex per field column.
    * Each field gets its own analyzer chain run, term dictionary, postings,
    * norms, and statistics.
    */
  def buildOrLoad(spark: SparkSession, docs: DataFrame, docIdCol: String,
                  fieldCols: Seq[String], indexDir: String,
                  cfg: BuildConfig = BuildConfig(),
                  inputPath: String = ""): MultiFieldIndex = {
    val per = fieldCols.map { f =>
      f -> IndexBuilder.buildOrLoad(spark, docs, docIdCol, f, s"$indexDir/field=$f", cfg,
        inputPath = if (inputPath.nonEmpty) s"$inputPath#$f" else "")
    }.toMap
    new MultiFieldIndex(indexDir, per)
  }
}

/** Field-scoped + cross-field search over a [[MultiFieldIndex]].
  *
  * Field-scoped queries delegate to the field's searcher (its statistics,
  * its dictionary). Cross-field composition is done Spark-side on scored
  * sets — the idiomatic mapping of BooleanQuery-over-fields: per-field
  * kernels produce (doc, score) and Catalyst joins/aggregates combine them
  * (TakeOrderedAndProject gives the bounded top-k merge).
  */
final class MultiFieldSearcher(val index: MultiFieldIndex) extends Serializable {
  val perField: Map[String, IndexSearcher] =
    index.perField.map { case (f, i) => f -> new IndexSearcher(i) }

  def searcher(field: String): IndexSearcher =
    perField.getOrElse(field, throw new IllegalArgumentException(s"unknown field '$field'"))

  /** Top-k within one field (that field's BM25 statistics). */
  def search(spark: SparkSession, field: String, q: Query, k: Int) =
    searcher(field).search(spark, q, k)

  def count(spark: SparkSession, field: String, q: Query): Long =
    searcher(field).count(spark, q)

  /** Weighted cross-field disjunctive sum (SHOULD across fields): score =
    * sum over clauses of weight * fieldScore. Ordered by score rounded to
    * 6dp (desc), docId asc — rounding-first makes the rank stable across
    * summation orders (each addend is computed with the field's exact BM25
    * op order; only the cross-field sum is Catalyst's).
    */
  def searchBlended(spark: SparkSession, clauses: Seq[(String, Query, Double)],
                    k: Int): DataFrame = {
    val scored = clauses.map { case (f, q, w) =>
      searcher(f).scoreAll(spark, q).toDF("doc_id", "s")
        .select(col("doc_id"), (col("s") * lit(w)).as("s"))
    }
    scored.reduce(_ unionAll _)
      .groupBy("doc_id").agg(round(sum("s"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Cross-field filtered search: hits of `q` in `field`, required to also
    * match `filterQ` in `filterField` (scores from `field` only) — the
    * FILTER-clause semantics across fields.
    */
  def searchFiltered(spark: SparkSession, field: String, q: Query,
                     filterField: String, filterQ: Query, k: Int): DataFrame = {
    val hits = searcher(field).scoreAll(spark, q).toDF("doc_id", "score")
    val keep = searcher(filterField).matchingDocs(spark, filterQ).toDF("doc_id", "z")
      .select("doc_id")
    hits.join(keep, "doc_id")
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
