package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation — the composition the individual
  * operators exist for, as one call:
  *
  *   1. exact dedup        keep only each content's lowest-id copy
  *   2. near-dup removal   MinHash-LSH pairs (exact-verified); drop the
  *                         higher id of every pair
  *   3. language filter    marker-voting language ID == `lang`
  *   4. quality floor      heuristic score >= minQuality
  *
  * Every stage is itself oracle-checked (q33/q34/q40/q41); the composition
  * is checked end-to-end as q49. Scale shape: stages 3-4 are zero-shuffle
  * narrow maps; stages 1-2 shuffle hashes/buckets only — the document text
  * never moves.
  */
object Curation {

  /** Surviving doc ids (one column `doc_id`, ascending). */
  def curate(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
             lang: String = "en", minQuality: Double = 0.5,
             mh: MinHashLsh.Params = MinHashLsh.Params()): DataFrame = {
    val keepers = ExactDedup.keeperMap(docs, idCol, textCol)
      .where(col("doc_id") === col("keeper_id")).select("doc_id")
    val nearDupLosers = MinHashLsh.nearDuplicates(spark, docs, idCol, textCol, mh)
      .select(col("doc_b").as("doc_id")).distinct()
    val langOk = TextStats.languageId(spark, docs, idCol, textCol)
      .where(col("lang_pred") === lang).select("doc_id")
    val qualOk = TextStats.qualityScore(spark, docs, idCol, textCol)
      .where(col("quality") >= minQuality).select("doc_id")
    keepers
      .join(langOk, "doc_id")
      .join(qualOk, "doc_id")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }
}
