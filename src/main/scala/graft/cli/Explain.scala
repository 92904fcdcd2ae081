package graft.cli

import org.apache.spark.sql.functions._

import graft.index.{BuildConfig, IndexBuilder}
import graft.search._

/** Dumps `.explain("formatted")` for the engine's hot Catalyst paths —
  * the evidence that term lookups reach the parquet scan as pushed filters
  * (the FST term-dictionary seek's role) and that the global top-k merge is
  * a TakeOrderedAndProject. args: <docsParquet> <indexDir>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (input, indexDir) = (args(0), args(1))
    val spark = CliSpark.session("graft-explain")
    val docs = spark.read.parquet(input)
    val idx = IndexBuilder.buildOrLoad(spark, docs, "doc_id", "text", indexDir,
      BuildConfig(numSegments = 4, chunkDocs = 128), inputPath = input)
    val searcher = new IndexSearcher(idx)

    def section(title: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $title =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    section("posting scan: term IN (...) pushdown (term-dictionary seek analogue)") {
      idx.postings(spark).where(col("term").isin("spark", "join"))
        .select("segmentId", "term", "docFreq")
    }
    section("term stats aggregation (CollectionStatistics/TermStatistics)") {
      idx.postings(spark).where(col("term").isin("spark", "join"))
        .groupBy("term").agg(sum("docFreq"), sum("totalTermFreq"))
    }
    section("prefix dictionary expansion: StartsWith pushdown") {
      idx.postings(spark).select("term").where(col("term").startsWith("sp")).distinct()
    }
    section("global top-k merge == MergeTopDocs (TakeOrderedAndProject)") {
      searcher.search(spark, BoolQ(should = Seq(TermQ("spark"), TermQ("join"))), 10).toDF()
    }
    section("sort-by-field top-k (TopFieldCollector)") {
      searcher.searchSortBy(spark, TermQ("dup"),
        docs.select("doc_id", "n_chars"), Seq(col("n_chars").desc), 10)
    }
    spark.stop()
  }
}
