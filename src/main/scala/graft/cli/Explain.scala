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
      BuildConfig(numSegments = 4, chunkDocs = 128, storePositions = true,
        storeTermVectors = true, storeOffsets = true, storePayloads = true),
      inputPath = input)
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
    section("distributed multi-term query: exact terms OR predicate, ONE pushed scan") {
      // the postingRows shape for BoolQ(must=TermQ("spark"), should=PrefixQ("du")):
      // both the exact-term In and the prefix StartsWith reach the scan
      idx.postings(spark)
        .where(col("term").isin("spark") || col("term").startsWith("du"))
    }
    // IVF: partition pruning — only probed centroid directories are read
    val embPath = new java.io.File(new java.io.File(input).getParent, "embeddings.parquet")
    if (embPath.exists()) {
      val emb = spark.read.parquet(embPath.toString)
      val qv = emb.where(col("vec_id") === 0L).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      val ivfDir = s"$indexDir-ivf"
      val cs = graft.pipeline.Ivf.build(spark, emb, "vec_id", "embedding", ivfDir, 16)
      section("IVF probe: centroid partition pruning (non-probed buckets never read)") {
        spark.read.parquet(ivfDir)
          .where(col("centroid").isin(graft.pipeline.Ivf.probeSet(cs, qv, 4): _*))
          .select("vec_id")
      }
      section("ANN brute force: narrow map + TakeOrderedAndProject (no corpus shuffle)") {
        graft.pipeline.Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", qv, 10)
      }
    }
    section("exact dedup: hash-groupBy on sha2 — content never shuffles") {
      graft.pipeline.ExactDedup.keeperMap(docs, "doc_id", "text")
    }
    section("geo box + distance: range predicates pushed, haversine codegen'd (no UDF)") {
      val geo = docs.select(col("doc_id"),
        ((col("doc_id") * 7919L % 18000L).cast("double") / 100.0 - 90.0).as("lat"),
        ((col("doc_id") * 104729L % 36000L).cast("double") / 100.0 - 180.0).as("lon"))
      Geo.withinDistance(geo, "lat", "lon", 40.0, -74.0, 3000.0)
    }
    section("SORTED_SET facet from the FORWARD structure: matched docIds pushed into the TV scan") {
      // facetTopTerms materializes while its match-set cache is live (so the
      // kernel runs once); the lazy inner aggregation carries the plan
      val matches = searcher.matchingDocs(spark, TermQ("dup"))
        .toDF("doc_id", "z").select("doc_id").persist()
      val df = searcher.facetAgg(spark, matches, 10, 8192)
      df.collect()
      matches.unpersist(blocking = false)
      df
    }
    section("fuzzy dictionary filter: termLen range PUSHDOWN + codegen'd levenshtein") {
      // mirrors IndexSearcher.predColumn(FuzzyPred("spark", 2)) EXACTLY:
      // the builder stores each term's code-point length as its own
      // `termLen` column, so the sound length window (5 ± maxEdits) is a
      // plain comparison that reaches parquet row-group stats
      // (GreaterThanOrEqual/LessThanOrEqual(termLen) in PushedFilters —
      // the sub-linear candidate generation a billion-term dictionary
      // needs; a length(term) expression would evaluate post-scan on every
      // row). The levenshtein then runs on the surviving slice only. The
      // kernel path's Dataset-from-RDD lineage hides the scan from
      // .explain, so the scan stage is reproduced standalone here.
      idx.postings(spark)
        .where(col("termLen").between(3, 7) &&
          levenshtein(col("term"), lit("spark")) <= 2)
        .select("segmentId", "term", "docFreq")
    }
    section("geo nearest, first expanding ring: box predicates pushed to the scan") {
      val geo = docs.select(col("doc_id"),
        ((col("doc_id") * 7919L % 18000L).cast("double") / 100.0 - 90.0).as("lat"),
        ((col("doc_id") * 104729L % 36000L).cast("double") / 100.0 - 180.0).as("lon"))
      Geo.withinDistance(geo, "lat", "lon", 40.0, -74.0, 25.0)
    }
    section("postings-offsets highlight feed: term-pruned scan, per-block docId skip") {
      graft.index.Highlighter.offsetsFromPostings(spark, idx, Set("spark", "join"), _ == 7L).toDF()
    }
    section("field-sorted searchAfter: (sortValue, docId) cursor pushed into the field scan") {
      // deep paging must PRUNE the field table (LessThan/EqualTo on the
      // sort column reach PushedFilters) instead of re-reading page1+page2
      searcher.searchSortByAfter(spark, TermQ("dup"),
        docs.select("doc_id", "n_chars"), "n_chars", ascending = false, 10,
        after = Some((250L, 37L)))
    }
    section("payload read: term-pruned postings scan (per-occurrence metadata, no TV copy)") {
      graft.index.Payloads.forTerms(spark, idx, Set("spark"), _ == 7L).toDF()
    }
    spark.stop()
  }
}
