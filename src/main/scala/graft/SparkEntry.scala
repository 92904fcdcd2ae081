package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{BuildConfig, BuiltIndex, IndexBuilder}
import graft.search._

/** Driver contract (see builder prompt + SURVEY.md §7).
  *
  * Every entry runs the REAL engine end-to-end over
  * `{sfDir}/documents.parquet` (doc_id, text, …): build the inverted index
  * (once per sfDir, committed + resumable under java.io.tmpdir), then answer
  * the query through the posting-list kernels. The paired `oracleSql` is an
  * independent DuckDB re-derivation of the same semantics — tokenize by
  * whitespace, tf/df/avgdl, then lucene-go's BM25
  * (`/root/reference/core/search/similaritybm25.go:235-252`, incl. the
  * mod-256 norm quirk `:243`) — so a hash match certifies the whole
  * index-build + search pipeline, not just arithmetic.
  *
  * Scores are rounded to 6 decimals on BOTH sides: the engines compute the
  * same real-valued formula but through different libm/fp paths (JVM vs
  * DuckDB), so last-ulp differences are expected; 6dp is far above ulp noise
  * and far below any genuine scoring difference.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    topk(BoolQ(should = Seq(TermQ("spark"), TermQ("data"))), 10)(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- engine

  private val cached = scala.collection.mutable.HashMap.empty[String, IndexSearcher]

  private[graft] def searcher(spark: SparkSession, sfDir: String): IndexSearcher =
    cached.synchronized {
      cached.getOrElseUpdate(sfDir, {
        val docsPath = s"$sfDir/documents.parquet"
        val indexDir = s"${sys.props("java.io.tmpdir")}/graft-index-f9-${IndexBuilder.sha256Hex(docsPath).take(16)}"
        val docs = spark.read.parquet(docsPath)
        // small chunkDocs so even the sf-scale tables split into several
        // segments (segSize rounds up to a chunk multiple) — the verify
        // path must exercise the multi-segment merge + MergeTopDocs.
        // Positions + term vectors + postings offsets + payloads stored so
        // the same index serves phrase queries (q50/q59), TV/MLT (q54/q55),
        // postings-based highlighting (q58), and payload reads (q63).
        val idx = IndexBuilder.buildOrLoad(spark, docs, "doc_id", "text", indexDir,
          BuildConfig(numSegments = 4, chunkDocs = 128, storePositions = true,
            storeTermVectors = true, storeOffsets = true, storePayloads = true),
          inputPath = docsPath)
        new IndexSearcher(idx)
      })
    }

  private def index(spark: SparkSession, sfDir: String): BuiltIndex =
    searcher(spark, sfDir).index

  /** Multi-field index over (text, lang, source) — per-field dictionaries,
    * postings, norms, and BM25 statistics (Term = (field, text), reference
    * `core/search/termquery.go:61`). */
  private val mfCached = scala.collection.mutable.HashMap.empty[String, MultiFieldSearcher]

  private[graft] def mfSearcher(spark: SparkSession, sfDir: String): MultiFieldSearcher =
    mfCached.synchronized {
      mfCached.getOrElseUpdate(sfDir, {
        val docsPath = s"$sfDir/documents.parquet"
        val indexDir = s"${sys.props("java.io.tmpdir")}/graft-index-mf-f9-${IndexBuilder.sha256Hex(docsPath).take(16)}"
        val docs = spark.read.parquet(docsPath)
        val idx = MultiFieldIndex.buildOrLoad(spark, docs, "doc_id",
          Seq("text", "lang", "source"), indexDir,
          BuildConfig(numSegments = 4, chunkDocs = 128), inputPath = docsPath)
        new MultiFieldSearcher(idx)
      })
    }

  /** A SEPARATE index copy with docs containing "dup" tombstoned — the
    * delete-by-term lifecycle (IndexOps.deleteByQuery). Idempotent: a
    * reloaded index re-deletes to a no-op (matchingDocs applies tombstones).
    */
  private def deletedSearcher(spark: SparkSession, sfDir: String): IndexSearcher =
    cached.synchronized {
      cached.getOrElseUpdate(s"$sfDir#del", {
        val docsPath = s"$sfDir/documents.parquet"
        val indexDir = s"${sys.props("java.io.tmpdir")}/graft-index-del-f9-${IndexBuilder.sha256Hex(docsPath).take(16)}"
        val docs = spark.read.parquet(docsPath)
        IndexBuilder.buildOrLoad(spark, docs, "doc_id", "text", indexDir,
          BuildConfig(numSegments = 4, chunkDocs = 128), inputPath = docsPath)
        val idx = graft.index.IndexOps.deleteByTerm(spark, indexDir, "dup")
        new IndexSearcher(idx)
      })
    }

  /** Top-k hits as (doc_id, score-rounded-6dp), ordered score desc, doc_id asc. */
  private def topk(q: Query, k: Int)(spark: SparkSession, sfDir: String): DataFrame =
    searcher(spark, sfDir).search(spark, q, k)
      .select(col("docId").as("doc_id"), round(col("score"), 6).as("score"))

  private def countOf(q: Query)(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Seq(searcher(spark, sfDir).count(spark, q)).toDF("cnt")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // single-term BM25 top-k (TermQuery/TermScorer path)
    "q01_term_topk" -> topk(TermQ("spark"), 10),
    // rare term, k > docFreq (exhausts the posting list)
    "q02_term_rare" -> topk(TermQ("dup"), 30),
    // conjunction: leapfrog intersection, score = sum (ConjunctionScorer)
    "q03_and" -> topk(BoolQ(must = Seq(TermQ("spark"), TermQ("join"))), 10),
    // pure disjunction: block-max WAND pruning path (WandScorer)
    "q04_or_wand" -> topk(BoolQ(should = Seq(TermQ("dup"), TermQ("vector"))), 10),
    // disjunction with minimumShouldMatch=2 (DisjunctionSumScorer)
    "q05_or_msm2" -> topk(BoolQ(
      should = Seq(TermQ("spark"), TermQ("data"), TermQ("dup")), minShouldMatch = 2), 10),
    // MUST_NOT exclusion (ReqExclScorer)
    "q06_must_not" -> topk(BoolQ(must = Seq(TermQ("query")), mustNot = Seq(TermQ("dup"))), 10),
    // FILTER clause: matches required, contributes no score (non-scoring req)
    "q07_filter" -> topk(BoolQ(must = Seq(TermQ("merge")), filter = Seq(TermQ("sort"))), 10),
    // BoostQuery: weight = boost * idf
    "q08_boost" -> topk(BoolQ(should = Seq(BoostQ(TermQ("spark"), 2.5), TermQ("dup"))), 10),
    // DisjunctionMaxQuery: max + tieBreak*(sum-max)
    "q09_dismax" -> topk(DisjMaxQ(Seq(TermQ("join"), TermQ("hash")), 0.3), 10),
    // PrefixQuery: rewritten against the term dictionary, constant score
    "q10_prefix" -> topk(PrefixQ("du"), 30),
    // TermInSetQuery: constant-score multi-term disjunction
    "q11_term_in_set" -> topk(ConstQ(TermInSetQ(Set("dup", "vector")), 1.0), 30),
    // MatchAllDocsQuery
    "q12_match_all" -> topk(MatchAllQ, 5),
    // O(1) count shortcut (Term => sum docFreq from stats)
    "q13_count_term" -> countOf(TermQ("spark")),
    // kernel count over a conjunction
    "q14_count_and" -> countOf(BoolQ(must = Seq(TermQ("spark"), TermQ("data")))),
    // term dictionary statistics (docFreq / totalTermFreq aggregation)
    "q15_term_stats" -> ((spark: SparkSession, sfDir: String) =>
      index(spark, sfDir).postings(spark)
        .where(col("term").isin("spark", "join", "dup", "vector", "merge"))
        .groupBy("term")
        .agg(sum("docFreq").cast("long").as("df"), sum("totalTermFreq").cast("long").as("ttf"))
        .orderBy("term")),
    // norms column: field length per doc (DefaultIndexingChain norm semantics)
    "q16_norms" -> ((spark: SparkSession, sfDir: String) =>
      index(spark, sfDir).docmeta(spark)
        .select(col("docId").as("doc_id"), col("norm").cast("long").as("len"))
        .orderBy("doc_id")),
    // per-row sha256(content) invariant (BASELINE.json input_hint)
    "q17_sha" -> ((spark: SparkSession, sfDir: String) =>
      index(spark, sfDir).docmeta(spark)
        .select(col("docId").as("doc_id"), col("sha"))
        .orderBy("doc_id")),
    // searchAfter deep paging: ranks 11..20
    "q18_search_after" -> ((spark: SparkSession, sfDir: String) => {
      val s = searcher(spark, sfDir)
      val q = TermQ("join")
      val page1 = s.search(spark, q, 10).collect()
      val cursor = (page1.last.score, page1.last.docId)
      s.search(spark, q, 10, after = Some(cursor))
        .select(col("docId").as("doc_id"), round(col("score"), 6).as("score"))
    }),
    // RegexpQuery (AutomatonQuery): full-match against the term dictionary
    "q19_regexp" -> topk(RegexpQ("s(p|t).*"), 30),
    // TermRangeQuery: dictionary byte-order range [d, e)
    "q20_term_range" -> topk(TermRangeQ(Some("d"), Some("e"), includeHi = false), 30),
    // FuzzyQuery: terms within classic Levenshtein distance 2 of 'spark'
    // (absent in the reference; Lucene surface), distributed constant-score
    // multi-term rewrite — dictionary never expanded on the driver
    "q60_fuzzy" -> topk(FuzzyQ("spark", 2), 30),
    // Fuzzy via the trigram sidecar: candidates from gram SEEKS (In(gram)
    // row-group pushdown — IO ∝ the query's gram postings, not the
    // dictionary), exact-DP re-check, then a term-set posting scan. Same
    // semantics as the scan path; different (sub-linear) execution route.
    "q68_fuzzy_seek" -> ((spark: SparkSession, sfDir: String) => {
      val s = searcher(spark, sfDir)
      val ng = FuzzyNgrams.buildOrLoad(spark, s.index)
      s.searchFuzzySeek(spark, FuzzyQ("spark", 1), 30, ng)
        .select(col("docId").as("doc_id"), round(col("score"), 6).as("score"))
    }),
    // TopFieldCollector: matches sorted by a stored field (n_chars desc)
    "q21_sort_by_field" -> ((spark: SparkSession, sfDir: String) => {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      searcher(spark, sfDir)
        .searchSortBy(spark, TermQ("dup"), docs.select("doc_id", "n_chars"),
          Seq(col("n_chars").desc, col("doc_id").asc), 10)
        .select("doc_id", "n_chars")
    }),
    // required clause + minimumShouldMatch=2 over three SHOULDs (the mixed
    // Boolean2ScorerSupplier path: ConjunctionScorer(req, DisjSum(msm)))
    "q25_must_msm2" -> topk(BoolQ(
      must = Seq(TermQ("table")),
      should = Seq(TermQ("spark"), TermQ("data"), TermQ("dup")),
      minShouldMatch = 2), 10),
    // absent term: empty result (not an error)
    "q23_missing_term" -> topk(BoolQ(
      must = Seq(TermQ("spark"), TermQ("zzz_not_in_corpus"))), 10),
    // pure-negative query rewrites to MatchNoDocs (booleanquery.go:75-160)
    "q24_pure_negative" -> topk(BoolQ(mustNot = Seq(TermQ("spark"))), 10),
    // batch execution: three queries answered in ONE distributed job
    // (searchMany) — must equal the per-query results
    "q26_batch" -> ((spark: SparkSession, sfDir: String) => {
      val qs: Seq[(String, Query)] = Seq(
        "a" -> TermQ("spark"),
        "b" -> BoolQ(must = Seq(TermQ("join"), TermQ("hash"))),
        "c" -> BoolQ(should = Seq(TermQ("dup"), TermQ("vector"))))
      searcher(spark, sfDir).searchMany(spark, qs, 10)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy("query_id", "doc_id")
    }),
    // delete-by-term lifecycle: docs containing "dup" tombstoned, then a
    // normal search — deleted docs must vanish from hits while the BM25
    // statistics stay those of the full corpus (Lucene delete semantics:
    // docFreq is not adjusted until merge). Exercises the tombstone
    // generation + kernel live-docs anti-join, NOT a query-time MUST_NOT.
    "q30_after_delete" -> ((spark: SparkSession, sfDir: String) =>
      deletedSearcher(spark, sfDir).search(spark, TermQ("join"), 10)
        .select(col("docId").as("doc_id"), round(col("score"), 6).as("score"))),
    // count on the tombstoned index: MatchAll stays O(1) via deletedCount
    "q31_count_after_delete" -> ((spark: SparkSession, sfDir: String) => {
      import spark.implicits._
      val s = deletedSearcher(spark, sfDir)
      Seq((s.count(spark, MatchAllQ), s.count(spark, TermQ("spark"))))
        .toDF("live_docs", "spark_hits")
    }),
    // multi-field: the same engine over a second field — BM25 with the
    // LANG field's own statistics (df over lang tokens, avgdl = 1), blended
    // with text-field scores: score = text:spark + lang:en per doc
    "q29_field_scoped" -> ((spark: SparkSession, sfDir: String) =>
      mfSearcher(spark, sfDir).searchBlended(spark,
        Seq(("text", TermQ("spark"), 1.0), ("lang", TermQ("en"), 1.0)), 10)),
    // cross-field FILTER: text-field scores, source-field predicate
    "q32_field_filter" -> ((spark: SparkSession, sfDir: String) =>
      mfSearcher(spark, sfDir).searchFiltered(spark,
        "text", TermQ("join"), "source", TermQ("src3"), 10)),
    // ---- LLM-pipeline operators (dedup family) --------------------------
    // exact dedup: sha256 hash-groupBy keeper map (content never shuffles)
    "q33_exact_dedup" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.ExactDedup.keeperMap(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
        .orderBy("doc_id")),
    // MinHash+LSH near-dup: banded buckets -> candidates -> EXACT Jaccard
    // verification (never all-pairs); oracle is the brute-force Jaccard
    "q34_minhash_neardup" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.MinHashLsh.nearDuplicates(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")),
    // SimHash near-dup: 4x16-bit chunk banding (pigeonhole => recall 1.0
    // for hamming <= 3); oracle recomputes the identical sha256-derived
    // fingerprints in SQL and brute-forces the hamming join
    "q35_simhash_neardup" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.SimHash.nearDuplicates(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))),
    // exact n-gram Jaccard top-k similarity via the inverted shingle join
    "q36_ngram_topsim" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.NgramJaccard.topSimilar(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
        queryDocId = 98L, k = 10)),
    // ---- similarity search over the embeddings table --------------------
    // brute-force cosine top-k: one narrow map + TakeOrderedAndProject
    // (per-partition heap, no corpus shuffle) — the exhaustive ANN baseline
    "q37_ann_bruteforce" -> ((spark: SparkSession, sfDir: String) => {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val qv = emb.where(col("vec_id") === 0L).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      graft.pipeline.Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", qv, 10)
    }),
    // sign-LSH bucketed near-dup with exact-cosine verification; the
    // deterministic closed-form hyperplanes let the oracle recompute the
    // IDENTICAL buckets in SQL — bucketing included, output reproducible
    "q38_embed_neardup" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.EmbeddingNearDup.pairs(spark,
        spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding", tau = 0.4)),
    // IVF partition-pruned ANN (spherical k-means buckets; nProbe trade),
    // certified by RECALL against the brute-force exhaustive top-k (q37's
    // oracle-green operator): the trained quantizer is iterative (not SQL),
    // so the CONTRACT is oracled instead — recall@10 >= the bound the
    // (nProbe, nCentroids) setting guarantees on any input. Deterministic:
    // seedless k-means (lowest-id init + fixed Lloyd steps).
    "q39_ann_ivf_recall" -> ((spark: SparkSession, sfDir: String) => {
      import spark.implicits._
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val qv = emb.where(col("vec_id") === 0L).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      val dir = s"${sys.props("java.io.tmpdir")}/graft-ivf-f3-${IndexBuilder.sha256Hex(sfDir).take(12)}"
      val cs = graft.pipeline.Ivf.build(spark, emb, "vec_id", "embedding", dir, nCentroids = 32)
      val ivfTop = graft.pipeline.Ivf.search(spark, dir, cs, qv, nProbe = 16, k = 10)
        .select("vec_id").as[Long].collect().toSet
      val bfTop = graft.pipeline.Ann.bruteForceTopK(spark, emb, "vec_id", "embedding", qv, 10)
        .select("vec_id").as[Long].collect().toSet
      val recall = ivfTop.intersect(bfTop).size.toDouble / bfTop.size
      Seq((10L, 16L, 32L, recall >= 0.7)).toDF("k", "n_probe", "n_centroids", "recall_ge_bound")
    }),
    // ---- text analysis (narrow maps, zero shuffle) ----------------------
    "q40_langid" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.TextStats.languageId(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
        .orderBy("doc_id")),
    "q41_quality" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.TextStats.qualityScore(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
        .orderBy("doc_id")),
    "q42_token_counts" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.TextStats.tokenCounts(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
        .orderBy("doc_id")),
    "q43_fingerprint" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.TextStats.fingerprints(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
        .orderBy("doc_id")),
    // multimodal plumbing: binary payload column + batched (stub) decode —
    // byte-exact metadata certified by the oracle
    "q44_multimodal" -> ((spark: SparkSession, sfDir: String) => {
      val assets = graft.pipeline.Multimodal.attachPayload(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
      graft.pipeline.Multimodal.decode(spark, assets)
        .select(col("doc_id"), col("byte_len"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("doc_id")
    }),
    // IVF with a FLAT (0-iteration) coarse quantizer — centroids = the 8
    // lowest-id vectors, assignment = argmax cosine — which makes the whole
    // bucketed-ANN path SQL-expressible: the oracle recomputes assignment,
    // probe ranking, and the probed-bucket top-k (min assignment-tie gap on
    // this data is 4e-4, 11 orders above cross-engine fp noise)
    "q48_ann_ivf_flat" -> ((spark: SparkSession, sfDir: String) => {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val qv = emb.where(col("vec_id") === 0L).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      val dir = s"${sys.props("java.io.tmpdir")}/graft-ivf0-${IndexBuilder.sha256Hex(sfDir).take(12)}"
      val cs = graft.pipeline.Ivf.build(spark, emb, "vec_id", "embedding", dir,
        nCentroids = 8, iters = 0)
      graft.pipeline.Ivf.search(spark, dir, cs, qv, nProbe = 3, k = 10)
    }),
    // end-to-end curation: exact dedup -> near-dup drop -> langid -> quality
    "q49_curate" -> ((spark: SparkSession, sfDir: String) =>
      graft.pipeline.Curation.curate(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")),
    // RangeField relations (rangefieldquery.go QueryType): per-row interval
    // [price*(1-discount), price] vs query box [20000, 30000] — one count
    // per topological relation, all four predicates codegen'd + pushed down
    "q51_range_relations" -> ((spark: SparkSession, sfDir: String) => {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("lo"),
          col("l_extendedprice").as("hi"))
      val (qlo, qhi) = (lit(20000.0), lit(30000.0))
      import graft.search.RangeField._
      li.agg(
        sum(when(intersects(col("lo"), col("hi"), qlo, qhi), 1L).otherwise(0L)).as("n_intersects"),
        sum(when(within(col("lo"), col("hi"), qlo, qhi), 1L).otherwise(0L)).as("n_within"),
        sum(when(contains(col("lo"), col("hi"), qlo, qhi), 1L).otherwise(0L)).as("n_contains"),
        sum(when(crosses(col("lo"), col("hi"), qlo, qhi), 1L).otherwise(0L)).as("n_crosses"))
    }),
    // SORTED_SET doc-values facet (docvaluestype.go SORTED_SET): top-10
    // terms by matching-doc count over the docs matching TermQ("dup") —
    // the postings table is the docId->ords map, swept and joined against
    // the match set
    "q52_sorted_set_facet" -> ((spark: SparkSession, sfDir: String) =>
      searcher(spark, sfDir).facetTopTerms(spark, TermQ("dup"), 10)),
    // index sorting (IndexWriterConfig.setIndexSort analogue): docIds are
    // dense ranks of (n_chars desc, doc_id asc) — docId order == sort order,
    // assigned distributed (range-partition + zipWithIndex), zero-shuffle
    // build; certified via the per-row sha invariant at the new ids
    "q56_sorted_index" -> ((spark: SparkSession, sfDir: String) => {
      val docsPath = s"$sfDir/documents.parquet"
      val dir = s"${sys.props("java.io.tmpdir")}/graft-index-sorted-f9-${IndexBuilder.sha256Hex(docsPath).take(16)}"
      val docs = spark.read.parquet(docsPath)
      val idx = IndexBuilder.buildSorted(spark, docs,
        Seq(col("n_chars").desc, col("doc_id").asc), "text", dir,
        BuildConfig(numSegments = 4, chunkDocs = 128))
      idx.docmeta(spark).select(col("docId").as("doc_id"), col("sha")).orderBy("doc_id")
    }),
    // early termination on the sorted index: each segment kernel emits its
    // FIRST k matches in docId order and stops (docId order == sort order
    // by buildSorted construction) — never scores nor visits the rest;
    // identity certified by the sha at each early-terminated rank
    "q61_sorted_early" -> ((spark: SparkSession, sfDir: String) => {
      val docsPath = s"$sfDir/documents.parquet"
      val dir = s"${sys.props("java.io.tmpdir")}/graft-index-sorted-f9-${IndexBuilder.sha256Hex(docsPath).take(16)}"
      val docs = spark.read.parquet(docsPath)
      val idx = IndexBuilder.buildSorted(spark, docs,
        Seq(col("n_chars").desc, col("doc_id").asc), "text", dir,
        BuildConfig(numSegments = 4, chunkDocs = 128))
      val s = new IndexSearcher(idx)
      val hits = s.searchSortedTopK(spark, TermQ("join"), 10).toDF("doc_id", "z").select("doc_id")
      hits.join(idx.docmeta(spark).select(col("docId").as("doc_id"), col("sha")), "doc_id")
        .orderBy("doc_id")
    }),
    // LatLonPoint analogue (latlon.go): deterministic per-doc coordinates
    // (a pure function of doc_id, like q44's payloads), two-phase distance
    // query — bounding-box scan pushdown, exact haversine confirm
    "q57_geo_distance" -> ((spark: SparkSession, sfDir: String) => {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val geo = docs.select(col("doc_id"),
        ((col("doc_id") * 7919L % 18000L).cast("double") / 100.0 - 90.0).as("lat"),
        ((col("doc_id") * 104729L % 36000L).cast("double") / 100.0 - 180.0).as("lon"))
      graft.search.Geo.withinDistance(geo, "lat", "lon", 40.0, -74.0, 3000.0)
        .select(col("doc_id"), round(col("dist_km"), 6).as("dist_km"))
        .orderBy(col("dist_km").asc, col("doc_id").asc)
    }),
    // term vectors (termvectorswriter.go role): per-doc term list with freq
    // and position extent, read back by docId pushdown
    "q54_term_vectors" -> ((spark: SparkSession, sfDir: String) =>
      graft.index.TermVectors.readAll(spark, index(spark, sfDir))
        .where(col("docId") < 20)
        .select(col("docId").as("doc_id"), col("term"), col("freq").cast("long").as("freq"),
          element_at(col("positions"), 1).cast("long").as("first_pos"),
          element_at(col("positions"), size(col("positions"))).cast("long").as("last_pos"))
        .orderBy("doc_id", "term")),
    // more-like-this over term vectors: seed terms = doc 98's top-5 by
    // freq*idf (tie term asc), then a SHOULD disjunction of them (seed doc
    // excluded); ordered by 6dp-rounded score desc, doc_id asc
    "q55_more_like_this" -> ((spark: SparkSession, sfDir: String) =>
      graft.index.MoreLikeThis.search(spark, searcher(spark, sfDir), 98L, 5, 10)),
    // Structured-Streaming ingestion, end to end: the documents table
    // arrives as TWO micro-batches (foreachBatch contract via indexBatch,
    // exactly-once on batchId); the streamed index must reproduce the
    // full-corpus term statistics bit-for-bit (df/ttf are invariant to the
    // stream's docId re-assignment, so the oracle is the batch-build SQL)
    "q45_stream_stats" -> ((spark: SparkSession, sfDir: String) => {
      import spark.implicits._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val dir = s"${sys.props("java.io.tmpdir")}/graft-stream-f9-${IndexBuilder.sha256Hex(s"$sfDir/documents.parquet").take(16)}"
      val cfg = BuildConfig(numSegments = 2, chunkDocs = 128)
      graft.streaming.StreamingIndexer.indexBatch(spark,
        docs.where(col("doc_id") < 250), "doc_id", "text", dir, cfg, batchId = 0L)
      graft.streaming.StreamingIndexer.indexBatch(spark,
        docs.where(col("doc_id") >= 250), "doc_id", "text", dir, cfg, batchId = 1L)
      val m = graft.index.IndexIO.readManifest(spark, dir).get
      val s = new IndexSearcher(new BuiltIndex(dir, m))
      val stats = s.termStats(spark, Set("spark", "join", "dup"))
      stats.toSeq.map { case (t, (df, ttf)) => (t, df, ttf) }
        .sortBy(_._1).toDF("term", "df", "ttf")
    }),
    // PointRangeQuery analogue: BM25 matches + numeric doc-value range filter
    "q22_point_range" -> ((spark: SparkSession, sfDir: String) => {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      searcher(spark, sfDir).scoreAll(spark, TermQ("dup")).toDF("doc_id", "s")
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .where(col("n_chars").between(150, 300))
        .orderBy(col("s").desc, col("doc_id").asc).limit(10)
        .select(col("doc_id"), round(col("s"), 6).as("score"))
    }),
    // DocValuesFieldExistsQuery analogue: matches filtered by a doc-values
    // column being present (Catalyst isNotNull, parquet null-count pushdown)
    "q46_field_exists" -> ((spark: SparkSession, sfDir: String) => {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      searcher(spark, sfDir).scoreAll(spark, TermQ("merge")).toDF("doc_id", "s")
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .where(col("lang").isNotNull && col("lang") =!= "")
        .orderBy(col("s").desc, col("doc_id").asc).limit(10)
        .select(col("doc_id"), round(col("s"), 6).as("score"))
    }),
    // exact-phrase query (PhraseQuery, slop 0): positions stream + two-phase
    // confirm (docs-level conjunction approximates, prox intersect confirms);
    // BM25 weight = sum of term idfs, freq = phrase occurrences
    "q50_phrase" -> topk(PhraseQ(Seq("table", "hash")), 10),
    // sloppy phrase (slop 2): per-anchor minimal-window matching over the
    // positions stream (semantics documented on PhraseQ; reference reserves
    // spans, core/search/spans/spans.go); freq = sum of 1/(1+width)
    "q59_sloppy_phrase" -> topk(PhraseQ(Seq("table", "hash"), 2), 10),
    // postings-offsets stream (IndexOptions ..._AND_OFFSETS,
    // indexoptions.go:3-29): per (doc, term) occurrence count + the first/
    // last occurrence's code-point offsets, read from the postings alone
    // (term-pruned scan; no term-vectors copy involved)
    "q58_offsets" -> ((spark: SparkSession, sfDir: String) =>
      graft.index.Highlighter.offsetsFromPostings(spark, index(spark, sfDir),
          Set("table", "hash", "spark"), _ < 20L)
        .select(col("docId").as("doc_id"), col("term"),
          col("freq").cast("long").as("freq"),
          element_at(col("startOffsets"), 1).cast("long").as("first_start"),
          element_at(col("endOffsets"), 1).cast("long").as("first_end"),
          element_at(col("startOffsets"), size(col("startOffsets"))).cast("long").as("last_start"),
          element_at(col("endOffsets"), size(col("endOffsets"))).cast("long").as("last_end"))
        .orderBy("doc_id", "term")),
    // forceMerge lifecycle (MergePolicy/SegmentMerger): delete-by-term, then
    // compact all generations into one — tombstones reclaimed, docIDs
    // remapped dense (Lucene merge semantics), statistics CORRECTED to the
    // live corpus. Hits are keyed by the content sha (docIDs are not stable
    // across merges, exactly as in Lucene); row order = score desc then
    // compacted docId asc, which the oracle reproduces as live-doc order.
    "q53_force_merge" -> ((spark: SparkSession, sfDir: String) => {
      val docsPath = s"$sfDir/documents.parquet"
      val dir = s"${sys.props("java.io.tmpdir")}/graft-index-fm-f9-${IndexBuilder.sha256Hex(docsPath).take(16)}"
      // a committed COMPACTED state (gen > 1, minGen == generation, no
      // tombstones) is this query's end state — reuse it; buildOrLoad's
      // fingerprint can't (forceMerge rewrites corpusSha and docCount)
      val merged = graft.index.IndexIO.readManifest(spark, dir) match {
        case Some(mm) if mm.deletedCount == 0L && mm.minGen == mm.generation && mm.minGen > 1L =>
          new BuiltIndex(dir, mm)
        case _ =>
          val docs = spark.read.parquet(docsPath)
          IndexBuilder.buildOrLoad(spark, docs, "doc_id", "text", dir,
            BuildConfig(numSegments = 4, chunkDocs = 128, storePositions = true),
            inputPath = docsPath)
          graft.index.IndexOps.deleteByTerm(spark, dir, "dup")
          graft.index.IndexOps.forceMerge(spark, dir)
      }
      val s = new IndexSearcher(merged)
      val hits = s.search(spark, TermQ("join"), 10).toDF("doc_id", "s")
      hits.join(merged.docmeta(spark).select(col("docId").as("doc_id"), col("sha")), "doc_id")
        .orderBy(col("s").desc, col("doc_id").asc)
        .select(col("sha"), round(col("s"), 6).as("score"))
    }),
    // tiered-merge lifecycle (TieredMergePolicy role): three generations
    // (build <256, append 256..383, append 384..499), delete-by-term, then
    // maybeMerge with a floor that compacts ONLY the two small append
    // generations — their tombstones reclaim (stats corrected), the big
    // generation keeps Lucene's ghost stats. Hits keyed by content sha
    // (docIDs remap within merged segments); the oracle reproduces the
    // MIXED statistics exactly: stat corpus = all docs < 256 plus live
    // docs >= 256
    "q62_tiered_merge" -> ((spark: SparkSession, sfDir: String) => {
      val docsPath = s"$sfDir/documents.parquet"
      val dir = s"${sys.props("java.io.tmpdir")}/graft-index-tm-f9-${IndexBuilder.sha256Hex(docsPath).take(16)}"
      val cfg = BuildConfig(numSegments = 2, chunkDocs = 128)
      val merged = graft.index.IndexIO.readManifest(spark, dir) match {
        // committed end state: gens 2+3 dead, one merge generation on top
        case Some(mm) if mm.deadGens == Seq(2L, 3L) && mm.generation == 4L =>
          new BuiltIndex(dir, mm)
        case _ =>
          val docs = spark.read.parquet(docsPath)
          IndexBuilder.build(spark, docs.where(col("doc_id") < 256), "doc_id", "text", dir, cfg)
          IndexBuilder.append(spark,
            docs.where(col("doc_id") >= 256 && col("doc_id") < 384), "doc_id", "text", dir, cfg)
          IndexBuilder.append(spark, docs.where(col("doc_id") >= 384), "doc_id", "text", dir, cfg)
          graft.index.IndexOps.deleteByTerm(spark, dir, "dup")
          val floor = graft.index.IndexIO.dirBytes(spark, s"$dir/postings/gen=1")
          graft.index.IndexOps.maybeMerge(spark, dir,
            graft.index.IndexOps.MergePolicy(smallGenBytes = floor))
      }
      val s = new IndexSearcher(merged)
      val hits = s.search(spark, TermQ("join"), 10).toDF("doc_id", "s")
      hits.join(merged.docmeta(spark).select(col("docId").as("doc_id"), col("sha")), "doc_id")
        .orderBy(col("s").desc, col("doc_id").asc)
        .select(col("sha"), round(col("s"), 6).as("score"))
    }),
    // per-position PAYLOADS — the last IndexOptions dimension (the
    // reference's payload slot in the prox stream,
    // freqproxtermswriterperfield.go:96-122): the built-in payload is each
    // occurrence's ORIGINAL (pre-lowercase) token text as UTF-8, read back
    // per (doc, position) through the term-pruned postings scan alone
    "q63_payloads" -> ((spark: SparkSession, sfDir: String) =>
      graft.index.Payloads.forTerms(spark, index(spark, sfDir),
          Set("table", "spark"), _ < 20L)
        .select(col("docId").as("doc_id"), col("term"),
          col("position").cast("long").as("pos"),
          decode(col("payload"), "UTF-8").as("payload"))
        .orderBy("doc_id", "term", "pos")),
    // WildcardQuery sugar (the automaton package's wildcard role,
    // automatonquery.go:26): `?` = one char, `*` = any run — translated to
    // the anchored regex automaton, literal-prefix 'h' pushed to the scan
    "q64_wildcard" -> topk(WildcardQ("h?sh*"), 30),
    // field-sorted searchAfter (the PagingFieldCollector role,
    // topfieldcollector.go:14-50): page 2 of (n_chars desc, doc_id asc) via
    // the (lastSortValue, lastDocId) cursor — the cursor predicate prunes
    // the field scan instead of re-reading page1+page2 rows
    "q65_sort_after" -> ((spark: SparkSession, sfDir: String) => {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val s = searcher(spark, sfDir)
      val fields = docs.select("doc_id", "n_chars")
      val page1 = s.searchSortByAfter(spark, TermQ("dup"), fields, "n_chars",
        ascending = false, 10, None).select("doc_id", "n_chars").collect()
      val cursor = (page1.last.getLong(1), page1.last.getLong(0))
      s.searchSortByAfter(spark, TermQ("dup"), fields, "n_chars",
        ascending = false, 10, Some(cursor)).select("doc_id", "n_chars")
    }),
    // sorted-index early-termination PAGING: page 2 through the docId
    // cursor (docId order == sort order on a buildSorted index, so "after
    // the previous page's last hit" is a plain docId lower bound each
    // segment enters via one skip-structure advance)
    "q66_sorted_after" -> ((spark: SparkSession, sfDir: String) => {
      val docsPath = s"$sfDir/documents.parquet"
      val dir = s"${sys.props("java.io.tmpdir")}/graft-index-sorted-f9-${IndexBuilder.sha256Hex(docsPath).take(16)}"
      val docs = spark.read.parquet(docsPath)
      val idx = IndexBuilder.buildSorted(spark, docs,
        Seq(col("n_chars").desc, col("doc_id").asc), "text", dir,
        BuildConfig(numSegments = 4, chunkDocs = 128))
      val s = new IndexSearcher(idx)
      val page1 = s.searchSortedTopK(spark, TermQ("join"), 10).collect()
      val hits = s.searchSortedTopK(spark, TermQ("join"), 10, Some(page1.last.docId))
        .toDF("doc_id", "z").select("doc_id")
      hits.join(idx.docmeta(spark).select(col("docId").as("doc_id"), col("sha")), "doc_id")
        .orderBy("doc_id")
    }),
    // NormMode.JavaLucene (SURVEY §2.4 Q1's second world): norms stored via
    // SmallFloat.intToByte4 (3-bit-mantissa float code, exact below 24) —
    // BM25 runs on the DECODED round-down-to-representable lengths. The
    // oracle independently re-derives the representable set by enumerating
    // mantissa × shift in SQL, never the engine's bit-twiddling.
    "q67_javalucene_norms" -> ((spark: SparkSession, sfDir: String) => {
      val docsPath = s"$sfDir/documents.parquet"
      val dir = s"${sys.props("java.io.tmpdir")}/graft-index-jl-f9-${IndexBuilder.sha256Hex(docsPath).take(16)}"
      val docs = spark.read.parquet(docsPath)
      val idx = IndexBuilder.buildOrLoad(spark, docs, "doc_id", "text", dir,
        BuildConfig(numSegments = 4, chunkDocs = 128,
          normMode = graft.bm25.NormMode.JavaLucene), inputPath = docsPath)
      new IndexSearcher(idx).search(spark, TermQ("spark"), 30)
        .select(col("docId").as("doc_id"), round(col("score"), 6).as("score"))
    }),
    // PointInSetQuery analogue: numeric doc-value IN-set filter (isin
    // pushdown) over BM25 matches
    "q47_point_in_set" -> ((spark: SparkSession, sfDir: String) => {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      searcher(spark, sfDir).scoreAll(spark, TermQ("table")).toDF("doc_id", "s")
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .where(col("n_chars").isin(157L, 246L, 300L, 406L, 512L))
        .orderBy(col("s").desc, col("doc_id").asc).limit(10)
        .select(col("doc_id"), round(col("s"), 6).as("score"))
    })
  )

  // ---------------------------------------------------------------- oracle

  /** Shared DuckDB CTE: tokenize → tf → doc length → collection stats → df →
    * per-(doc,term) BM25 ingredients. Mirrors the engine exactly:
    *  idf  = ln(1 + (N - df + 0.5)/(df + 0.5))   N = docs with ≥1 token
    *  cn   = 1/(k1·((1-b) + b·(len mod 256)/avgdl))  k1=1.2 b=0.75
    *  score = idf - idf/(1 + freq·cn)
    */
  private val base: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*)::BIGINT AS freq FROM tok WHERE term <> '' GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, count(*)::BIGINT AS len FROM tok WHERE term <> '' GROUP BY 1
      |), st AS (
      |  SELECT count(*)::BIGINT AS n, sum(len)::DOUBLE / count(*) AS avgdl FROM dl
      |), df AS (
      |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
      |), sc AS (
      |  SELECT tf.doc_id, tf.term,
      |    ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) AS idf,
      |    1.0 / (1.2 * ((1.0 - 0.75) + 0.75 * (dl.len % 256) / st.avgdl)) AS cn,
      |    tf.freq AS freq
      |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN st
      |)""".stripMargin

  /** `base` variant for NormMode.JavaLucene (q67): the effective length is
    * the field length ROUNDED DOWN to the nearest SmallFloat.byte4
    * representable value. The representable set is re-derived here from
    * first principles — 0..23 exact (NUM_FREE_VALUES), then 24 + the
    * subnormal deltas 0..7, then 24 + (8+mantissa)·2^shift — so the oracle
    * never touches the engine's bit-twiddling encoder. avgdl stays the TRUE
    * average (the engine's cache divides the decoded length by it).
    */
  private val baseJl: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*)::BIGINT AS freq FROM tok WHERE term <> '' GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, count(*)::BIGINT AS len FROM tok WHERE term <> '' GROUP BY 1
      |), st AS (
      |  SELECT count(*)::BIGINT AS n, sum(len)::DOUBLE / count(*) AS avgdl FROM dl
      |), reps AS (
      |  SELECT x::BIGINT AS x FROM range(0, 24) t(x)
      |  UNION SELECT (24 + d)::BIGINT FROM range(0, 8) t(d)
      |  UNION SELECT (24 + (8 + m) * pow(2, s))::BIGINT
      |        FROM range(0, 8) tm(m) CROSS JOIN range(0, 28) ts(s)
      |), eff AS (
      |  SELECT dl.doc_id, max(reps.x) AS elen FROM dl JOIN reps ON reps.x <= dl.len GROUP BY 1
      |), df AS (
      |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
      |), sc AS (
      |  SELECT tf.doc_id, tf.term,
      |    ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) AS idf,
      |    1.0 / (1.2 * ((1.0 - 0.75) + 0.75 * eff.elen / st.avgdl)) AS cn,
      |    tf.freq AS freq
      |  FROM tf JOIN eff USING (doc_id) JOIN df USING (term) CROSS JOIN st
      |)""".stripMargin

  /** Shared dedup CTE: distinct word 3-shingles per doc + set sizes. Same
    * tokenization as `base` (lower + whitespace runs), same shingle join
    * as the engine's `TextHash.shingles` — the sha256 hashing the engine
    * uses is injective on these shingles, so set algebra matches exactly.
    */
  private val shingleBase: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS sh
      |  FROM t, unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS g(i)
      |), sz AS (
      |  SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1
      |)""".stripMargin

  /** BM25 score of `term` per matching doc, as a named CTE body. */
  private def hits(term: String): String =
    s"SELECT doc_id, idf - idf / (1.0 + freq * cn) AS s FROM sc WHERE term = '$term'"

  private def top(k: Int, from: String = "hits", offset: Int = 0): String =
    s"SELECT doc_id, round(s, 6) AS score FROM $from ORDER BY s DESC, doc_id ASC LIMIT $k" +
      (if (offset > 0) s" OFFSET $offset" else "")

  def oracleSql: Map[String, String] = Map(
    "q01_term_topk" -> s"$base, hits AS (${hits("spark")}) ${top(10)}",
    "q02_term_rare" -> s"$base, hits AS (${hits("dup")}) ${top(30)}",
    "q03_and" ->
      s"""$base, h1 AS (${hits("spark")}), h2 AS (${hits("join")}),
         |hits AS (SELECT h1.doc_id, h1.s + h2.s AS s FROM h1 JOIN h2 USING (doc_id))
         |${top(10)}""".stripMargin,
    "q04_or_wand" ->
      s"""$base, h1 AS (${hits("dup")}), h2 AS (${hits("vector")}),
         |ids AS (SELECT doc_id FROM h1 UNION SELECT doc_id FROM h2),
         |hits AS (SELECT ids.doc_id, COALESCE(h1.s, 0) + COALESCE(h2.s, 0) AS s
         |         FROM ids LEFT JOIN h1 USING (doc_id) LEFT JOIN h2 USING (doc_id))
         |${top(10)}""".stripMargin,
    "q05_or_msm2" ->
      s"""$base, h1 AS (${hits("spark")}), h2 AS (${hits("data")}), h3 AS (${hits("dup")}),
         |ids AS (SELECT doc_id FROM h1 UNION SELECT doc_id FROM h2 UNION SELECT doc_id FROM h3),
         |hits AS (SELECT ids.doc_id,
         |           COALESCE(h1.s, 0) + COALESCE(h2.s, 0) + COALESCE(h3.s, 0) AS s,
         |           (h1.doc_id IS NOT NULL)::INT + (h2.doc_id IS NOT NULL)::INT
         |             + (h3.doc_id IS NOT NULL)::INT AS m
         |         FROM ids LEFT JOIN h1 USING (doc_id) LEFT JOIN h2 USING (doc_id)
         |                  LEFT JOIN h3 USING (doc_id))
         |SELECT doc_id, round(s, 6) AS score FROM hits WHERE m >= 2
         |ORDER BY s DESC, doc_id ASC LIMIT 10""".stripMargin,
    "q06_must_not" ->
      s"""$base, h1 AS (${hits("query")}),
         |hits AS (SELECT doc_id, s FROM h1
         |         WHERE doc_id NOT IN (SELECT doc_id FROM sc WHERE term = 'dup'))
         |${top(10)}""".stripMargin,
    "q07_filter" ->
      s"""$base, h1 AS (${hits("merge")}),
         |hits AS (SELECT h1.doc_id, h1.s FROM h1
         |         JOIN (SELECT DISTINCT doc_id FROM sc WHERE term = 'sort') f USING (doc_id))
         |${top(10)}""".stripMargin,
    "q08_boost" ->
      s"""$base,
         |h1 AS (SELECT doc_id, (2.5 * idf) - (2.5 * idf) / (1.0 + freq * cn) AS s
         |       FROM sc WHERE term = 'spark'),
         |h2 AS (${hits("dup")}),
         |ids AS (SELECT doc_id FROM h1 UNION SELECT doc_id FROM h2),
         |hits AS (SELECT ids.doc_id, COALESCE(h1.s, 0) + COALESCE(h2.s, 0) AS s
         |         FROM ids LEFT JOIN h1 USING (doc_id) LEFT JOIN h2 USING (doc_id))
         |${top(10)}""".stripMargin,
    "q09_dismax" ->
      s"""$base, h1 AS (${hits("join")}), h2 AS (${hits("hash")}),
         |ids AS (SELECT doc_id FROM h1 UNION SELECT doc_id FROM h2),
         |hits AS (SELECT ids.doc_id,
         |           greatest(h1.s, h2.s)
         |             + 0.3 * ((COALESCE(h1.s, 0) + COALESCE(h2.s, 0)) - greatest(h1.s, h2.s)) AS s
         |         FROM ids LEFT JOIN h1 USING (doc_id) LEFT JOIN h2 USING (doc_id))
         |${top(10)}""".stripMargin,
    "q10_prefix" ->
      s"""$base, hits AS (SELECT DISTINCT doc_id, 1.0 AS s FROM sc WHERE term LIKE 'du%')
         |${top(30)}""".stripMargin,
    "q11_term_in_set" ->
      s"""$base, hits AS (SELECT DISTINCT doc_id, 1.0 AS s FROM sc WHERE term IN ('dup', 'vector'))
         |${top(30)}""".stripMargin,
    "q12_match_all" ->
      "SELECT doc_id, 1.0 AS score FROM documents ORDER BY doc_id ASC LIMIT 5",
    "q13_count_term" ->
      s"$base SELECT count(*)::BIGINT AS cnt FROM sc WHERE term = 'spark'",
    "q14_count_and" ->
      s"""$base, h1 AS (${hits("spark")}), h2 AS (${hits("data")})
         |SELECT count(*)::BIGINT AS cnt FROM h1 JOIN h2 USING (doc_id)""".stripMargin,
    "q15_term_stats" ->
      s"""$base SELECT term, count(*)::BIGINT AS df, CAST(sum(freq) AS BIGINT) AS ttf
         |FROM tf WHERE term IN ('spark', 'join', 'dup', 'vector', 'merge')
         |GROUP BY term ORDER BY term""".stripMargin,
    "q16_norms" ->
      s"""$base SELECT d.doc_id, COALESCE(dl.len, 0)::BIGINT AS len
         |FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id ORDER BY d.doc_id""".stripMargin,
    "q17_sha" ->
      "SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id",
    "q18_search_after" ->
      s"$base, hits AS (${hits("join")}) ${top(10, offset = 10)}",
    "q19_regexp" ->
      s"""$base, hits AS (SELECT DISTINCT doc_id, 1.0 AS s FROM sc
         |                WHERE regexp_full_match(term, 's(p|t).*'))
         |${top(30)}""".stripMargin,
    "q20_term_range" ->
      s"""$base, hits AS (SELECT DISTINCT doc_id, 1.0 AS s FROM sc
         |                WHERE term >= 'd' AND term < 'e')
         |${top(30)}""".stripMargin,
    "q60_fuzzy" ->
      s"""$base, hits AS (SELECT DISTINCT doc_id, 1.0 AS s FROM sc
         |                WHERE levenshtein(term, 'spark') <= 2)
         |${top(30)}""".stripMargin,
    // same metric, tighter radius — the sidecar path must land on the
    // identical doc set the oracle derives by brute force
    "q68_fuzzy_seek" ->
      s"""$base, hits AS (SELECT DISTINCT doc_id, 1.0 AS s FROM sc
         |                WHERE levenshtein(term, 'spark') <= 1)
         |${top(30)}""".stripMargin,
    "q21_sort_by_field" ->
      s"""$base, m AS (SELECT DISTINCT doc_id FROM sc WHERE term = 'dup')
         |SELECT d.doc_id, d.n_chars FROM documents d JOIN m ON d.doc_id = m.doc_id
         |ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 10""".stripMargin,
    "q22_point_range" ->
      s"""$base, h1 AS (${hits("dup")}),
         |hits AS (SELECT h1.doc_id, h1.s FROM h1 JOIN documents d ON h1.doc_id = d.doc_id
         |         WHERE d.n_chars BETWEEN 150 AND 300)
         |${top(10)}""".stripMargin,
    "q25_must_msm2" ->
      s"""$base, hr AS (${hits("table")}),
         |h1 AS (${hits("spark")}), h2 AS (${hits("data")}), h3 AS (${hits("dup")}),
         |hits AS (SELECT hr.doc_id,
         |           hr.s + COALESCE(h1.s, 0) + COALESCE(h2.s, 0) + COALESCE(h3.s, 0) AS s,
         |           (h1.doc_id IS NOT NULL)::INT + (h2.doc_id IS NOT NULL)::INT
         |             + (h3.doc_id IS NOT NULL)::INT AS m
         |         FROM hr LEFT JOIN h1 USING (doc_id) LEFT JOIN h2 USING (doc_id)
         |                 LEFT JOIN h3 USING (doc_id))
         |SELECT doc_id, round(s, 6) AS score FROM hits WHERE m >= 2
         |ORDER BY s DESC, doc_id ASC LIMIT 10""".stripMargin,
    // lang is a 1-token field: tf=1, len=1, avgdl=1 exactly — the score
    // formula below keeps the engine's exact op order with those constants
    "q29_field_scoped" ->
      s"""$base, h1 AS (${hits("spark")}),
         |ls AS (SELECT count(*)::BIGINT AS n FROM documents WHERE lang IS NOT NULL AND lang <> ''),
         |lh AS (SELECT d.doc_id,
         |         ln(1.0 + (ls.n - ldf.df + 0.5) / (ldf.df + 0.5))
         |           - ln(1.0 + (ls.n - ldf.df + 0.5) / (ldf.df + 0.5))
         |             / (1.0 + 1.0 * (1.0 / (1.2 * ((1.0 - 0.75) + 0.75 * 1.0 / 1.0)))) AS s
         |       FROM documents d
         |       CROSS JOIN ls
         |       CROSS JOIN (SELECT count(*)::BIGINT AS df FROM documents WHERE lower(lang) = 'en') ldf
         |       WHERE lower(d.lang) = 'en'),
         |ids AS (SELECT doc_id FROM h1 UNION SELECT doc_id FROM lh),
         |blend AS (SELECT ids.doc_id, COALESCE(h1.s, 0) + COALESCE(lh.s, 0) AS s
         |          FROM ids LEFT JOIN h1 USING (doc_id) LEFT JOIN lh USING (doc_id))
         |SELECT doc_id, round(s, 6) AS score FROM blend
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "q32_field_filter" ->
      s"""$base, h1 AS (${hits("join")}),
         |keep AS (SELECT h1.doc_id, h1.s FROM h1
         |         JOIN documents d ON h1.doc_id = d.doc_id WHERE lower(d.source) = 'src3')
         |SELECT doc_id, round(s, 6) AS score FROM keep
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "q30_after_delete" ->
      s"""$base, h1 AS (${hits("join")}),
         |hits AS (SELECT doc_id, s FROM h1
         |         WHERE doc_id NOT IN (SELECT doc_id FROM sc WHERE term = 'dup'))
         |${top(10)}""".stripMargin,
    "q31_count_after_delete" ->
      s"""$base SELECT
         |  (SELECT count(*) FROM documents)
         |    - (SELECT count(DISTINCT doc_id) FROM sc WHERE term = 'dup') AS live_docs,
         |  (SELECT count(*) FROM sc WHERE term = 'spark'
         |     AND doc_id NOT IN (SELECT doc_id FROM sc WHERE term = 'dup')) AS spark_hits""".stripMargin,
    "q33_exact_dedup" ->
      """SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keeper_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_minhash_neardup" ->
      s"""$shingleBase,
         |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS i
         |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |jpairs AS (SELECT da, db, i::DOUBLE / (sa.n + sb.n - i) AS jac
         |           FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db)
         |SELECT da AS doc_a, db AS doc_b, round(jac, 6) AS jaccard
         |FROM jpairs WHERE jac >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,
    "q35_simhash_neardup" ->
      s"""$base, th AS (
         |  SELECT term, ('0x' || substr(sha256(term), 1, 16))::UBIGINT AS h
         |  FROM (SELECT DISTINCT term FROM tf)
         |), bits AS (
         |  SELECT tf.doc_id, g.b,
         |         sum(CASE WHEN (th.h >> g.b) & 1 = 1 THEN tf.freq ELSE -tf.freq END) AS acc
         |  FROM tf JOIN th USING (term), unnest(generate_series(0, 63)) AS g(b)
         |  GROUP BY 1, 2
         |), sim AS (
         |  SELECT doc_id, sum(CASE WHEN acc > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END)::UBIGINT AS v
         |  FROM bits GROUP BY 1
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       bit_count(xor(a.v, b.v))::BIGINT AS hamming
         |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.v, b.v)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q36_ngram_topsim" ->
      s"""$shingleBase,
         |qn AS (SELECT n FROM sz WHERE doc_id = 98),
         |inter AS (SELECT b.doc_id, count(*)::BIGINT AS i
         |          FROM sh q JOIN sh b ON q.sh = b.sh AND b.doc_id <> 98
         |          WHERE q.doc_id = 98 GROUP BY 1)
         |SELECT inter.doc_id,
         |       round(inter.i::DOUBLE / (sz.n + qn.n - inter.i), 6) AS jaccard
         |FROM inter JOIN sz USING (doc_id) CROSS JOIN qn
         |ORDER BY jaccard DESC, doc_id ASC LIMIT 10""".stripMargin,
    "q37_ann_bruteforce" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cosine
        |FROM e CROSS JOIN q
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    // identical buckets to EmbeddingNearDup.sign/sketch (h=6, T=32), then
    // exact cosine >= 0.4 over bucket-sharing pairs
    "q38_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, embedding FROM embeddings
        |), hp AS (
        |  SELECT t.t, b.b, j.j,
        |         CASE WHEN ((((t.t*6 + b.b)*64 + j.j + 1) * 2654435761) % 4294967296) >= 2147483648
        |              THEN 1.0 ELSE -1.0 END AS sgn
        |  FROM unnest(generate_series(0, 31)) AS t(t),
        |       unnest(generate_series(0, 5)) AS b(b),
        |       unnest(generate_series(0, 63)) AS j(j)
        |), comp AS (
        |  SELECT vec_id, j.j AS j, embedding[j.j + 1]::DOUBLE AS x
        |  FROM e, unnest(generate_series(0, 63)) AS j(j)
        |), bits AS (
        |  SELECT c.vec_id, hp.t, hp.b, CASE WHEN sum(hp.sgn * c.x) > 0 THEN 1 ELSE 0 END AS bit
        |  FROM comp c JOIN hp ON hp.j = c.j
        |  GROUP BY 1, 2, 3
        |), sk AS (
        |  SELECT vec_id, t, sum(bit * (1 << b))::BIGINT AS key FROM bits GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
        |  FROM sk a JOIN sk b ON a.t = b.t AND a.key = b.key AND a.vec_id < b.vec_id
        |), ed AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM e)
        |SELECT cand.va AS vec_a, cand.vb AS vec_b,
        |       round(list_cosine_similarity(ea.v, eb.v), 6) AS cosine
        |FROM cand JOIN ed ea ON ea.vec_id = cand.va JOIN ed eb ON eb.vec_id = cand.vb
        |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    // marker-voting language ID; tiebreak = (hits desc, lang asc); no hit
    // (or no tokens) => 'und'. Sets mirror TextStats.Markers exactly.
    "q40_langid" ->
      s"""$base, m AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN term IN ('der','die','und','das','ist','nicht','ein') THEN freq ELSE 0 END) AS hde,
         |    sum(CASE WHEN term IN ('the','a','of','and','is','to','in') THEN freq ELSE 0 END) AS hen,
         |    sum(CASE WHEN term IN ('el','la','que','y','los','una','por') THEN freq ELSE 0 END) AS hes,
         |    sum(CASE WHEN term IN ('le','et','les','des','une','est','dans') THEN freq ELSE 0 END) AS hfr
         |  FROM tf GROUP BY 1)
         |SELECT d.doc_id,
         |  CASE WHEN m.doc_id IS NULL OR greatest(m.hde, m.hen, m.hes, m.hfr) = 0 THEN 'und'
         |       WHEN m.hde >= m.hen AND m.hde >= m.hes AND m.hde >= m.hfr THEN 'de'
         |       WHEN m.hen >= m.hes AND m.hen >= m.hfr THEN 'en'
         |       WHEN m.hes >= m.hfr THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id ORDER BY d.doc_id""".stripMargin,
    "q41_quality" ->
      s"""$base, en AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN term IN ('the','a','of','and','is','to','in') THEN freq ELSE 0 END)::BIGINT AS hits
         |  FROM tf GROUP BY 1)
         |SELECT d.doc_id,
         |  round(CASE WHEN dl.len IS NULL OR dl.len = 0 THEN 0.0 ELSE
         |    0.5 * least(1.0, dl.len / 50.0)
         |    + 0.25 * (COALESCE(en.hits, 0) / dl.len::DOUBLE)
         |    + 0.25 * (length(regexp_replace(d.text, '[^a-zA-Z0-9 ]', '', 'g')) / length(d.text)::DOUBLE)
         |  END, 6) AS quality
         |FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id
         |LEFT JOIN en ON d.doc_id = en.doc_id ORDER BY d.doc_id""".stripMargin,
    "q42_token_counts" ->
      raw"""$base
           |SELECT d.doc_id, COALESCE(dl.len, 0)::BIGINT AS ws_tokens,
           |  len(regexp_extract_all(lower(d.text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS sub_tokens
           |FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id ORDER BY d.doc_id""".stripMargin,
    // bottom-4 sketch: 4 smallest 16-hex-char shingle hashes, ':'-joined
    // (hex order == unsigned hash order)
    "q43_fingerprint" ->
      s"""$shingleBase,
         |hh AS (SELECT doc_id, substr(sha256(sh), 1, 16) AS h FROM sh),
         |rk AS (SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS r FROM hh),
         |bot AS (SELECT doc_id, string_agg(h, ':' ORDER BY h) AS fp FROM rk WHERE r <= 4 GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(bot.fp, '') AS fp
         |FROM documents d LEFT JOIN bot ON d.doc_id = bot.doc_id ORDER BY d.doc_id""".stripMargin,
    // stub-decode metadata: byte_len from UTF-8, dims from the first two
    // bytes (data is ASCII so ascii(char) == byte), frames = ceil(len/256)
    "q44_multimodal" ->
      """SELECT doc_id,
        |  octet_length(encode(text))::BIGINT AS byte_len,
        |  CASE WHEN length(text) = 0 THEN 0
        |       ELSE 64 + (ascii(substr(text, 1, 1)) % 128) END::BIGINT AS width,
        |  CASE WHEN length(text) = 0 THEN 0
        |       ELSE 64 + (CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1)) ELSE 0 END % 128) END::BIGINT AS height,
        |  CASE WHEN length(text) = 0 THEN 0
        |       ELSE (octet_length(encode(text)) + 255) // 256 END::BIGINT AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q46_field_exists" ->
      s"""$base, h1 AS (${hits("merge")}),
         |hits AS (SELECT h1.doc_id, h1.s FROM h1 JOIN documents d ON h1.doc_id = d.doc_id
         |         WHERE d.lang IS NOT NULL AND d.lang <> '')
         |${top(10)}""".stripMargin,
    "q47_point_in_set" ->
      s"""$base, h1 AS (${hits("table")}),
         |hits AS (SELECT h1.doc_id, h1.s FROM h1 JOIN documents d ON h1.doc_id = d.doc_id
         |         WHERE d.n_chars IN (157, 246, 300, 406, 512))
         |${top(10)}""".stripMargin,
    "q48_ann_ivf_flat" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |ranked AS (
        |  SELECT e.vec_id, c.cid,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY list_cosine_similarity(c.cv, e.v) DESC, c.cid ASC) AS r
        |  FROM e CROSS JOIN c),
        |assign AS (SELECT vec_id, cid FROM ranked WHERE r = 1),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |probes AS (SELECT cid FROM c CROSS JOIN q
        |           ORDER BY list_cosine_similarity(cv, qv) DESC, cid ASC LIMIT 3)
        |SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
        |FROM e JOIN assign USING (vec_id) JOIN probes USING (cid) CROSS JOIN q
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q49_curate" ->
      s"""$base, ${shingleBase.stripPrefix("WITH ")},
         |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS i
         |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |jpairs AS (SELECT da, db, i::DOUBLE / (sa.n + sb.n - i) AS jac
         |           FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db),
         |losers AS (SELECT DISTINCT db AS doc_id FROM jpairs WHERE jac >= 0.8),
         |m AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN term IN ('der','die','und','das','ist','nicht','ein') THEN freq ELSE 0 END) AS hde,
         |    sum(CASE WHEN term IN ('the','a','of','and','is','to','in') THEN freq ELSE 0 END) AS hen,
         |    sum(CASE WHEN term IN ('el','la','que','y','los','una','por') THEN freq ELSE 0 END) AS hes,
         |    sum(CASE WHEN term IN ('le','et','les','des','une','est','dans') THEN freq ELSE 0 END) AS hfr
         |  FROM tf GROUP BY 1),
         |langok AS (
         |  SELECT doc_id FROM m
         |  WHERE greatest(hde, hen, hes, hfr) > 0
         |    AND NOT (hde >= hen AND hde >= hes AND hde >= hfr)
         |    AND (hen >= hes AND hen >= hfr)),
         |qual AS (
         |  SELECT d.doc_id,
         |    round(CASE WHEN dl.len IS NULL OR dl.len = 0 THEN 0.0 ELSE
         |      0.5 * least(1.0, dl.len / 50.0)
         |      + 0.25 * (COALESCE(en.hits, 0) / dl.len::DOUBLE)
         |      + 0.25 * (length(regexp_replace(d.text, '[^a-zA-Z0-9 ]', '', 'g')) / length(d.text)::DOUBLE)
         |    END, 6) AS quality
         |  FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id
         |  LEFT JOIN (SELECT doc_id,
         |      sum(CASE WHEN term IN ('the','a','of','and','is','to','in') THEN freq ELSE 0 END)::BIGINT AS hits
         |    FROM tf GROUP BY 1) en ON d.doc_id = en.doc_id),
         |keepers AS (
         |  SELECT doc_id FROM (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS kp FROM documents)
         |  WHERE doc_id = kp)
         |SELECT k.doc_id FROM keepers k
         |JOIN langok USING (doc_id)
         |JOIN qual USING (doc_id)
         |WHERE qual.quality >= 0.5
         |  AND k.doc_id NOT IN (SELECT doc_id FROM losers)
         |ORDER BY k.doc_id""".stripMargin,
    "q45_stream_stats" ->
      s"""$base SELECT term, count(*)::BIGINT AS df, CAST(sum(freq) AS BIGINT) AS ttf
         |FROM tf WHERE term IN ('spark', 'join', 'dup')
         |GROUP BY term ORDER BY term""".stripMargin,
    // the recall CONTRACT row: the Spark side computes IVF recall@10 vs the
    // brute-force top-10 and asserts the (nProbe=16 of 32) bound; the oracle
    // pins the expected contract values (hash-green iff the bound held)
    "q39_ann_ivf_recall" ->
      """SELECT 10::BIGINT AS k, 16::BIGINT AS n_probe, 32::BIGINT AS n_centroids,
        |       true AS recall_ge_bound""".stripMargin,
    "q51_range_relations" ->
      """WITH r AS (
        |  SELECT l_extendedprice * (1 - l_discount) AS lo, l_extendedprice AS hi
        |  FROM lineitem
        |)
        |SELECT
        |  sum(CASE WHEN lo <= 30000.0 AND hi >= 20000.0 THEN 1 ELSE 0 END)::BIGINT AS n_intersects,
        |  sum(CASE WHEN lo >= 20000.0 AND hi <= 30000.0 THEN 1 ELSE 0 END)::BIGINT AS n_within,
        |  sum(CASE WHEN lo <= 20000.0 AND hi >= 30000.0 THEN 1 ELSE 0 END)::BIGINT AS n_contains,
        |  sum(CASE WHEN (lo <= 30000.0 AND hi >= 20000.0)
        |            AND NOT (lo >= 20000.0 AND hi <= 30000.0)
        |            AND NOT (lo <= 20000.0 AND hi >= 30000.0) THEN 1 ELSE 0 END)::BIGINT AS n_crosses
        |FROM r""".stripMargin,
    "q52_sorted_set_facet" ->
      s"""$base, m AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'dup'),
         |fac AS (SELECT tf.term, count(*)::BIGINT AS cnt FROM tf JOIN m USING (doc_id) GROUP BY 1)
         |SELECT term, cnt FROM fac ORDER BY cnt DESC, term ASC LIMIT 10""".stripMargin,
    // geo distance: same derived coordinates, same haversine (2R·asin·sqrt
    // form), rounded to 6dp (mm-scale; far above cross-libm ulp noise)
    "q57_geo_distance" ->
      """WITH geo AS (
        |  SELECT doc_id,
        |    (doc_id * 7919 % 18000) / 100.0 - 90.0 AS lat,
        |    (doc_id * 104729 % 36000) / 100.0 - 180.0 AS lon
        |  FROM documents
        |), d AS (
        |  SELECT doc_id,
        |    2 * 6371.0088 * asin(sqrt(
        |      pow(sin((radians(lat) - radians(40.0)) / 2), 2)
        |      + cos(radians(lat)) * cos(radians(40.0))
        |        * pow(sin((radians(lon) - radians(-74.0)) / 2), 2))) AS dist_km
        |  FROM geo
        |)
        |SELECT doc_id, round(dist_km, 6) AS dist_km FROM d WHERE dist_km <= 3000.0
        |ORDER BY round(dist_km, 6) ASC, doc_id ASC""".stripMargin,
    // sorted index: new docId = rank of (n_chars desc, doc_id asc); content
    // identity at each rank certified by the sha invariant
    "q56_sorted_index" ->
      """SELECT (row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1)::BIGINT AS doc_id,
        |       sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    // sorted-index early termination: the first 10 'join'-matching docs in
    // the sorted-rank (== docId) order, keyed by content sha
    "q61_sorted_early" ->
      raw"""WITH ranked AS (
           |  SELECT (row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1)::BIGINT AS rid,
           |         text, sha256(text) AS sha
           |  FROM documents
           |), tok AS (
           |  SELECT rid, unnest(string_split_regex(lower(text), '\s+')) AS term FROM ranked
           |), m AS (SELECT DISTINCT rid FROM tok WHERE term = 'join')
           |SELECT ranked.rid AS doc_id, ranked.sha FROM ranked JOIN m USING (rid)
           |ORDER BY doc_id LIMIT 10""".stripMargin,
    // term-vector rows: freq + position extent per (doc, term); positions
    // are 0-based emitted-token ranks (subscripts are 1-based -> -1)
    "q54_term_vectors" ->
      raw"""WITH tl AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
           |  FROM documents WHERE doc_id < 20
           |), pos AS (
           |  SELECT doc_id, unnest(ts) AS term, generate_subscripts(ts, 1) AS p FROM tl
           |)
           |SELECT doc_id, term, count(*)::BIGINT AS freq,
           |       (min(p) - 1)::BIGINT AS first_pos, (max(p) - 1)::BIGINT AS last_pos
           |FROM pos GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,
    // MLT: seeds = doc 98's top-5 terms by freq*idf (tie term asc), blended
    // SHOULD sum over the seeds, seed doc excluded, rounded-score ordering
    "q55_more_like_this" ->
      s"""$base, seeds AS (
         |  SELECT term FROM sc WHERE doc_id = 98
         |  ORDER BY freq * idf DESC, term ASC LIMIT 5
         |), hits AS (
         |  SELECT doc_id, sum(idf - idf / (1.0 + freq * cn)) AS s
         |  FROM sc JOIN seeds USING (term) GROUP BY doc_id
         |)
         |SELECT doc_id, round(s, 6) AS score FROM hits WHERE doc_id <> 98
         |ORDER BY round(s, 6) DESC, doc_id ASC LIMIT 10""".stripMargin,
    // phrase BM25: positions = subscripts of the whitespace token list;
    // phrase freq = adjacent-pair count; weight = idf('table') + idf('hash')
    "q50_phrase" ->
      raw"""$base, tl AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
           |  FROM documents
           |), pos AS (
           |  SELECT doc_id, unnest(ts) AS term, generate_subscripts(ts, 1) AS p FROM tl
           |), pf AS (
           |  SELECT a.doc_id, count(*)::BIGINT AS freq
           |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
           |  WHERE a.term = 'table' AND b.term = 'hash' GROUP BY 1
           |), wsum AS (
           |  SELECT sum(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))) AS w
           |  FROM df CROSS JOIN st WHERE df.term IN ('table', 'hash')
           |), hits AS (
           |  SELECT pf.doc_id,
           |    wsum.w - wsum.w / (1.0 + pf.freq
           |      * (1.0 / (1.2 * ((1.0 - 0.75) + 0.75 * (dl.len % 256) / st.avgdl)))) AS s
           |  FROM pf JOIN dl USING (doc_id) CROSS JOIN wsum CROSS JOIN st
           |)
           |${top(10)}""".stripMargin,
    // offsets: the text is single-space-separated ASCII (verified per sf),
    // so token i's code-point start = sum of prior token lengths + (i-1)
    // separators; first/last extents come from min/max since starts and
    // ends are both strictly ascending in i
    "q58_offsets" ->
      """WITH tl AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id < 20
        |), tk AS (
        |  SELECT doc_id, unnest(ts) AS t, generate_subscripts(ts, 1) AS i FROM tl
        |), tok AS (
        |  SELECT doc_id, lower(t) AS term, i, length(t) AS len,
        |    coalesce(sum(length(t)) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (i - 1) AS strt
        |  FROM tk WHERE t <> ''
        |)
        |SELECT doc_id, term, count(*)::BIGINT AS freq,
        |  min(strt)::BIGINT AS first_start, min(strt + len)::BIGINT AS first_end,
        |  max(strt)::BIGINT AS last_start, max(strt + len)::BIGINT AS last_end
        |FROM tok WHERE term IN ('table', 'hash', 'spark')
        |GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,
    // sloppy phrase, slop 2: anchors = positions of the FIRST term; per
    // anchor the minimal window |a.p - (b.p - 1)| over the second term's
    // positions; freq = sum of 1/(1+width) over widths <= slop; weight =
    // sum of the two idfs (the 2-term closed form of the documented
    // minimal-window semantics — SQL-exact, subscripts are 1-based but
    // only differences enter)
    "q59_sloppy_phrase" ->
      raw"""$base, tl AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
           |  FROM documents
           |), pos AS (
           |  SELECT doc_id, unnest(ts) AS term, generate_subscripts(ts, 1) AS p FROM tl
           |), anch AS (
           |  SELECT a.doc_id, a.p AS p0, min(abs(a.p - (b.p - 1))) AS mw
           |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
           |  WHERE a.term = 'table' AND b.term = 'hash'
           |  GROUP BY a.doc_id, a.p
           |), pf AS (
           |  SELECT doc_id, sum(1.0 / (1 + mw)) AS freq FROM anch WHERE mw <= 2 GROUP BY 1
           |), wsum AS (
           |  SELECT sum(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))) AS w
           |  FROM df CROSS JOIN st WHERE df.term IN ('table', 'hash')
           |), hits AS (
           |  SELECT pf.doc_id,
           |    wsum.w - wsum.w / (1.0 + pf.freq
           |      * (1.0 / (1.2 * ((1.0 - 0.75) + 0.75 * (dl.len % 256) / st.avgdl)))) AS s
           |  FROM pf JOIN dl USING (doc_id) CROSS JOIN wsum CROSS JOIN st
           |)
           |${top(10)}""".stripMargin,
    // compacted-index BM25 == fresh BM25 over the LIVE corpus (docs without
    // 'dup'): stats corrected, tombstoned docs gone; hits keyed by sha, row
    // order = score desc then live-doc order (the compaction remap is
    // monotone, so compacted docId order == old doc_id order among lives)
    "q53_force_merge" ->
      raw"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents
           |), dupdocs AS (
           |  SELECT DISTINCT doc_id FROM tok WHERE term = 'dup'
           |), live AS (
           |  SELECT * FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dupdocs)
           |), ltok AS (
           |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM live
           |), tf AS (
           |  SELECT doc_id, term, count(*)::BIGINT AS freq FROM ltok WHERE term <> '' GROUP BY 1, 2
           |), dl AS (
           |  SELECT doc_id, count(*)::BIGINT AS len FROM ltok WHERE term <> '' GROUP BY 1
           |), st AS (
           |  SELECT count(*)::BIGINT AS n, sum(len)::DOUBLE / count(*) AS avgdl FROM dl
           |), df AS (
           |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
           |), hits AS (
           |  SELECT tf.doc_id,
           |    ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           |      - ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           |        / (1.0 + tf.freq * (1.0 / (1.2 * ((1.0 - 0.75) + 0.75 * (dl.len % 256) / st.avgdl)))) AS s
           |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN st
           |  WHERE tf.term = 'join'
           |)
           |SELECT sha256(d.text) AS sha, round(h.s, 6) AS score
           |FROM hits h JOIN live d USING (doc_id)
           |ORDER BY h.s DESC, d.doc_id ASC LIMIT 10""".stripMargin,
    // tiered merge: stats become MIXED — the big untouched generation
    // (doc_id < 256) keeps its ghost docs in df/avgdl (Lucene semantics
    // until THEIR segment merges) while the merged generations' tombstones
    // are reclaimed. Stat corpus = docs < 256 plus live docs >= 256; hits
    // = live docs only; sha-keyed (merged docIDs remap, monotone)
    "q62_tiered_merge" ->
      raw"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents
           |), dup AS (
           |  SELECT DISTINCT doc_id FROM tok WHERE term = 'dup'
           |), stat AS (
           |  SELECT doc_id, text FROM documents
           |  WHERE doc_id < 256 OR doc_id NOT IN (SELECT doc_id FROM dup)
           |), stok AS (
           |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM stat
           |), stf AS (
           |  SELECT doc_id, term, count(*)::BIGINT AS freq FROM stok WHERE term <> '' GROUP BY 1, 2
           |), sdl AS (
           |  SELECT doc_id, count(*)::BIGINT AS len FROM stok WHERE term <> '' GROUP BY 1
           |), sst AS (
           |  SELECT count(*)::BIGINT AS n, sum(len)::DOUBLE / count(*) AS avgdl FROM sdl
           |), sdf AS (
           |  SELECT term, count(*)::BIGINT AS df FROM stf GROUP BY 1
           |), hits AS (
           |  SELECT stf.doc_id,
           |    ln(1.0 + (sst.n - sdf.df + 0.5) / (sdf.df + 0.5))
           |      - ln(1.0 + (sst.n - sdf.df + 0.5) / (sdf.df + 0.5))
           |        / (1.0 + stf.freq * (1.0 / (1.2 * ((1.0 - 0.75) + 0.75 * (sdl.len % 256) / sst.avgdl)))) AS s
           |  FROM stf JOIN sdl USING (doc_id) JOIN sdf USING (term) CROSS JOIN sst
           |  WHERE stf.term = 'join' AND stf.doc_id NOT IN (SELECT doc_id FROM dup)
           |)
           |SELECT sha256(d.text) AS sha, round(h.s, 6) AS score
           |FROM hits h JOIN documents d USING (doc_id)
           |ORDER BY h.s DESC, d.doc_id ASC LIMIT 10""".stripMargin,
    // payloads: the engine's payload bytes must round-trip to the ORIGINAL
    // token text — re-derived from the raw (non-lowered) text; positions are
    // ranks among emitted (non-empty) tokens, 1-based subscripts -> -1
    "q63_payloads" ->
      raw"""WITH tl AS (
           |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
           |  FROM documents WHERE doc_id < 20
           |), pos AS (
           |  SELECT doc_id, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM tl
           |)
           |SELECT doc_id, lower(t) AS term, (p - 1)::BIGINT AS pos, t AS payload
           |FROM pos WHERE lower(t) IN ('table', 'spark')
           |ORDER BY doc_id, term, pos""".stripMargin,
    "q64_wildcard" ->
      s"""$base, hits AS (SELECT DISTINCT doc_id, 1.0 AS s FROM sc
         |                WHERE regexp_full_match(term, 'h.sh.*'))
         |${top(30)}""".stripMargin,
    "q65_sort_after" ->
      s"""$base, m AS (SELECT DISTINCT doc_id FROM sc WHERE term = 'dup')
         |SELECT d.doc_id, d.n_chars FROM documents d JOIN m ON d.doc_id = m.doc_id
         |ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 10 OFFSET 10""".stripMargin,
    "q66_sorted_after" ->
      raw"""WITH ranked AS (
           |  SELECT (row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1)::BIGINT AS rid,
           |         text, sha256(text) AS sha
           |  FROM documents
           |), tok AS (
           |  SELECT rid, unnest(string_split_regex(lower(text), '\s+')) AS term FROM ranked
           |), m AS (SELECT DISTINCT rid FROM tok WHERE term = 'join')
           |SELECT ranked.rid AS doc_id, ranked.sha FROM ranked JOIN m USING (rid)
           |ORDER BY doc_id LIMIT 10 OFFSET 10""".stripMargin,
    "q67_javalucene_norms" -> s"$baseJl, hits AS (${hits("spark")}) ${top(30)}",
    "q23_missing_term" ->
      "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE 1=0",
    "q24_pure_negative" ->
      "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE 1=0",
    "q26_batch" ->
      s"""$base, ha AS (${hits("spark")}),
         |hj AS (${hits("join")}), hh AS (${hits("hash")}),
         |hb AS (SELECT hj.doc_id, hj.s + hh.s AS s FROM hj JOIN hh USING (doc_id)),
         |h1 AS (${hits("dup")}), h2 AS (${hits("vector")}),
         |ids AS (SELECT doc_id FROM h1 UNION SELECT doc_id FROM h2),
         |hc AS (SELECT ids.doc_id, COALESCE(h1.s, 0) + COALESCE(h2.s, 0) AS s
         |       FROM ids LEFT JOIN h1 USING (doc_id) LEFT JOIN h2 USING (doc_id))
         |SELECT * FROM (
         |  SELECT 'a' AS query_id, doc_id, round(s, 6) AS score FROM
         |    (SELECT * FROM ha ORDER BY s DESC, doc_id ASC LIMIT 10)
         |  UNION ALL
         |  SELECT 'b' AS query_id, doc_id, round(s, 6) AS score FROM
         |    (SELECT * FROM hb ORDER BY s DESC, doc_id ASC LIMIT 10)
         |  UNION ALL
         |  SELECT 'c' AS query_id, doc_id, round(s, 6) AS score FROM
         |    (SELECT * FROM hc ORDER BY s DESC, doc_id ASC LIMIT 10)
         |) ORDER BY query_id, doc_id""".stripMargin
  )
}
