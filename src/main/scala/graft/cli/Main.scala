package graft.cli

import org.apache.spark.sql.SparkSession
import graft.index.{BuildConfig, IndexBuilder, IndexIO}
import graft.search._

/** spark-submit entry points (SURVEY.md §7 module 7). Local runs use
  * `sbt "runMain graft.cli.BuildIndex ..."`; on a cluster the same mains go
  * through spark-submit unchanged.
  */
object CliSpark {
  def session(app: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = SparkSession.builder().appName(app)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // spark-submit provides the master; default to local[cpus] otherwise
    val withMaster = if (sys.props.contains("spark.master")) b else b.master(s"local[$cpus]")
    val s = withMaster.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Build an inverted index from a parquet table.
  * args: <inputParquet> <indexDir> [idCol=doc_id] [contentCol=text]
  *       [numSegments=8] [features]
  * `features` = comma list of `positions,offsets,payloads,termvectors,
  * normjava` (offsets/payloads imply positions) — enables phrase/sloppy
  * queries, postings-based highlighting, per-position payloads, TV-backed
  * facets/MLT, and Java-Lucene SmallFloat norms respectively.
  */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val indexDir = args(1)
    val idCol = if (args.length > 2) args(2) else "doc_id"
    val contentCol = if (args.length > 3) args(3) else "text"
    val numSegments = if (args.length > 4) args(4).toInt else 8
    val features = if (args.length > 5) args(5).split(",").map(_.trim).toSet else Set.empty[String]
    val spark = CliSpark.session("graft-build")
    val df = spark.read.parquet(input)
    val t0 = System.nanoTime()
    val idx = IndexBuilder.buildOrLoad(spark, df, idCol, contentCol, indexDir,
      BuildConfig(numSegments = numSegments,
        storePositions = features("positions") || features("offsets") || features("payloads"),
        storeOffsets = features("offsets"),
        storePayloads = features("payloads"),
        storeTermVectors = features("termvectors"),
        normMode = if (features("normjava")) graft.bm25.NormMode.JavaLucene
                   else graft.bm25.NormMode.Mod256),
      inputPath = input)
    val secs = (System.nanoTime() - t0) / 1e9
    val st = idx.stats
    println(f"[graft] built gen=${idx.manifest.generation} segments=${idx.manifest.numSegments} " +
      f"docs=${st.docCount} fieldDocs=${st.fieldDocCount} terms(sumDf)=${st.sumDocFreq} " +
      f"tokens=${st.sumTotalTermFreq} avgdl=${st.avgdl}%.3f in $secs%.2f s " +
      f"(${st.docCount / math.max(secs, 1e-9)}%.0f docs/s)")
    idx.manifest.segments.foreach(s =>
      println(s"[graft]   segment ${s.segmentId}: docs=${s.docCount} terms=${s.termCount} " +
        s"postings=${s.postingCount} lineage=${s.lineageSha.take(12)}"))
    spark.stop()
  }
}

/** Query an index. Query syntax (one token per arg, Lucene-ish):
  * `+term` = MUST, `-term` = MUST_NOT, `term` = SHOULD, `term*` = prefix,
  * `te?m` / `t*m` (interior wildcards) = WildcardQuery,
  * `re:<regex>` = RegexpQuery (anchored full match),
  * `term~` / `term~1` / `term~2` = FuzzyQuery (default 2 edits),
  * `"w1 w2"` / `"w1 w2"~3` = PhraseQuery (one shell-quoted arg; optional
  * slop suffix — exact phrase when absent),
  * `[lo..hi]` / `[lo..hi)` / `(lo..hi]` / `(lo..hi)` = TermRangeQuery
  * (bracket = inclusive, paren = exclusive, per side).
  * args: <indexDir> <k> <query terms...>
  */
object Search {
  // split on the FIRST `..` separator only (non-greedy lo), so bounds may
  // themselves contain dots (`[v1.2..v1.9]`); both half-open sides supported
  private val RangeRe = """([\[(])(.*?)\.\.(.*)([\])])""".r
  private val FuzzyRe = """(.+?)~(\d*)""".r
  private val PhraseRe = """"(.+)"(?:~(\d+))?""".r

  private def atom(t: String): Query = t match {
    case s if s.startsWith("re:") => RegexpQ(s.drop(3))
    case PhraseRe(words, slop) =>
      PhraseQ(words.trim.split("\\s+").toSeq, Option(slop).map(_.toInt).getOrElse(0))
    case RangeRe(open, lo, hi, close) =>
      TermRangeQ(Option(lo).filter(_.nonEmpty), Option(hi).filter(_.nonEmpty),
        includeLo = open == "[", includeHi = close == "]")
    case s if (s.startsWith("[") || s.startsWith("(")) && s.contains("..") =>
      // looks like a range but failed to parse — don't silently TermQ it
      System.err.println(s"[graft] WARNING: '$s' looks like a range but did not parse; treating as a term")
      TermQ(s)
    case FuzzyRe(base, edits) =>
      val e = if (edits.isEmpty) 2 else edits.toInt
      if (e > 2) {
        // Lucene's FuzzyQuery caps maxEdits at 2; misparses must warn, not
        // silently become a literal TermQ (mirrors the range misparse path)
        System.err.println(s"[graft] WARNING: '$t' requests $e edits but fuzzy supports at most 2; treating as a term")
        TermQ(t)
      } else FuzzyQ(base, e)
    case s if s.endsWith("*") && !s.dropRight(1).exists(c => c == '*' || c == '?') =>
      PrefixQ(s.dropRight(1))
    case s if s.exists(c => c == '*' || c == '?') => WildcardQ(s)
    case s => TermQ(s)
  }

  def parse(terms: Seq[String]): Query = {
    val must = terms.filter(_.startsWith("+")).map(t => atom(t.drop(1)))
    val mustNot = terms.filter(_.startsWith("-")).map(t => atom(t.drop(1)))
    val should = terms.filterNot(t => t.startsWith("+") || t.startsWith("-")).map(atom)
    Query.normalize(BoolQ(must = must, should = should, mustNot = mustNot))
  }

  def main(args: Array[String]): Unit = {
    val indexDir = args(0)
    val k = args(1).toInt
    val (fetchPath, queryArgs) = args.drop(2).partition(_.startsWith("fetch="))
    val q = parse(queryArgs.toSeq)
    val spark = CliSpark.session("graft-search")
    IndexIO.readManifest(spark, indexDir) match {
      case None => System.err.println(s"[graft] no committed index at $indexDir"); sys.exit(2)
      case Some(m) =>
        val searcher = new IndexSearcher(new graft.index.BuiltIndex(indexDir, m))
        println(s"[graft] query: $q")
        val t0 = System.nanoTime()
        val hits = searcher.search(spark, q, k)
        val collected = hits.collect()
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"[graft] ${collected.length} hits in $ms%.1f ms (totalHits=${searcher.count(spark, q)})")
        collected.zipWithIndex.foreach { case (h, i) => println(f"[graft]  #${i + 1}%2d doc=${h.docId}%6d score=${h.score}%.6f") }
        // stored-field fetch-back (IndexReader.Document analogue)
        fetchPath.headOption.foreach { fp =>
          val docs = spark.read.parquet(fp.stripPrefix("fetch="))
          searcher.fetchDocs(spark, spark.createDataset(collected.toSeq)(
              org.apache.spark.sql.Encoders.product[ScoredDoc]), docs, "doc_id")
            .show(k, truncate = 60)
        }
    }
    spark.stop()
  }
}
