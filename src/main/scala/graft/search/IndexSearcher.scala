package graft.search

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.bm25.Bm25
import graft.index.{BuiltIndex, SegmentMeta, TermPostings}

/** Query-wide constants resolved ONCE on the driver (≙ Weight creation,
  * `core/search/termquery.go:220-276`: CollectionStatistics + TermStatistics
  * + idf/avgdl baked in) and shipped to executors in the task closure
  * (broadcast-variable scale: a few doubles per query term).
  */
final case class QueryContext(
    idf: Map[String, Double],     // per query term
    cache: Array[Double],         // norm cache, shared across terms
    fieldDocCount: Long) extends Serializable

final case class ScoredDoc(docId: Long, score: Double)

/** Total hit count with its accuracy relation — the reference's
  * `TotalHits` (`core/search/indexsearcher.go:14-16`): EQUAL_TO when every
  * match was counted, GREATER_THAN_OR_EQUAL_TO once dynamic pruning began
  * skipping non-competitive docs (counting stays exact up to the
  * hits-threshold knob, Lucene's totalHitsThreshold). */
final case class TotalHits(value: Long, relation: String)
object TotalHits {
  val EQ = "EQUAL_TO"
  val GTE = "GREATER_THAN_OR_EQUAL_TO"
}

/** Per-segment kernel result for threshold-aware search. */
final case class LeafHits(docId: Long, score: Double, collected: Long, pruned: Boolean)

/** One hit of a batch multi-query run (see [[IndexSearcher.searchMany]]). */
final case class QueryHit(queryId: String, docId: Long, score: Double)

/** Builds the scorer tree for one segment — the Boolean2ScorerSupplier
  * decision tree (`core/search/boolean2scorersupplier.go:74-135`):
  * pure conjunction => req(); pure disjunction => opt() (WAND when pruning
  * is allowed); mixed => ReqOptSum(req, opt); MUST_NOT via ReqExcl.
  */
object ScorerBuilder {

  /** @param minCompetitive collector threshold feedback (enables WAND);
    *                       pass ScorerBuilder.neverPrune for exhaustive
    * @return None when the query matches nothing in this segment
    */
  def build(q: Query, postings: Map[String, TermReader], segDocCount: Int,
            ctx: QueryContext, boost: Double, scoring: Boolean,
            minCompetitive: () => Double): Option[Scorer] = q match {
    case MatchNoneQ => None
    case MatchAllQ => Some(new RangeAllScorer(segDocCount, if (scoring) boost else 0.0))
    case TermQ(t) =>
      postings.get(t).map { rd =>
        val ps = new PostingsScorer(rd, boost * ctx.idf.getOrElse(t, 0.0), ctx.cache, scoring)
        // a ROOT-LEVEL scoring term query gets the ImpactsDISI treatment
        // (skip whole blocks the collector threshold already beats) — live
        // only when this term's score IS the collected score, exactly like
        // WAND's gating: nested clauses arrive here with neverPrune
        if (scoring && (minCompetitive ne neverPrune))
          new BlockMaxTermScorer(ps, minCompetitive)
        else ps
      }
    case BoostQ(sub, b) => build(sub, postings, segDocCount, ctx, boost * b, scoring, minCompetitive)
    case ConstQ(sub, b) =>
      build(sub, postings, segDocCount, ctx, 1.0, scoring = false, minCompetitive)
        .map(inner => new ConstantScoreScorer(inner, if (scoring) boost * b else 0.0))
    case TermInSetQ(ts) =>
      constUnion(ts.toArray.flatMap(t => postings.get(t)), ctx, boost, scoring)
    case MultiTermQ(pred) =>
      // the co-grouped rows were already scan-filtered by this predicate;
      // the exact re-check here only drops rows pulled in by OTHER clauses
      constUnion(postings.iterator.collect { case (t, rd) if pred.matches(t) => rd }.toArray,
        ctx, boost, scoring)
    case DisjMaxQ(qs, tb) =>
      val subs = qs.flatMap(build(_, postings, segDocCount, ctx, boost, scoring, neverPrune)).toArray
      if (subs.isEmpty) None
      else if (subs.length == 1) Some(subs(0))
      else if (scoring)
        // block-max pruning for dismax (Lucene gives DisjunctionMaxQuery the
        // WAND treatment too): live only when this dismax's score IS the
        // collected score — minCompetitive is the collector's feedback at
        // the root and neverPrune when nested, exactly like WandScorer's
        // gating in buildBool
        Some(new DisjMaxWandScorer(subs, tb, minCompetitive))
      else Some(new DisjunctionMaxScorer(subs, tb))
    case PhraseQ(ts, slop) =>
      // every phrase term must have postings in this segment (conjunction);
      // weight = boost * sum of the terms' idfs (Lucene PhraseQuery+BM25)
      val readers = ts.map(postings.get)
      if (readers.exists(_.isEmpty)) None
      else {
        val subs = readers.map(r => new PostingsScorer(r.get, 0.0, ctx.cache, scoring = true)).toArray
        val w = boost * ts.map(t => ctx.idf.getOrElse(t, 0.0)).sum
        Some(new PhraseScorer(subs, w, ctx.cache, scoring, slop))
      }
    case _: PrefixQ | _: RegexpQ | _: TermRangeQ | _: FuzzyQ | _: WildcardQ =>
      throw new IllegalStateException("multi-term queries must be rewritten to MultiTermQ before scoring")
    case b: BoolQ => buildBool(b, postings, segDocCount, ctx, boost, scoring, minCompetitive)
  }

  /** Constant-score union over term readers (TermInSet / MultiTerm body). */
  private def constUnion(rds: Array[TermReader], ctx: QueryContext, boost: Double,
                         scoring: Boolean): Option[Scorer] = {
    val subs = rds.map(rd => new PostingsScorer(rd, 0.0, ctx.cache, scoring = false): Scorer)
    if (subs.isEmpty) None
    else {
      val union = if (subs.length == 1) subs(0) else new DisjunctionSumScorer(subs, 1)
      Some(new ConstantScoreScorer(union, if (scoring) boost else 0.0))
    }
  }

  /** The shared no-pruning sentinel — REFERENCE identity marks a scorer
    * tree as exhaustive (build's TermQ case tests `ne neverPrune` to decide
    * whether block-max term skipping is live), so every non-pruning caller
    * must pass THIS instance, not a fresh equivalent lambda. */
  val neverPrune: () => Double = ConjunctionScorer.neverPrune

  private def buildBool(b: BoolQ, postings: Map[String, TermReader], segDocCount: Int,
                        ctx: QueryContext, boost: Double, scoring: Boolean,
                        minCompetitive: () => Double): Option[Scorer] = {
    // required clauses: every MUST/FILTER must produce a scorer. A LONE
    // scoring MUST with no FILTER/SHOULD clauses IS the collected score
    // (MUST_NOT only removes matches), so it gets the live threshold at
    // construction — one build, not a neverPrune build discarded by a
    // rebuild below
    val loneScoringMust = b.must.size == 1 && b.filter.isEmpty && b.should.isEmpty &&
      scoring && (minCompetitive ne neverPrune)
    val mustPrune = if (loneScoringMust) minCompetitive else neverPrune
    val mustS = b.must.map(q => build(q, postings, segDocCount, ctx, boost, scoring, mustPrune))
    val filtS = b.filter.map(q => build(q, postings, segDocCount, ctx, 1.0, scoring = false, neverPrune))
    if ((mustS ++ filtS).exists(_.isEmpty)) return None
    val must = mustS.flatten.toArray
    val filt = filtS.flatten.toArray
    // block-max pruning is safe only when this conjunction's score IS the
    // final collected score: no SHOULD clauses can add to it (MUST_NOT and
    // FILTER only subtract matches, never score). ConstQ subtrees pass
    // scoring=false, so they never reach here with a live threshold.
    val conjPrune = if (b.should.isEmpty && scoring) minCompetitive
                    else ConjunctionScorer.neverPrune
    val req: Option[Scorer] = (must ++ filt) match {
      case Array() => None
      case Array(one) if must.length <= 1 => Some(one) // incl. the loneScoringMust build above
      case all => Some(new ConjunctionScorer(all, must, conjPrune))
    }

    val msm = math.max(b.minShouldMatch, if (req.isEmpty) 1 else 0)
    val shouldS = b.should.flatMap(q => build(q, postings, segDocCount, ctx, boost, scoring, neverPrune)).toArray
    val opt: Option[Scorer] =
      if (b.should.isEmpty) None
      else if (shouldS.length < msm) None
      else if (shouldS.length == 1 && msm <= 1) Some(shouldS(0))
      else if (req.isEmpty && msm <= 1 && scoring) Some(new WandScorer(shouldS, minCompetitive))
      else Some(new DisjunctionSumScorer(shouldS, msm))

    // combine req/opt (Boolean2ScorerSupplier.getInternal)
    val positive: Option[Scorer] = (req, opt) match {
      case (None, None) => None
      case (None, o @ Some(_)) => o
      case (r @ Some(_), None) =>
        if (b.should.nonEmpty && b.minShouldMatch > 0) None // required shoulds matched nothing here
        else r
      case (Some(r), Some(o)) =>
        if (b.minShouldMatch > 0) Some(new ConjunctionScorer(Array(r, o), Array(r, o)))
        else
          // req+opt sum IS the collected score here (MUST_NOT only removes
          // matches), so the block-max req/opt pruning may use the live
          // threshold; nested trees arrive with neverPrune and stay
          // exhaustive
          Some(new ReqOptSumScorer(r, o,
            if (scoring) minCompetitive else ConjunctionScorer.neverPrune))
    }

    positive.flatMap { pos =>
      val exclS = b.mustNot.flatMap(q => build(q, postings, segDocCount, ctx, 1.0, scoring = false, neverPrune))
      if (exclS.isEmpty) Some(pos)
      else {
        val excl = if (exclS.size == 1) exclS.head else new DisjunctionSumScorer(exclS.toArray, 1)
        Some(new ReqExclScorer(pos, excl))
      }
    }
  }
}

/** Per-segment search kernel: runs the scorer tree over one segment's
  * posting lists and collects a local top-k (≙ one leaf in
  * `IndexSearcher.SearchLeaves`, `core/search/indexsearcher.go:376-392`).
  */
object SegmentKernel {

  /** Apply the segment's live-docs: tombstoned local ids are excluded via a
    * ReqExcl anti-join over the scorer tree (`core/search/weight.go:189-236`
    * live-docs semantics — scores of surviving docs are untouched). */
  private def live(s: Scorer, deleted: Array[Int]): Scorer =
    if (deleted.isEmpty) s else new ReqExclScorer(s, new IntArrayScorer(deleted))

  def topK(q: Query, postings: Map[String, TermReader], seg: SegmentMeta,
           ctx: QueryContext, k: Int, after: Option[(Double, Long)],
           deleted: Array[Int] = Array.emptyIntArray,
           runId: Long = -1L): Iterator[ScoredDoc] = {
    // runId >= 0 joins this leaf to the query's cross-leaf threshold cell
    // (the MaxScoreAccumulator role): leaves sharing an executor JVM raise
    // each other's pruning floor — exact by the strict-floor argument
    val collector = new TopKCollector(k, seg.docBase, after, 0L, runId)
    ScorerBuilder.build(q, postings, seg.docCount.toInt, ctx, 1.0, scoring = true,
        () => collector.minCompetitive) match {
      case None => Iterator.empty
      case Some(s0) =>
        val s = live(s0, deleted)
        var d = s.nextDoc()
        while (d != DISI.NO_MORE) {
          collector.collect(d, s.score())
          d = s.nextDoc()
        }
        collector.results.iterator.map { case (gid, sc) => ScoredDoc(gid, sc) }
    }
  }

  /** topK that ALSO reports the segment's hit count + whether pruning made
    * it a lower bound: one sentinel row (docId = -1) per segment carries
    * (collected, pruned); the rest are the leaf's top-k. */
  def topKWithTotal(q: Query, postings: Map[String, TermReader], seg: SegmentMeta,
                    ctx: QueryContext, k: Int, hitsThreshold: Long,
                    deleted: Array[Int]): Iterator[LeafHits] = {
    val collector = new TopKCollector(k, seg.docBase, None, hitsThreshold)
    ScorerBuilder.build(q, postings, seg.docCount.toInt, ctx, 1.0, scoring = true,
        () => collector.minCompetitive) match {
      case None => Iterator.single(LeafHits(-1L, 0.0, 0L, pruned = false))
      case Some(s0) =>
        val s = live(s0, deleted)
        var d = s.nextDoc()
        while (d != DISI.NO_MORE) {
          collector.collect(d, s.score())
          d = s.nextDoc()
        }
        Iterator.single(LeafHits(-1L, 0.0, collector.collected, collector.pruned)) ++
          collector.results.iterator.map { case (gid, sc) => LeafHits(gid, sc, 0L, pruned = false) }
    }
  }

  /** First `k` matches of the segment in ASCENDING docId order, then STOP —
    * the early-termination leaf collector for sorted indexes (Lucene's
    * TopFieldCollector leaf early-exit when the index sort matches the
    * query sort): on a `buildSorted` index docId order == sort order by
    * construction, so the first k matching docIds ARE the segment's sorted
    * top-k. No scoring work; at most k matches are visited past the last
    * collected one.
    */
  def firstK(q: Query, postings: Map[String, TermReader], seg: SegmentMeta,
             ctx: QueryContext, k: Int,
             deleted: Array[Int] = Array.emptyIntArray,
             afterDoc: Long = -1L): Iterator[ScoredDoc] = {
    // paging cursor (the PagingFieldCollector role on a sorted index,
    // `core/search/topfieldcollector.go` + Lucene's searchAfter(FieldDoc)):
    // docId order == sort order, so "after the last hit of the previous
    // page" is a plain docId lower bound — segments wholly before it skip
    // via one advance() into the skip structure, never a scan
    ScorerBuilder.build(q, postings, seg.docCount.toInt, ctx, 1.0, scoring = false,
        ScorerBuilder.neverPrune) match {
      case None => Iterator.empty
      case Some(s0) =>
        val s = live(s0, deleted)
        var d =
          if (afterDoc >= seg.docBase + seg.docCount) DISI.NO_MORE // page is past this whole segment
          else if (afterDoc >= seg.docBase) s.advance((afterDoc - seg.docBase).toInt + 1)
          else s.nextDoc()
        val out = new scala.collection.mutable.ArrayBuffer[ScoredDoc](k)
        while (d != DISI.NO_MORE && out.size < k) {
          out += ScoredDoc(seg.docBase + d, 0.0)
          d = s.nextDoc()
        }
        out.iterator
    }
  }

  def count(q: Query, postings: Map[String, TermReader], seg: SegmentMeta,
            ctx: QueryContext, deleted: Array[Int] = Array.emptyIntArray): Long = {
    ScorerBuilder.build(q, postings, seg.docCount.toInt, ctx, 1.0, scoring = false,
        ScorerBuilder.neverPrune) match {
      case None => 0L
      case Some(s0) =>
        val s = live(s0, deleted)
        var n = 0L
        var d = s.nextDoc()
        while (d != DISI.NO_MORE) { n += 1; d = s.nextDoc() }
        n
    }
  }

  /** All matching docs with scores (exhaustive; for oracles & set ops). */
  def scoreAll(q: Query, postings: Map[String, TermReader], seg: SegmentMeta,
               ctx: QueryContext, deleted: Array[Int] = Array.emptyIntArray,
               scoring: Boolean = true): Iterator[ScoredDoc] = {
    ScorerBuilder.build(q, postings, seg.docCount.toInt, ctx, 1.0, scoring = scoring,
        ScorerBuilder.neverPrune) match {
      case None => Iterator.empty
      case Some(s0) =>
        val s = live(s0, deleted)
        Iterator.continually {
          val d = s.nextDoc()
          if (d == DISI.NO_MORE) null else ScoredDoc(seg.docBase + d, if (scoring) s.score() else 0.0)
        }.takeWhile(_ != null)
    }
  }
}

/** Driver-side searcher (SURVEY.md §3.2 Spark shape):
  * rewrite + weight on the driver (tiny stats lookup with term pushdown),
  * scorer tree per partition via cogroup over segments, leaf top-k heaps,
  * final `orderBy(score desc, docId asc).limit(k)` ≡ `MergeTopDocs`
  * (global docIds encode (segment asc, localDoc asc), so the tie-break keys
  * are identical to `core/search/topdocs.go:33-110`).
  */
object IndexSearcher {
  /** Stats-memo LRU bound (entries are a term + two longs — ~100 B each,
    * so the bound caps the memo near 100 MB of driver heap). */
  val StatsCacheMaxEntries: Int = 1 << 20

  /** Small-batch merge bound for [[IndexSearcher.searchMany]]: when
    * queries × segments × k (the worst-case pre-merge row count) is at most
    * this, leaf hits are collected and merged on the driver (~40 B/row, so
    * the bound caps the collect near 40 MB); larger batches keep the
    * distributed groupByKey merge. */
  val DriverMergeMaxRows: Long = 1L << 20

  /** Access-order LRU bounded at `max` entries: at the bound each insert
    * evicts only the least-recently-used entry (never the whole map). */
  private[graft] def lruCache[K, V](max: Int): java.util.Map[K, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](1024, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > max
      })
}

final class IndexSearcher(val index: BuiltIndex) extends Serializable {

  /** One shared decoded reader per term per partition (executor-side). */
  private def readers(post: Map[String, TermPostings], ctx: QueryContext): Map[String, TermReader] =
    post.map { case (t, tp) => t -> new TermReader(tp, ctx.cache) }

  /** Resolve the query: normalize, then rewrite PrefixQ/RegexpQ/TermRangeQ
    * into DISTRIBUTED constant-score [[MultiTermQ]]s (Lucene's
    * CONSTANT_SCORE multi-term rewrite, evaluated against the term
    * dictionary ON the executors — the driver never sees the expansion;
    * round-1 collected matching terms to the driver, an unbounded collect
    * on a billion-term dictionary).
    */
  def rewrite(spark: SparkSession, q0: Query): Query = {
    val q1 = Query.normalize(q0)
    val q = Query.normalize(toMultiTerm(q1))
    if (!index.manifest.hasPositions && hasPhrase(q))
      throw new IllegalStateException(
        "phrase query over an index without a positions stream — rebuild with BuildConfig.storePositions=true")
    q
  }

  private def hasPhrase(q: Query): Boolean = q match {
    case PhraseQ(ts, _) => ts.size >= 2
    case BoolQ(m, s, f, n, _) => (m ++ s ++ f ++ n).exists(hasPhrase)
    case BoostQ(s, _) => hasPhrase(s)
    case ConstQ(s, _) => hasPhrase(s)
    case DisjMaxQ(qs, _) => qs.exists(hasPhrase)
    case _ => false
  }

  private def toMultiTerm(q: Query): Query = q match {
    case PrefixQ(p) => ConstQ(MultiTermQ(PrefixPred(p)), 1.0)
    case RegexpQ(p) =>
      // anchored full-match, as Lucene's RegexpQuery automaton semantics
      // (RegexPred.matches uses Matcher.matches — whole-string — so the
      // raw pattern needs no explicit anchors)
      ConstQ(MultiTermQ(RegexPred(p)), 1.0)
    case TermRangeQ(lo, hi, incLo, incHi) =>
      ConstQ(MultiTermQ(RangePred(lo, hi, incLo, incHi)), 1.0)
    case FuzzyQ(t, e) => ConstQ(MultiTermQ(FuzzyPred(t, e)), 1.0)
    case WildcardQ(p) =>
      // wildcard = the escaped-regex automaton (Lucene WildcardQuery is an
      // AutomatonQuery); rides RegexPred incl. its literal-prefix pushdown
      ConstQ(MultiTermQ(RegexPred(WildcardQ.toRegex(p))), 1.0)
    case BoolQ(m, s, f, n, msm) =>
      BoolQ(m.map(toMultiTerm), s.map(toMultiTerm), f.map(toMultiTerm), n.map(toMultiTerm), msm)
    case BoostQ(sub, b) => BoostQ(toMultiTerm(sub), b)
    case ConstQ(sub, b) => ConstQ(toMultiTerm(sub), b)
    case DisjMaxQ(qs, tb) => DisjMaxQ(qs.map(toMultiTerm), tb)
    case other => other
  }

  /** Catalyst translation of a [[TermPredicate]] for the posting-scan
    * pushdown. Prefix/range push to parquet row-group stats directly; a
    * regex pushes its literal prefix (row-group skip) and evaluates the
    * full anchored match post-scan — kernel-side `matches` re-checks
    * exactly either way.
    */
  private def predColumn(p: TermPredicate): org.apache.spark.sql.Column = p match {
    case PrefixPred(pre) => col("term").startsWith(pre)
    case RangePred(lo, hi, incLo, incHi) =>
      val loP = lo.map(v => if (incLo) col("term") >= v else col("term") > v)
      val hiP = hi.map(v => if (incHi) col("term") <= v else col("term") < v)
      (loP.toSeq ++ hiP.toSeq).reduceOption(_ && _).getOrElse(lit(true))
    case r @ RegexPred(pat) =>
      val full = col("term").rlike(s"^(?:$pat)$$")
      val pre = r.literalPrefix
      if (pre.nonEmpty) col("term").startsWith(pre) && full else full
    case FuzzyPred(t, e) =>
      // no sound term prefix/range exists (the first character may be
      // edited), but the LENGTH window is sound — and the builder stores
      // each term's code-point length as its own `termLen` column exactly so
      // this window becomes a PLAIN COMPARISON that pushes to the parquet
      // row-group stats (the sub-linear candidate-generation hook a
      // billion-term dictionary needs; Lucene gets it from the FST walk —
      // a `length(term)` expression would evaluate post-scan on every row).
      // The levenshtein then runs only on the surviving slice: Spark's
      // codegen'd levenshtein is the SAME code-point metric the kernel's
      // banded DP re-checks (and DuckDB's oracle computes), so the filter
      // is exact, not merely a superset.
      val cpLen = t.codePointCount(0, t.length)
      col("termLen").between(cpLen - e, cpLen + e) &&
        org.apache.spark.sql.functions.levenshtein(col("term"), lit(t)) <= e
  }

  /** Fetch stored fields for hits — the `IndexReader.Document(docID)`
    * analogue (`core/search/indexsearcher.go:80-89`): the input table IS the
    * stored-fields file (SURVEY.md §1.4); a broadcast-sized hit set joins
    * back by docId (Catalyst picks a broadcast hash join for k rows).
    */
  def fetchDocs(spark: SparkSession, hits: Dataset[ScoredDoc], docs: DataFrame,
                docIdCol: String): DataFrame = {
    val h = hits.toDF("doc_id", "score")
    if (docIdCol == "doc_id")
      h.join(docs, Seq("doc_id")).orderBy(col("score").desc, col("doc_id").asc)
    else
      h.join(docs, h("doc_id") === docs(docIdCol)).orderBy(col("score").desc, h("doc_id").asc)
  }

  /** Sort-by-field top-k — the TopFieldCollector/FieldValueHitQueue analogue
    * (`core/search/topfieldcollector.go:14-50`): every match joined to a
    * field table (the "doc values"), then `orderBy(sortCols).limit(k)` —
    * Catalyst's TakeOrderedAndProject IS the bounded field-value heap.
    * `fields` must carry a `doc_id` column; numeric/range predicates on it
    * get parquet pushdown (the PointRangeQuery ≡ `between` mapping of
    * SURVEY.md §2.4).
    *
    * Score contract (r6): when no sort column references `score`, the
    * match kernel runs NON-scoring (Lucene's TopFieldCollector does not
    * score either) and the returned `score` column is a constant 0.0 —
    * field-sorted callers wanting real scores must put `score` among
    * `sortCols` or use [[search]].
    */
  def searchSortBy(spark: SparkSession, q0: Query, fields: DataFrame,
                   sortCols: Seq[org.apache.spark.sql.Column], k: Int): DataFrame = {
    // field sort needs scores only when a sort column references the score
    // column; otherwise run the NON-scoring match kernel (constant-score: no
    // freq decode, no norm/idf math — the same fast path searchSortByAfter
    // takes). The returned frame still carries a `score` column for schema
    // stability; it is 0.0 on the non-scoring path.
    // case-INSENSITIVE match (Spark resolves column names case-insensitively
    // by default, so col("SCORE") must also keep the scoring path); a missed
    // reference fails loud, not wrong — the non-scoring frame carries no
    // score column before the limit, so an undetected score sort is an
    // AnalysisException, never a silent constant sort
    val needScore = sortCols.exists(c =>
      org.apache.spark.sql.graft.ColumnRefs.referencedNames(c)
        .exists(_.equalsIgnoreCase("score")))
    if (needScore) {
      val matches = scoreAll(spark, q0).toDF("doc_id", "score")
      matches.join(fields, "doc_id").orderBy(sortCols: _*).limit(k)
    } else {
      // project the (constant) score away BEFORE the match-set/fields join
      // — it would otherwise ride the join exchange once per match — and
      // re-attach it to the k surviving rows for schema stability
      val matches = matchingDocs(spark, q0).toDF("doc_id", "z").select("doc_id")
      matches.join(fields, "doc_id").orderBy(sortCols: _*).limit(k)
        .select(Seq(col("doc_id"), lit(0.0).as("score")) ++
          fields.columns.filterNot(_ == "doc_id").map(col): _*)
    }
  }

  /** Field-sorted searchAfter — the PagingFieldCollector role
    * (`core/search/topfieldcollector.go:14-50`; Lucene's
    * searchAfter(FieldDoc)): page k rows of (sortField asc/desc, doc_id asc)
    * strictly AFTER the cursor `(lastSortValue, lastDocId)`. The cursor
    * predicate (`field < v OR (field = v AND doc_id > d)` for desc) is a
    * plain comparison, so it pushes to the fields table's parquet stats —
    * deep pages prune the field scan instead of re-reading k+page rows.
    * `fields` must carry `doc_id` + `sortField`; pass `after = None` for
    * page 1. Tie-break is always doc_id asc (the Lucene FieldDoc contract).
    */
  def searchSortByAfter(spark: SparkSession, q0: Query, fields: DataFrame,
                        sortField: String, ascending: Boolean, k: Int,
                        after: Option[(Any, Long)]): DataFrame = {
    // field order discards scores entirely, so run the NON-scoring match
    // kernel (constant-score: no freq decode, no norm/idf math) — every
    // page of a deep-paging session repeats this kernel
    val matches = matchingDocs(spark, q0).toDF("doc_id", "z").select("doc_id")
    val f = col(sortField)
    val paged = after match {
      case None => fields
      case Some((v, d)) =>
        val beyond = if (ascending) f > lit(v) else f < lit(v)
        fields.where(beyond || (f === lit(v) && col("doc_id") > d))
    }
    val order = Seq(if (ascending) f.asc else f.desc, col("doc_id").asc)
    matches.join(paged, "doc_id").orderBy(order: _*).limit(k)
  }

  /** Early-terminating top-k over a SORTED index (built with
    * [[graft.index.IndexBuilder.buildSorted]], which makes docId order ==
    * index-sort order; the manifest records the sort): each segment's
    * kernel emits only its FIRST k matches in docId order and stops — it
    * never scores nor visits the rest of its matches — and the global
    * merge keeps the k smallest docIds. Equivalent to
    * [[searchSortBy]]-with-the-index-sort, which scores and sorts EVERY
    * match (rank-identity tested); this is Lucene's
    * TopFieldCollector-on-index-sort early termination, the entire point
    * of index sorting. Returns (docId, 0.0) rows, docId ascending.
    */
  def searchSortedTopK(spark: SparkSession, q0: Query, k: Int,
                       after: Option[Long] = None): Dataset[ScoredDoc] = {
    import spark.implicits._
    require(index.manifest.indexSort.nonEmpty,
      s"index at ${index.indexDir} has no index sort (build with IndexBuilder.buildSorted; " +
        "appends clear it — the appended docIds cannot interleave into the sort order)")
    val q = rewrite(spark, q0)
    val ctx = queryContext(spark, q)
    val afterDoc = after.getOrElse(-1L)
    val perLeaf = runLeaves(spark, q) { (seg, post, del) =>
      SegmentKernel.firstK(q, readers(post, ctx), seg, ctx, k, del, afterDoc)
    }
    perLeaf.orderBy($"docId".asc).limit(k).as[ScoredDoc]
  }

  /** Global term statistics for the query terms: sum over segments, pushed
    * down to the term-sorted parquet (`indexsearcher.go:438-496` analogue).
    * Stats are immutable for a committed index generation, so they are
    * memoized per searcher — repeated-term workloads (interactive sessions,
    * query logs) skip the stats job entirely. Terms absent from the index
    * are cached as (0, 0).
    */
  // Bounded LRU (access-order LinkedHashMap): at the size bound only the
  // LEAST-recently-used entry is evicted per insert, so a long-lived
  // searcher at the boundary keeps its hot working set instead of
  // thrashing between full and cold (the old clear-all did the latter).
  // Driver-side only; synchronized access is not on any hot loop.
  // @transient: the searcher rides every task closure (kernel lambdas call
  // its methods), and a populated memo must not be re-serialized into each
  // task — executors lazily get an empty map they never touch.
  @transient private lazy val statsCache =
    IndexSearcher.lruCache[String, (Long, Long)](IndexSearcher.StatsCacheMaxEntries)

  def termStats(spark: SparkSession, terms: Set[String]): Map[String, (Long, Long)] = {
    if (terms.isEmpty) return Map.empty
    // snapshot cache hits FIRST: inserts below may evict LRU entries, and
    // the result must not depend on entries surviving them
    val hits = terms.iterator
      .flatMap(t => Option(statsCache.get(t)).map(t -> _)).toMap
    val missing = terms -- hits.keySet
    val fetched: Map[String, (Long, Long)] =
      if (missing.isEmpty) Map.empty
      else {
        // collect the per-(term, segment) stat rows and sum on the driver:
        // row count is bounded by |query terms| x |segments| (the same
        // bound the old groupBy's shuffle input had), and skipping the
        // aggregation exchange makes the stats job ONE stage — for a cold
        // interactive query this stage is half its latency. Long sums are
        // exact and order-independent, so the result is identical.
        val f = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
        index.postings(spark)
          .where(col("term").isin(missing.toSeq: _*))
          .select(col("term"), col("docFreq"), col("totalTermFreq"))
          .collect()
          .foreach { r =>
            val t = r.getString(0)
            val (df0, ttf0) = f.getOrElse(t, (0L, 0L))
            f(t) = (df0 + r.getInt(1), ttf0 + r.getLong(2))
          }
        missing.foreach(t => statsCache.put(t, f.getOrElse(t, (0L, 0L))))
        missing.iterator.map(t => t -> f.getOrElse(t, (0L, 0L))).toMap
      }
    (hits ++ fetched).filter(_._2._1 > 0)
  }

  def queryContext(spark: SparkSession, q: Query): QueryContext =
    queryContextFor(termStats(spark, q.terms))

  private def queryContextFor(stats: Map[String, (Long, Long)]): QueryContext = {
    val n = index.stats.fieldDocCount
    val idf = stats.map { case (t, (df, _)) => t -> Bm25.idf(df, n) }
    QueryContext(idf,
      Bm25.buildCacheFor(index.manifest.normMode, index.stats.avgdl), n)
  }

  /** Fuzzy top-k via the [[FuzzyNgrams]] sidecar: candidate terms come
    * from gram SEEKS (In(gram) row-group pushdown — IO ∝ the query's gram
    * postings, not the dictionary), then the query rewrites to the same
    * constant-score term set the scan-filter path would match, so the
    * posting scan gets full term-seek pushdown too. Falls back to the
    * [[FuzzyPred]] scan path when the count threshold cannot prune (short
    * terms) or the candidate set exceeds `maxExpansions` (audited cap,
    * logged — never silently truncated: a capped expansion would change
    * results vs the exhaustive path).
    */
  def searchFuzzySeek(spark: SparkSession, q: FuzzyQ, k: Int, ngrams: FuzzyNgrams,
                      maxExpansions: Int = 4096): Dataset[ScoredDoc] = {
    require(ngrams.generation == index.manifest.generation,
      s"fuzzy sidecar generation ${ngrams.generation} != index generation " +
        s"${index.manifest.generation} — rebuild via FuzzyNgrams.buildOrLoad")
    ngrams.candidates(spark, q.term, q.maxEdits) match {
      case None => search(spark, q, k) // short term: threshold can't prune
      case Some(cand) =>
        val terms = cand.limit(maxExpansions + 1).collect().map(_.getString(0))
        if (terms.length > maxExpansions) {
          System.err.println(s"[graft] WARNING: fuzzy '${q.term}'~${q.maxEdits}: " +
            s"candidates exceed maxExpansions=$maxExpansions — falling back to the scan path")
          search(spark, q, k)
        } else search(spark, ConstQ(TermInSetQ(terms.toSet), 1.0), k)
    }
  }

  /** Top-k search. Returns a DataFrame (doc_id, score) ordered by
    * score desc, doc_id asc, limited to k.
    */
  def search(spark: SparkSession, q0: Query, k: Int,
             after: Option[(Double, Long)] = None): Dataset[ScoredDoc] = {
    import spark.implicits._
    val q = rewrite(spark, q0)
    val ctx = queryContext(spark, q)
    val runId = MaxScoreAccumulator.newRunId()
    val perLeaf = runLeaves(spark, q) { (seg, post, del) =>
      SegmentKernel.topK(q, readers(post, ctx), seg, ctx, k, after, del, runId)
    }
    perLeaf.orderBy($"score".desc, $"docId".asc).limit(k).as[ScoredDoc]
  }

  /** Top-k + [[TotalHits]] with the reference's hits-threshold contract
    * (`core/search/indexsearcher.go:14-16`, `hitsthresholdchecker.go`):
    * hit counting is EXACT until `hitsThreshold` hits have been seen in a
    * leaf; beyond it, dynamic pruning may skip non-competitive docs and the
    * reported total becomes a GREATER_THAN_OR_EQUAL_TO lower bound. Pass
    * hitsThreshold = Long.MaxValue for always-exact totals (pruning off).
    */
  def searchWithTotal(spark: SparkSession, q0: Query, k: Int,
                      hitsThreshold: Long = 1000L): (Array[ScoredDoc], TotalHits) = {
    import spark.implicits._
    val q = rewrite(spark, q0)
    val ctx = queryContext(spark, q)
    val segsDs = spark.createDataset(index.manifest.segments)
    val rows = cogroupLeaves(spark, segsDs, q)((seg, post, del) =>
      SegmentKernel.topKWithTotal(q, readers(post, ctx), seg, ctx, k, hitsThreshold, del))
      .collect()
    val (sentinels, hits) = rows.partition(_.docId == -1L)
    val total = TotalHits(sentinels.map(_.collected).sum,
      if (sentinels.exists(_.pruned)) TotalHits.GTE else TotalHits.EQ)
    val top = hits.map(h => ScoredDoc(h.docId, h.score))
      .sortBy(h => (-h.score, h.docId)).take(k)
    (top, total)
  }

  /** In-process top-k for SELECTIVE queries — the reference's embedded
    * library mode (Lucene runs in-process; ours normally pays 2 Spark jobs
    * per query). When the query terms' total posting count (known from
    * TermStatistics before touching any posting data) is at most
    * `maxLocalPostings`, the posting rows are fetched to the driver via the
    * same pushed-down scan and the SAME segment kernels run locally —
    * millisecond latency, rank-identical by construction. Queries over hot
    * terms exceed the budget and fall back to the distributed path, so this
    * is safe at any corpus size.
    */
  def searchLocal(spark: SparkSession, q0: Query, k: Int,
                  maxLocalPostings: Long = 5000000L): Array[ScoredDoc] = {
    import spark.implicits._
    val q = rewrite(spark, q0)
    // multi-term and tombstoned indexes stay distributed (deletes would need
    // a live-docs fetch; correctness first, the fast path is an optimization)
    if (q.termPreds.nonEmpty || index.manifest.deletedCount > 0L)
      return search(spark, q, k).collect()
    val stats = termStats(spark, q.terms) // one stats job; ctx derives from it
    val ctx = queryContextFor(stats)
    val totalPostings = stats.values.map(_._1).sum
    val hasMatchAll = {
      def f(x: Query): Boolean = x match {
        case MatchAllQ => true
        case BoolQ(m, s, fl, n, _) => (m ++ s ++ fl ++ n).exists(f)
        case BoostQ(s, _) => f(s); case ConstQ(s, _) => f(s)
        case DisjMaxQ(qs, _) => qs.exists(f)
        case _ => false
      }
      f(q)
    }
    if (totalPostings > maxLocalPostings || (hasMatchAll && index.stats.docCount > maxLocalPostings))
      return search(spark, q, k).collect()
    val rows = postingRows(spark, q.terms).collect().groupBy(_.segmentId)
    // one shared run id: sequential leaves inherit each other's thresholds
    // (Lucene's single-threaded leaf-order pruning benefit)
    val runId = MaxScoreAccumulator.newRunId()
    val hits = index.manifest.segments.iterator.flatMap { seg =>
      val post = rows.getOrElse(seg.segmentId, Array.empty)
        .map(tp => tp.term -> new TermReader(tp, ctx.cache)).toMap
      SegmentKernel.topK(q, post, seg, ctx, k, None, runId = runId)
    }.toArray
    hits.sortBy(h => (-h.score, h.docId)).take(k)
  }

  /** Batch execution of a whole query set in ONE distributed job — the
    * throughput shape for cluster-scale workloads (thousands of queries over
    * 10^12 docs): postings for the union of all query terms are read once,
    * every segment scores every query inside one cogroup pass, and per-query
    * top-k merge happens in a tiny final aggregation (numSegments * k rows
    * per query). QPS scales with executors because the (segment x query)
    * work distributes evenly; per-query Spark job scheduling overhead is
    * paid once for the set, not once per query.
    *
    * Rank-identity: same kernels, same tie-break (score desc, global docId
    * asc) as [[search]].
    */
  def searchMany(spark: SparkSession, queries: Seq[(String, Query)], k: Int): Dataset[QueryHit] = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val normed = queries.map { case (id, q) => id -> rewrite(spark, q) }
    val allTerms = normed.flatMap(_._2.terms).toSet
    val allPreds = normed.flatMap(_._2.termPreds).toSet
    val rows = postingRows(spark, allTerms, allPreds)
    // Stats pass on a COLUMN-PRUNED scan: only (term, docFreq, ttf) leave
    // the parquet reader — the blocks column (the index's bulk) is never
    // touched here. Round 2 persisted the full rows to share one read with
    // the kernel job, but the persist (a) blocked column pruning, so the
    // stats job decoded every posting block, and (b) wrote those blocks
    // through the storage-memory path — a memory-bandwidth-bound serial-ish
    // cost that capped 8->32 batch scaling. Two pruned scans are cheaper
    // than one unpruned scan + cache round-trip, and both parallelize.
    val t1 = System.nanoTime()
    // Stats pass. Fast path: collect the per-(term, segment) stat rows and
    // sum on the driver — one stage instead of groupBy's two. The collect
    // is |matched terms| x |segments| rows, so it is gated on a KNOWN
    // driver-safe bound: explicit terms x segments under the cap and no
    // multi-term predicates (whose expansion cardinality is unknown until
    // scanned). Over the cap (huge dictionaries x many segments) the
    // distributed aggregation keeps the collect at |terms| rows.
    val statsRowBound = allTerms.size.toLong * math.max(1, index.manifest.segments.size)
    val stats: scala.collection.Map[String, Long] =
      if (allPreds.isEmpty && statsRowBound <= IndexSearcher.DriverMergeMaxRows) {
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        rows.select(col("term"), col("docFreq")).collect().foreach { r =>
          val t = r.getString(0)
          m(t) = m.getOrElse(t, 0L) + r.getInt(1)
        }
        m
      } else
        rows.groupBy("term").agg(sum("docFreq").as("df"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = index.stats.fieldDocCount
    val ctx = QueryContext(
      stats.iterator.map { case (t, df) => t -> Bm25.idf(df, n) }.toMap,
      Bm25.buildCacheFor(index.manifest.normMode, index.stats.avgdl), n)
    val t2 = System.nanoTime()
    // Task granularity: one-task-per-segment gives |segments| tasks — on a
    // cluster whose core count approaches the segment count that is 1-2
    // waves, and within-wave stragglers stop amortizing (the 4N level of
    // the scaling bench measures exactly this). For SELECTIVE batches
    // (small matched posting volume — the production query-log shape, known
    // from the stats pass before touching any block) the kernel is sharded
    // by query groups: each (segment, shard) task scores 1/shards of the
    // queries, multiplying task count without ever splitting a posting
    // list. The posting rows are replicated per shard, so sharding is
    // gated on replicated volume staying small — a whole-vocabulary batch
    // (matched postings ~ index size) keeps shards = 1 and the old plan.
    val totalPostings = math.max(1L, stats.values.sum)
    val para = spark.sparkContext.defaultParallelism
    val nSegs = index.manifest.segments.size
    // ~4 tasks per core: enough waves that stragglers amortize, few enough
    // that the per-shard decode replication stays cheap (8 tasks/core was
    // measured net-negative: +10% Σ kernel from replicated decode for no
    // wall win)
    val shardsWanted = math.max(1, math.min(8, (4 * para) / math.max(1, nSegs)))
    val shards = math.min(shardsWanted,
      math.max(1L, ShardedPostingsBudget / totalPostings).toInt)
    // per-task kernel CPU attribution (accumulators are ~free): Σ task
    // kernel time is work-invariant across parallelism levels, so
    // wall / (Σ/cores) separates engine scaling from host effects in the
    // GRAFT_BATCH_TIMING line
    val kernelNanos = spark.sparkContext.longAccumulator("graft-batch-kernel-nanos")
    // one run id PER QUERY (shared by that query's segment/shard tasks):
    // concurrent tasks in one executor JVM raise each other's floors
    val runIds: Array[Long] = Array.fill(normed.size)(MaxScoreAccumulator.newRunId())
    val perLeaf: Dataset[QueryHit] = runSegments(spark, rows, shards) { (seg, post, del, shard) =>
      val tk0 = System.nanoTime()
      val rds = readers(post, ctx) // decode memo shared across the shard's queries
      val out = new scala.collection.mutable.ArrayBuffer[QueryHit]()
      normed.iterator.zipWithIndex.foreach { case ((id, q), qi) =>
        if (qi % shards == shard)
          SegmentKernel.topK(q, rds, seg, ctx, k, None, del, runIds(qi))
            .foreach(sd => out += QueryHit(id, sd.docId, sd.score))
      }
      kernelNanos.add(System.nanoTime() - tk0)
      out.iterator
    }
    // per-query merge ≡ MergeTopDocs; the result is small by construction
    // (≤ queries×k rows), so materialize eagerly. When even the PRE-merge
    // row bound (queries × segments × k) is driver-small, collect the leaf
    // hits directly and merge on the driver — same sort, same take(k),
    // identical rows — skipping the groupByKey exchange+stage that
    // dominated small batches (e.g. 200 queries × 8 segments × 10 = 16k
    // rows do not need a 32-task shuffle). Large batches (the scaling
    // bench's 4000/40000-query rows included) keep the distributed merge.
    val merged: Array[QueryHit] =
      if (normed.size.toLong * nSegs * k <= IndexSearcher.DriverMergeMaxRows) {
        perLeaf.collect().groupBy(_.queryId).valuesIterator.flatMap { hits =>
          hits.sortBy(h => (-h.score, h.docId)).take(k)
        }.toArray
      } else
        perLeaf.groupByKey(_.queryId).flatMapGroups { (_, hits) =>
          hits.toArray.sortBy(h => (-h.score, h.docId)).take(k).iterator
        }.collect()
    val t3 = System.nanoTime()
    if (sys.env.contains("GRAFT_BATCH_TIMING"))
      System.err.println(f"[graft-batch] rewrite=${(t1 - t0) / 1e9}%.2f stats=${(t2 - t1) / 1e9}%.2f " +
        f"kernel+merge=${(t3 - t2) / 1e9}%.2f taskKernelSum=${kernelNanos.value / 1e9}%.2f")
    spark.createDataset(merged.toSeq)
  }

  /** Exhaustive (doc, score) stream for every match — oracle/verify path. */
  def scoreAll(spark: SparkSession, q0: Query): Dataset[ScoredDoc] = {
    val q = rewrite(spark, q0)
    val ctx = queryContext(spark, q)
    runLeaves(spark, q)((seg, post, del) =>
      SegmentKernel.scoreAll(q, readers(post, ctx), seg, ctx, del))
  }

  /** Matching docIds only (no scoring work) — the delete-by-query feed. */
  def matchingDocs(spark: SparkSession, q0: Query): Dataset[ScoredDoc] = {
    val q = rewrite(spark, q0)
    val ctx = queryContext(spark, q)
    runLeaves(spark, q)((seg, post, del) =>
      SegmentKernel.scoreAll(q, readers(post, ctx), seg, ctx, del, scoring = false))
  }

  /** SORTED_SET doc-values faceting (`core/document/docvaluestype.go:3-30`
    * SORTED_SET; Lucene's SSDV facet counts): top-k terms by the number of
    * MATCHING docs containing them.
    *
    * Served from the FORWARD structure when the index has one — the
    * term-vectors tree is exactly the doc->terms map Lucene's SSDV column
    * plays (`TermVectors.write` stores it docId-sorted) — so cost is
    * proportional to the MATCHING docs' term sets, not to index size:
    *  - selective queries (<= `maxPushdownIds` matches) push the matched
    *    docIds into the TV scan (parquet In/min-max pushdown on the
    *    docId-sorted files: non-matching row groups are skipped);
    *  - hot queries broadcast-join the match set against a (docId, term)
    *    column-pruned scan — no shuffle of the TV tree, no postings decode.
    *
    * Indexes without term vectors fall back to the postings sweep (one
    * (term, docId) row per posting joined to the match set) — correct at
    * any selectivity but ∝ index size; build with storeTermVectors when
    * facets are part of the workload.
    */
  def facetTopTerms(spark: SparkSession, q0: Query, k: Int,
                    maxPushdownIds: Int = 8192): DataFrame = {
    // the match kernel must run ONCE: facetAgg consumes `matches` twice (the
    // pushdown sample probe, then — for hot queries — the join), and
    // uncached the join branch RECOMPUTES the full distributed search inside
    // its own stages. persist() is bounded (the frame is (doc_id) only);
    // the aggregation is materialized while the cache is live (<= k rows by
    // construction) and the cache dropped before returning.
    val matches = matchingDocs(spark, q0).toDF("doc_id", "z").select("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val out = facetAgg(spark, matches, k, maxPushdownIds)
      spark.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally matches.unpersist(blocking = false)
  }

  /** The lazy facet aggregation over an already-persisted match set —
    * exposed for plan assertions (the public [[facetTopTerms]] materializes
    * while its cache is live). `matches` must be a cached (doc_id) frame. */
  private[graft] def facetAgg(spark: SparkSession, matches: DataFrame, k: Int,
                              maxPushdownIds: Int): DataFrame = {
    import spark.implicits._
    val pairs: DataFrame =
      if (index.manifest.hasTermVectors) {
        val tv = index.termVectorsDf(spark).select(col("docId").as("doc_id"), col("term"))
        val sample = matches.limit(maxPushdownIds + 1).collect().map(_.getLong(0))
        if (sample.length <= maxPushdownIds)
          tv.where(col("doc_id").isin(sample.map(Long.box): _*))
        else
          // hot query: UNHINTED join — the match set is unbounded (MatchAll
          // on 10^12 docs), so Catalyst must stay free to pick a shuffle
          // join; a broadcast hint would collect the whole match set to the
          // driver and hit the broadcast hard limit exactly on the queries
          // this branch exists for. Still never decodes postings.
          tv.join(matches, "doc_id")
      } else {
        val segSize = index.segmentSize
        index.postings(spark).as[TermPostings]
          .flatMap { tp =>
            val base = tp.segmentId.toLong * segSize
            tp.blocks.iterator.flatMap(b =>
              graft.codec.MonotonicBlock.decode(b.docBytes).iterator.map(l => (tp.term, base + l)))
          }
          .toDF("term", "doc_id")
          .join(matches, "doc_id")
      }
    pairs.groupBy("term")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
  }

  /** Hit count with the reference's O(1) shortcuts
    * (`core/search/indexsearcher.go:91-133`). Stats-derived shortcuts are
    * only valid for an index with no tombstones (docFreq is NOT adjusted on
    * delete, Lucene parity) — with deletes, term counts go through the
    * kernel; MatchAll stays O(1) because deletedCount is exact (tombstones
    * are deduplicated at write).
    */
  def count(spark: SparkSession, q0: Query): Long = {
    import spark.implicits._
    val q = rewrite(spark, q0)
    val hasDeletes = index.manifest.deletedCount > 0L
    q match {
      case MatchAllQ => index.stats.docCount - index.manifest.deletedCount
      case TermQ(t) if !hasDeletes => termStats(spark, Set(t)).get(t).map(_._1).getOrElse(0L)
      case MatchNoneQ => 0L
      case _ =>
        val ctx = queryContext(spark, q)
        val segsDs = spark.createDataset(index.manifest.segments)
        cogroupLeaves(spark, segsDs, q)((seg, post, del) =>
          Iterator.single(SegmentKernel.count(q, readers(post, ctx), seg, ctx, del)))
          .reduce(_ + _)
    }
  }

  private def runLeaves(spark: SparkSession, q: Query)(
      kernel: (SegmentMeta, Map[String, TermPostings], Array[Int]) => Iterator[ScoredDoc]): Dataset[ScoredDoc] = {
    import spark.implicits._
    val segsDs = spark.createDataset(index.manifest.segments)
    cogroupLeaves(spark, segsDs, q)(kernel)
  }

  /** Co-locate each segment's metadata with its query-term posting rows.
    * Only the query terms' rows move (parquet term pushdown), so the shuffle
    * is |queryTerms| x |segments| rows regardless of corpus size.
    */
  private def cogroupLeaves[T: org.apache.spark.sql.Encoder : scala.reflect.ClassTag](
      spark: SparkSession, segsDs: Dataset[SegmentMeta], q: Query)(
      kernel: (SegmentMeta, Map[String, TermPostings], Array[Int]) => Iterator[T]): Dataset[T] =
    runSegments(spark, postingRows(spark, q.terms, q.termPreds))(kernel)

  /** Query-term posting rows: only the query terms' (and multi-term
    * predicates') rows leave the parquet scan (term pushdown), so the
    * shuffle is |matching terms| x |segments| rows regardless of corpus
    * size. Predicates stay distributed end to end — never collected.
    */
  private def postingRows(spark: SparkSession, terms: Set[String],
                          preds: Set[TermPredicate] = Set.empty): Dataset[TermPostings] = {
    import spark.implicits._
    val clauses =
      (if (terms.isEmpty) Nil else Seq(col("term").isin(terms.toSeq: _*))) ++
        preds.toSeq.map(predColumn)
    clauses.reduceOption(_ || _) match {
      case None => spark.emptyDataset[TermPostings]
      case Some(where) => index.postings(spark).where(where).as[TermPostings]
    }
  }

  /** Replicated-posting budget for query-sharded batch kernels: sharding
    * duplicates the matched posting rows per shard, so it only engages when
    * shards × matched postings stays under this (selective batches — the
    * query-log norm; a whole-vocabulary batch keeps one task per segment). */
  private val ShardedPostingsBudget = 32000000L

  private def runSegments[T: org.apache.spark.sql.Encoder : scala.reflect.ClassTag](
      spark: SparkSession, rows: Dataset[TermPostings])(
      kernel: (SegmentMeta, Map[String, TermPostings], Array[Int]) => Iterator[T]): Dataset[T] =
    runSegments(spark, rows, 1)((seg, post, del, _) => kernel(seg, post, del))

  /** Run a per-(segment, queryShard) kernel with EXACTLY one group per
    * task, via an explicit partitioner. (A hash cogroup of S segment-groups
    * into S partitions is a balls-in-bins collision — some tasks get 3-4
    * segments while others idle, capping scaling at ~1/maxLoad.) Segment
    * metadata is tiny and rides in the closure; sentinel rows guarantee
    * every (segment, shard) partition runs the kernel even when no query
    * term occurs in it (MatchAllDocs must still match there). With
    * shards > 1 the posting rows and tombstones are replicated per shard
    * (caller gates on volume) so each shard-task is self-contained — used
    * by [[searchMany]] to keep task count well above the core count on
    * selective batches.
    */
  private def runSegments[T: org.apache.spark.sql.Encoder : scala.reflect.ClassTag](
      spark: SparkSession, rows: Dataset[TermPostings], shards: Int)(
      kernel: (SegmentMeta, Map[String, TermPostings], Array[Int], Int) => Iterator[T]): Dataset[T] = {
    val segMetas = index.manifest.segments.map(s => s.segmentId -> s).toMap
    val maxSeg = segMetas.keys.max
    val nSegParts = maxSeg + 1
    val nParts = nSegParts * shards
    val partitioner = new org.apache.spark.Partitioner {
      def numPartitions: Int = nParts
      def getPartition(key: Any): Int = {
        val (sid, sh) = key.asInstanceOf[(Int, Int)]
        (sid % nSegParts) * shards + sh
      }
    }
    val keys = for { sid <- segMetas.keys.toSeq; sh <- 0 until shards } yield (sid, sh)
    // sentinel rows are |segments x shards| tiny tuples: emit them from a
    // handful of map tasks, not one per partition — at interactive scale
    // the extra ~30 no-op tasks per query were pure scheduler latency
    val sentinels = spark.sparkContext
      .parallelize(keys, math.min(nParts, 4))
      .map(k => (k, null: AnyRef))
    // tombstones ride the SAME cogroup shuffle as the posting rows: each
    // shard-task sees its segment's live-docs without any driver round-trip
    val delRdd = index.deleteRows(spark).rdd.flatMap(dr =>
      (0 until shards).iterator.map(sh => ((dr.segmentId, sh), dr: AnyRef)))
    val parted = rows.rdd.flatMap(tp =>
        (0 until shards).iterator.map(sh => ((tp.segmentId, sh), tp: AnyRef)))
      .union(sentinels)
      .union(delRdd)
      .partitionBy(partitioner)
    val out = parted.mapPartitions { it =>
      // one (segment, shard) per partition by construction
      var seg: SegmentMeta = null
      var shard = 0
      val post = Map.newBuilder[String, TermPostings]
      val dels = Array.newBuilder[Int]
      var any = false
      it.foreach { case ((sid, sh), payload) =>
        if (!any) { seg = segMetas(sid); shard = sh; any = true }
        payload match {
          case tp: TermPostings => post += (tp.term -> tp)
          case dr: graft.index.DeleteRow => dels += dr.localDoc
          case _ => // sentinel
        }
      }
      if (!any) Iterator.empty
      else {
        val d = dels.result()
        java.util.Arrays.sort(d)
        kernel(seg, post.result(), d, shard)
      }
    }
    spark.createDataset(out)
  }
}
