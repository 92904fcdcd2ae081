package graft.memory

import graft.analysis.Analyzer
import graft.bm25.Bm25
import graft.search._

/** Single-document, in-heap index + searcher — the reference's
  * `MemoryIndex` (`/root/reference/memory/index.go:104-117,303-318`): add
  * one analyzed document, then `search(query)` returns the BM25 score that
  * document would get (0.0 if it doesn't match). The collection statistics
  * of a 1-doc index are degenerate by definition (N = 1, avgdl = doc
  * length), matching the reference's behavior and its exact-score test
  * fixtures (`memory/index_test.go:36-64`).
  *
  * This is also the engine's scoring oracle: the distributed searcher must
  * agree with it on every single-doc corpus (asserted in ScalaTest).
  */
final class MemoryIndex(analyzer: Analyzer = Analyzer.standard) {
  private var tf: collection.Map[String, Int] = Map.empty
  private var toks: Vector[String] = Vector.empty // emitted-token order (positions)
  private var len: Int = 0
  private var added = false

  /** Add the (single) document's analyzed field. */
  def addField(content: String): this.type = {
    require(!added, "MemoryIndex holds exactly one document")
    val (m, l) = analyzer.termFreqs(content)
    tf = m; len = l; added = true
    toks = analyzer.tokenize(content).map(_.term)
    this
  }

  private def ctx: (Map[String, Double], Array[Double]) = {
    val n = if (len > 0) 1L else 0L
    val idf = tf.keysIterator.map(t => t -> Bm25.idf(1L, math.max(n, 1L))).toMap
    val avgdl = if (n > 0) len.toDouble else 1.0
    (idf, Bm25.buildCache(avgdl))
  }

  /** Score of `q` against the document; None when it does not match. */
  def searchOpt(q0: Query): Option[Double] = {
    val q = Query.normalize(q0)
    val (idf, cache) = ctx
    eval(expand(q), idf, cache, boost = 1.0, scoring = true)
  }

  /** Reference-API shape: score, 0.0 for a non-match (`memory/index.go:303-318`). */
  def search(q: Query): Double = searchOpt(q).getOrElse(0.0)

  /** Dictionary rewrites against the 1-doc "dictionary" (its term set). */
  private def expand(q: Query): Query = q match {
    case PrefixQ(p) => ConstQ(TermInSetQ(tf.keySet.filter(_.startsWith(p)).toSet), 1.0)
    case RegexpQ(p) => ConstQ(TermInSetQ(tf.keySet.filter(_.matches(p)).toSet), 1.0)
    case TermRangeQ(lo, hi, il, ih) =>
      val ts = tf.keySet.filter { t =>
        lo.forall(v => if (il) t >= v else t > v) && hi.forall(v => if (ih) t <= v else t < v)
      }
      ConstQ(TermInSetQ(ts.toSet), 1.0)
    case FuzzyQ(t, e) =>
      ConstQ(TermInSetQ(tf.keySet.filter(FuzzyPred(t, e).matches).toSet), 1.0)
    case WildcardQ(p) =>
      // RegexPred compiles the pattern once for the whole dictionary scan
      // (String.matches would recompile per term)
      val pred = RegexPred(WildcardQ.toRegex(p))
      ConstQ(TermInSetQ(tf.keySet.filter(pred.matches).toSet), 1.0)
    case BoolQ(m, s, f, x, msm) =>
      BoolQ(m.map(expand), s.map(expand), f.map(expand), x.map(expand), msm)
    case BoostQ(s, b) => BoostQ(expand(s), b)
    case ConstQ(s, b) => ConstQ(expand(s), b)
    case DisjMaxQ(qs, tb) => DisjMaxQ(qs.map(expand), tb)
    case other => other
  }

  private def eval(q: Query, idf: Map[String, Double], cache: Array[Double],
                   boost: Double, scoring: Boolean): Option[Double] = q match {
    case MatchNoneQ => None
    case MatchAllQ => Some(if (scoring) boost else 0.0)
    case TermQ(t) =>
      tf.get(t).map { f =>
        if (scoring) Bm25.score(boost * idf.getOrElse(t, 0.0), f, len & 0xFF, cache) else 0.0
      }
    case BoostQ(s, b) => eval(s, idf, cache, boost * b, scoring)
    case ConstQ(s, b) =>
      eval(s, idf, cache, 1.0, scoring = false).map(_ => if (scoring) boost * b else 0.0)
    case TermInSetQ(ts) =>
      if (ts.exists(tf.contains)) Some(if (scoring) boost else 0.0) else None
    case MultiTermQ(pred) =>
      if (tf.keysIterator.exists(pred.matches)) Some(if (scoring) boost else 0.0) else None
    case DisjMaxQ(qs, tb) =>
      val ss = qs.flatMap(eval(_, idf, cache, boost, scoring))
      if (ss.isEmpty) None else Some(ss.max + tb * (ss.sum - ss.max))
    case PhraseQ(ts, slop) =>
      // phrase over the (single) doc's emitted-token sequence; scoring per
      // Lucene PhraseQuery: weight = boost * sum idf, freq = occurrences
      // (sloppy freq via the SAME SloppyMatch kernel as the distributed
      // scorer — in-JVM engine agreement)
      val positions = ts.map(t => toks.indices.filter(i => toks(i) == t).toArray).toArray
      val occ: Double =
        if (positions.exists(_.isEmpty)) 0.0
        else if (slop == 0)
          toks.indices.count(i =>
            i + ts.size <= toks.size && ts.indices.forall(j => toks(i + j) == ts(j))).toDouble
        else SloppyMatch.sloppyFreq(positions, slop)
      if (occ == 0.0) None
      else {
        val w = boost * ts.map(t => idf.getOrElse(t, 0.0)).sum
        Some(if (scoring) Bm25.scoreF(w, occ, len & 0xFF, cache) else 0.0)
      }
    case _: PrefixQ | _: RegexpQ | _: TermRangeQ | _: FuzzyQ | _: WildcardQ =>
      throw new IllegalStateException("expand() must run first")
    case BoolQ(must, should, filter, mustNot, msm0) =>
      val mustS = must.map(eval(_, idf, cache, boost, scoring))
      if (mustS.exists(_.isEmpty)) return None
      if (filter.exists(eval(_, idf, cache, 1.0, scoring = false).isEmpty)) return None
      if (mustNot.exists(eval(_, idf, cache, 1.0, scoring = false).isDefined)) return None
      val shouldS = should.flatMap(eval(_, idf, cache, boost, scoring))
      val msm = math.max(msm0, if (must.isEmpty && filter.isEmpty) 1 else 0)
      if (should.nonEmpty && shouldS.size < msm) return None
      if (must.isEmpty && filter.isEmpty && should.isEmpty) return None
      Some(mustS.flatten.sum + shouldS.sum)
  }
}
