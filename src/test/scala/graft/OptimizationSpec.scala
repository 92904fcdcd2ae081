package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.bm25.Bm25
import graft.codec.{ForBlock, MonotonicBlock}
import graft.index._
import graft.search._

/** Focused tests for round-6 optimization internals: the fused
  * doc|freq|norm posting stream, the stats-memo LRU, and the non-scoring
  * field-sort fast path. Each pins the behavior the optimization changed.
  */
class OptimizationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- fused posting stream (TermReader.packedOf / PostingsScorer) ------

  private def mkPostings(docs: Array[Long], freqs: Array[Long],
                         norms: Array[Byte]): TermPostings = {
    val blk = PostingBlock(
      maxDoc = docs.last.toInt, count = docs.length,
      docBytes = MonotonicBlock.encode(docs),
      freqBytes = ForBlock.encode(freqs),
      norms = norms,
      impactFreqs = Array(freqs.max.toInt),
      impactNorms = Array(norms.map(_ & 0xFF).min))
    TermPostings(0, "t", docs.length, freqs.sum, Array(blk), 1)
  }

  test("fused stream: scores bit-identical to the split-array math, incl. freq saturation") {
    val docs = Array(0L, 3L, 7L, 1000L)
    // one freq above the 24-bit field (sentinel path), one AT the sentinel
    val freqs = Array(2L, TermReader.FreqSat.toLong + 5L, TermReader.FreqSat.toLong, 1L)
    val norms = Array[Byte](10, 20, 0xFF.toByte, 30)
    val cache = Bm25.buildCache(avgdl = 17.3)
    val rd = new TermReader(mkPostings(docs, freqs, norms), cache)
    val weight = 1.5
    val ps = new PostingsScorer(rd, weight, cache, scoring = true)
    var got = List.empty[(Int, Double)]
    var d = ps.nextDoc()
    while (d != DISI.NO_MORE) { got ::= (d, ps.score()); d = ps.nextDoc() }
    val want = docs.indices.map { i =>
      (docs(i).toInt,
        Bm25.score(weight, freqs(i).toInt, norms(i) & 0xFF, cache))
    }.toList
    assert(got.reverse == want)
  }

  test("fused stream: advance binary-search lands on packed docIds") {
    val docs = Array(0L, 3L, 7L, 9L, 150L)
    val freqs = Array(1L, 2L, 3L, 4L, 5L)
    val norms = Array[Byte](1, 2, 3, 4, 5)
    val cache = Bm25.buildCache(avgdl = 5.0)
    val rd = new TermReader(mkPostings(docs, freqs, norms), cache)
    val ps = new PostingsScorer(rd, 1.0, cache, scoring = true)
    assert(ps.advance(4) == 7)
    assert(ps.freq == 3 && ps.normByte == 3)
    assert(ps.advance(10) == 150)
    assert(ps.advance(151) == DISI.NO_MORE)
  }

  test("BlockMaxTermScorer: top-k identical to exhaustive term scan under pruning pressure") {
    // many blocks with varied impacts so the threshold actually skips some
    val n = 1000
    val docs = Array.tabulate(n)(i => (i * 3).toLong)
    val rnd = new scala.util.Random(7)
    val freqs = Array.fill(n)((1 + rnd.nextInt(9)).toLong)
    val norms = Array.fill(n)((1 + rnd.nextInt(200)).toByte)
    val cache = Bm25.buildCache(avgdl = 40.0)
    val tp = {
      // multi-block: split via buildBlocks for real impacts per block
      val blocks = IndexBuilder.buildBlocks(docs.map(_.toInt), freqs.map(_.toInt), norms)
      TermPostings(0, "t", n, freqs.sum, blocks, 1)
    }
    for (k <- Seq(1, 3, 10)) {
      def run(pruned: Boolean): Seq[(Long, Double)] = {
        val col = new TopKCollector(k, 0L, None)
        val base = new PostingsScorer(new TermReader(tp, cache), 2.0, cache, scoring = true)
        val s: Scorer =
          if (pruned) new BlockMaxTermScorer(base, () => col.minCompetitive) else base
        var d = s.nextDoc()
        while (d != DISI.NO_MORE) { col.collect(d, s.score()); d = s.nextDoc() }
        col.results.toSeq
      }
      assert(run(pruned = true) == run(pruned = false), s"k=$k")
    }
  }

  test("ReqOptSumScorer block-max pruning: top-k identical to exhaustive (mixed must+should)") {
    val n = 800
    val rnd = new scala.util.Random(11)
    val cache = Bm25.buildCache(avgdl = 30.0)
    def term(gap: Int, seed: Int): TermPostings = {
      val ds = Array.tabulate(n)(i => (i * gap + seed % gap).toLong)
      val r2 = new scala.util.Random(seed)
      val fs = Array.fill(n)((1 + r2.nextInt(7)).toLong)
      val ns = Array.fill(n)((1 + r2.nextInt(150)).toByte)
      val blocks = IndexBuilder.buildBlocks(ds.map(_.toInt), fs.map(_.toInt), ns)
      TermPostings(0, s"t$seed", n, fs.sum, blocks, 2)
    }
    val reqTp = term(2, 13)
    val optTp = term(3, 29)
    for (k <- Seq(1, 5, 10)) {
      def run(pruned: Boolean): Seq[(Long, Double)] = {
        val col = new TopKCollector(k, 0L, None)
        val req = new PostingsScorer(new TermReader(reqTp, cache), 1.7, cache, scoring = true)
        val opt = new PostingsScorer(new TermReader(optTp, cache), 0.9, cache, scoring = true)
        val s = new ReqOptSumScorer(req, opt,
          if (pruned) () => col.minCompetitive else ConjunctionScorer.neverPrune)
        var d = s.nextDoc()
        while (d != DISI.NO_MORE) { col.collect(d, s.score()); d = s.nextDoc() }
        col.results.toSeq
      }
      assert(run(pruned = true) == run(pruned = false), s"k=$k")
    }
  }

  test("DisjunctionSumScorer msm leapfrog: identical (doc, score) stream to brute force") {
    val rnd = new scala.util.Random(23)
    val cache = Bm25.buildCache(avgdl = 25.0)
    // sparse random lists with varied overlap
    def term(seed: Int): (TermPostings, Map[Int, (Int, Int)]) = {
      val r = new scala.util.Random(seed)
      val ds = (0 until 2000).filter(_ => r.nextDouble() < 0.15).toArray
      val fs = ds.map(_ => 1 + r.nextInt(5))
      val ns = ds.map(_ => (1 + r.nextInt(120)).toByte)
      val blocks = IndexBuilder.buildBlocks(ds, fs, ns)
      (TermPostings(0, s"t$seed", ds.length, fs.map(_.toLong).sum, blocks, 2),
        ds.indices.map(i => ds(i) -> (fs(i), ns(i) & 0xFF)).toMap)
    }
    val terms = Seq(31, 37, 41, 43).map(term)
    val weights = Seq(1.1, 0.7, 2.3, 0.4)
    for (msm <- 1 to 4) {
      val subs: Array[Scorer] = terms.zip(weights).map { case ((tp, _), w) =>
        new PostingsScorer(new TermReader(tp, cache), w, cache, scoring = true): Scorer
      }.toArray
      val s = new DisjunctionSumScorer(subs, msm)
      val got = Iterator.continually(s.nextDoc()).takeWhile(_ != DISI.NO_MORE)
        .map(d => (d, s.score())).toList
      // brute force: same per-clause score op order (clause order sum)
      val want = (0 until 2000).flatMap { d =>
        val per = terms.zip(weights).flatMap { case ((_, m), w) =>
          m.get(d).map { case (f, nb) => Bm25.score(w, f, nb, cache) }
        }
        if (per.size >= msm) Some((d, per.sum)) else None
      }.toList
      assert(got == want, s"msm=$msm")
    }
  }

  // ---- stats-memo LRU ---------------------------------------------------

  test("lruCache evicts only the least-recently-used entry, never clears") {
    val m = IndexSearcher.lruCache[String, Int](3)
    m.put("a", 1); m.put("b", 2); m.put("c", 3)
    assert(m.get("a") == 1) // refresh recency of a
    m.put("d", 4)           // evicts b (the LRU), not everything
    assert(m.size() == 3)
    assert(!m.containsKey("b"))
    assert(m.containsKey("a") && m.containsKey("c") && m.containsKey("d"))
  }

  // ---- non-scoring field-sort fast path ---------------------------------

  private lazy val (searcher, fieldsDf) = {
    val docs = (0L until 200L).map { i =>
      (i, s"alpha w${i % 7} " + ("join " * ((i % 5) + 1).toInt) + s"uniq$i", (i * 37 % 211))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-optspec").toString
    val idx = IndexBuilder.build(spark, docs.toDF("doc_id", "text", "n_chars"),
      "doc_id", "text", dir, BuildConfig(numSegments = 4, chunkDocs = 128))
    (new IndexSearcher(idx), docs.map(d => (d._1, d._3)).toDF("doc_id", "n_chars"))
  }

  test("searchSortBy with a score sort column still scores (== search ranks)") {
    val viaSort = searcher.searchSortBy(spark, TermQ("join"), fieldsDf,
      Seq(col("score").desc, col("doc_id").asc), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val viaSearch = searcher.search(spark, TermQ("join"), 10)
      .collect().map(_.docId).toSeq
    assert(viaSort == viaSearch)
  }

  test("searchSortBy field sort (non-scoring path) returns the right rows") {
    val got = searcher.searchSortBy(spark, TermQ("join"), fieldsDf,
      Seq(col("n_chars").desc, col("doc_id").asc), 10)
      .select("doc_id", "n_chars").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 200L).map(i => (i, i * 37 % 211))
      .sortBy { case (id, nc) => (-nc, id) }.take(10)
    assert(got == want)
  }
}
