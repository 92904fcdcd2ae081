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
