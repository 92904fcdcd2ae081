package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzer, GoWhitespace}
import graft.codec.{ForBlock, Varint}
import graft.bm25.Bm25
import graft.index.{IndexBuilder, Impacts, PostingBlock}

/** Golden fixtures ported from the reference tests (FIXTURES.md §3). */
class AnalyzerSpec extends AnyFunSuite {
  val a = Analyzer.standard

  test("tokenizer golden: 5 whitespace tokens (tokenizer_test.go:10-47)") {
    assert(a.terms("aaaa bbbb cccc dddd eeee") == Vector("aaaa", "bbbb", "cccc", "dddd", "eeee"))
  }

  test("maximal non-whitespace runs, all Go space classes split") {
    assert(a.terms("a\tb\nc d e　f") == Vector("a", "b", "c", "d", "e", "f"))
    assert(a.terms("  leading and   trailing  ") == Vector("leading", "and", "trailing"))
    assert(a.terms("") == Vector())
    assert(a.terms("   ") == Vector())
  }

  test("lowercasing is per-rune (strings.ToLower semantics)") {
    assert(a.terms("Hello WORLD ÄÖÜ") == Vector("hello", "world", "äöü"))
  }

  test("punctuation is NOT split (reference tokenizer is whitespace-only, not UAX#29)") {
    assert(a.terms("foo.bar() x=1;") == Vector("foo.bar()", "x=1;"))
  }

  test("stop filter removes exact matches only") {
    val s = new Analyzer(Set("the", "a"))
    assert(s.terms("The the THE a ab") == Vector("ab"))
  }

  test("offsets are code points and positions increment") {
    val toks = a.tokenize("ab  cd")
    assert(toks.map(t => (t.term, t.position, t.startOffset, t.endOffset)) ==
      Vector(("ab", 0, 0, 2), ("cd", 1, 4, 6)))
  }

  test("termFreqs: counts + field length") {
    val (tf, len) = a.termFreqs("x y x z x")
    assert(len == 5 && tf("x") == 3 && tf("y") == 1 && tf("z") == 1)
  }

  test("Go IsSpace includes U+00A0/U+202F which Java isWhitespace excludes") {
    assert(GoWhitespace.isSpace(0x00A0) && GoWhitespace.isSpace(0x202F) && GoWhitespace.isSpace(0x0085))
    assert(!GoWhitespace.isSpace('x'.toInt) && !GoWhitespace.isSpace(0x200B)) // ZWSP is NOT White_Space
  }
}

class CodecSpec extends AnyFunSuite {
  test("uvarint round-trip (dataio.go WriteUvarint semantics)") {
    val vals = Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L, Int.MaxValue.toLong, Long.MaxValue)
    val out = new java.io.ByteArrayOutputStream()
    vals.foreach(Varint.writeUvarint(out, _))
    val buf = out.toByteArray
    var p = 0
    vals.foreach { v =>
      val (got, np) = Varint.readUvarint(buf, p)
      assert(got == v); p = np
    }
    assert(p == buf.length)
  }

  test("zigzag round-trip (seeded property)") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val v = rnd.nextLong()
      assert(Varint.zigzagDecode(Varint.zigzagEncode(v)) == v)
    }
    assert(Varint.zigzagEncode(0L) == 0L && Varint.zigzagEncode(-1L) == 1L && Varint.zigzagEncode(1L) == 2L)
  }

  test("FOR block round-trip: random longs at every bit width (seeded property)") {
    val rnd = new scala.util.Random(42)
    // span capped so (max - min) cannot overflow a Long (the codec packs
    // docId deltas and freqs — non-negative ints — in production)
    (0 to 61).foreach { bits =>
      (0 until 20).foreach { _ =>
        val n = 1 + rnd.nextInt(300)
        val arr = Array.fill(n) {
          val v = rnd.nextLong() & ((1L << bits) | ((1L << bits) - 1))
          if (rnd.nextBoolean()) v else -v
        }
        assert(ForBlock.decode(ForBlock.encode(arr)).toSeq == arr.toSeq, s"bits=$bits")
      }
    }
  }

  test("FOR block: empty, constant, single, wide-value fallback") {
    assert(ForBlock.decode(ForBlock.encode(Array.emptyLongArray)).isEmpty)
    assert(ForBlock.decode(ForBlock.encode(Array(7L, 7L, 7L))).toSeq == Seq(7L, 7L, 7L))
    assert(ForBlock.decode(ForBlock.encode(Array(42L))).toSeq == Seq(42L))
    val wide = Array(0L, Long.MaxValue - 1, 5L)
    assert(ForBlock.decode(ForBlock.encode(wide)).toSeq == wide.toSeq)
  }

  test("FOR block compresses small deltas (frame-of-reference works)") {
    val docs = Array.tabulate(128)(i => 1000L + i * 3)
    val bytes = ForBlock.encode(docs)
    assert(bytes.length < 128 * 2, s"expected tight packing, got ${bytes.length} bytes")
  }

  test("competitive impacts: pareto-max (competitiveimpactaccumulator.go:40-84)") {
    val freqs = Array(3, 1, 5, 5, 2)
    val norms = Array[Byte](10, 2, 20, 30, 10)
    val (f, n) = Impacts.pareto(freqs, norms, 0, freqs.length)
    // norm 2 -> maxFreq 1; norm 10 -> 3; norm 20 -> 5; norm 30 -> 5 (dominated by 20)
    assert(n.toSeq == Seq(2, 10, 20) && f.toSeq == Seq(1, 3, 5))
  }

  test("PostingsScorer.advance: random targets == linear-scan oracle (seeded property)") {
    import graft.search.{DISI, PostingsScorer, TermReader}
    import graft.index.TermPostings
    val rnd = new scala.util.Random(7)
    val cache = Bm25.buildCache(avgdl = 40.0)
    (0 until 30).foreach { _ =>
      val n = 1 + rnd.nextInt(700)
      var cur = 0
      val docs = Array.fill(n) { cur += 1 + rnd.nextInt(9); cur }
      val freqs = Array.fill(n)(1 + rnd.nextInt(5))
      val norms = Array.fill(n)((rnd.nextInt(250) + 1).toByte)
      val blocks = IndexBuilder.buildBlocks(docs, freqs, norms)
      val reader = new TermReader(TermPostings(0, "t", n, freqs.map(_.toLong).sum, blocks, termLen = 1), cache)
      val sc = new PostingsScorer(reader, 1.0, cache, scoring = true)
      var target = 0
      while (target <= docs.last) {
        target += 1 + rnd.nextInt(40)
        val prev = sc.docId
        val got = sc.advance(target)
        // contract: advance(t) = current doc if already >= t, else first >= t
        val want =
          if (prev != -1 && prev >= target) prev
          else {
            val idx = docs.indexWhere(_ >= target)
            if (idx < 0) DISI.NO_MORE else docs(idx)
          }
        assert(got == want, s"advance($target) from $prev gave $got want $want")
        if (got != DISI.NO_MORE) {
          val i = docs.indexOf(got)
          assert(sc.score() == Bm25.score(1.0, freqs(i), norms(i) & 0xFF, cache))
        }
      }
    }
  }

  test("posting blocks: geometry + impacts per block") {
    val n = 300
    val docs = Array.tabulate(n)(i => i * 2)
    val freqs = Array.tabulate(n)(i => 1 + (i % 7))
    val norms = Array.tabulate(n)(i => ((i % 200) & 0xFF).toByte)
    val blocks = IndexBuilder.buildBlocks(docs, freqs, norms)
    assert(blocks.length == (n + PostingBlock.Size - 1) / PostingBlock.Size)
    assert(blocks.map(_.count).sum == n)
    assert(blocks.last.maxDoc == docs.last)
    val dec = blocks.flatMap(b => graft.codec.MonotonicBlock.decode(b.docBytes))
    assert(dec.toSeq == docs.map(_.toLong).toSeq)
    blocks.foreach(b => assert(b.impactFreqs.nonEmpty && b.impactFreqs.length == b.impactNorms.length))
  }
}

class Bm25Spec extends AnyFunSuite {
  test("idf golden: n=1, N=1 => ln(4/3) (similaritybm25.go:250-252)") {
    assert(math.abs(Bm25.idf(1, 1) - 0.2876820724517809) < 1e-12)
  }

  test("BM25 golden score 0.13076457 (memory/index_test.go:49-64)") {
    // 1 doc "some text", query term "text": idf = ln(4/3), dl = avgdl = 2, freq 1
    val idf = Bm25.idf(1, 1)
    val cache = Bm25.buildCache(avgdl = 2.0)
    val score = Bm25.score(idf, 1, 2, cache)
    assert(math.abs(score - 0.13076457) < 1e-8)
  }

  test("norm mod-256 quirk Q1: 257-token doc scores as doc length 1 (similaritybm25.go:243)") {
    val cache = Bm25.buildCache(avgdl = 100.0)
    val w = 1.0
    val s257 = Bm25.score(w, 1, 257 & 0xFF, cache)
    val s1 = Bm25.score(w, 1, 1, cache)
    assert(s257 == s1)
    assert(Bm25.score(w, 1, 256 & 0xFF, cache) == Bm25.score(w, 1, 0, cache))
  }

  test("score is monotone: up in freq, down in (unmasked) length") {
    val cache = Bm25.buildCache(avgdl = 50.0)
    assert(Bm25.score(1.0, 5, 40, cache) > Bm25.score(1.0, 2, 40, cache))
    assert(Bm25.score(1.0, 2, 10, cache) > Bm25.score(1.0, 2, 200, cache))
  }
}
