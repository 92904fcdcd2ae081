package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** LLM-pipeline dedup operators vs in-JVM brute-force oracles on a corpus
  * with PLANTED duplicates (exact copies + near copies with small edits). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // base corpus + planted exact dups (id 1000+i copies id i) and near dups
  // (id 2000+i = id i with one token swapped at position 3)
  val base: Vector[(Long, String)] = TestCorpus.generate(300, seed = 21)
    .filter(_._2.split(" ").length >= 12) // near-dup edits need some length
  val exactDups: Vector[(Long, String)] = base.take(10).map { case (id, t) => (1000L + id, t) }
  val nearDups: Vector[(Long, String)] = base.slice(10, 25).map { case (id, t) =>
    val toks = t.split(" ")
    toks(3) = "mutated"
    (2000L + id, toks.mkString(" "))
  }
  val corpus: Vector[(Long, String)] = base ++ exactDups ++ nearDups
  lazy val docsDf = spark.createDataset(corpus).toDF("doc_id", "text")

  def bruteJaccard(a: String, b: String, k: Int = 3): Double = {
    val (sa, sb) = (TextHash.shingles(a, k).toSet, TextHash.shingles(b, k).toSet)
    if (sa.isEmpty || sb.isEmpty) 0.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  test("exact dedup keeper map == brute force") {
    val got = ExactDedup.keeperMap(docsDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byText = corpus.groupBy(_._2).map { case (_, g) => g.map(_._1).toSet -> g.map(_._1).min }
    corpus.foreach { case (id, _) =>
      val keeper = byText.collectFirst { case (ids, kp) if ids.contains(id) => kp }.get
      assert(got(id) == keeper, s"doc $id")
    }
    // the planted copies must point at their originals
    exactDups.foreach { case (id, _) => assert(got(id) == id - 1000L) }
  }

  test("MinHash-LSH near-dup pairs == brute-force Jaccard >= threshold (planted recall 100%)") {
    val tau = 0.6
    val got = MinHashLsh.nearDuplicates(spark, docsDf, "doc_id", "text",
        MinHashLsh.Params(threshold = tau))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      i <- corpus.indices.iterator
      j <- (i + 1) until corpus.size
      if bruteJaccard(corpus(i)._2, corpus(j)._2) >= tau
    } yield {
      val (a, b) = (corpus(i)._1, corpus(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty, "planted near-dups must produce pairs")
    // reported jaccard values are the EXACT jaccard (verification pass)
    val withJ = MinHashLsh.nearDuplicates(spark, docsDf, "doc_id", "text",
        MinHashLsh.Params(threshold = tau))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val byId = corpus.toMap
    withJ.foreach { case ((a, b), j) =>
      val exact = BigDecimal(bruteJaccard(byId(a), byId(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == exact, s"pair ($a,$b)")
    }
  }

  test("SimHash near-dup pairs == brute-force hamming <= 3 (pigeonhole recall 1.0)") {
    val got = SimHash.nearDuplicates(spark, docsDf, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val sims = corpus.flatMap { case (id, t) => SimHash.simhash64(t).map(id -> _) }
    val want = (for {
      i <- sims.indices.iterator
      j <- (i + 1) until sims.size
      hd = java.lang.Long.bitCount(sims(i)._2 ^ sims(j)._2)
      if hd <= 3
    } yield ((math.min(sims(i)._1, sims(j)._1), math.max(sims(i)._1, sims(j)._1)), hd)).toMap
    assert(got == want)
    assert(want.nonEmpty, "planted dups must be simhash-close")
  }

  test("language ID: marker voting with deterministic tiebreak") {
    val cases = Seq(
      "the cat sat of the mat" -> "en",
      "der hund und die katze ist da" -> "de",
      "el que la y los una" -> "es",
      "le chat et les des une" -> "fr",
      "xyzzy qwerty asdf" -> "und",
      "" -> "und",
      "the der" -> "de") // 1-1 tie -> lang ascending wins
    cases.foreach { case (t, want) =>
      assert(TextStats.languageOf(t) == want, s"text '$t'")
    }
    val df = spark.createDataset(cases.zipWithIndex.map { case ((t, _), i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val got = TextStats.languageId(spark, df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((_, want), i) => assert(got(i.toLong) == want) }
  }

  test("quality score: bounds, empties, monotonicity in length") {
    assert(TextStats.qualityOf("") == 0.0)
    val short = TextStats.qualityOf("a b")
    val long = TextStats.qualityOf(Seq.fill(60)("the good text").mkString(" "))
    assert(short > 0.0 && long > short && long <= 1.0)
    val noisy = TextStats.qualityOf("@@!! ## $$ %%")
    assert(noisy < short, "punctuation noise must lower quality")
  }

  test("token counts: whitespace vs BPE-ish subword counts") {
    val got = TextStats.tokenCounts(spark,
        spark.createDataset(Seq((1L, "Hello, world42 x-y"))).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(got.getLong(1) == 3L) // hello, / world42 / x-y
    // hello , world 42 x - y => 7
    assert(got.getLong(2) == 7L)
  }

  test("fingerprint: identical shingle sets => identical fingerprints; edits change them") {
    val a = "one two three four five six seven"
    val b = "one two three four five six seven" // identical
    val c = "one two three four five six DIFFERENT"
    assert(TextStats.fingerprintOf(a) == TextStats.fingerprintOf(b))
    assert(TextStats.fingerprintOf(a) != TextStats.fingerprintOf(c))
    assert(TextStats.fingerprintOf("one two") == "") // < 3 tokens -> no shingles
    assert(TextStats.fingerprintOf(a).split(":").length == 4)
  }

  test("multimodal: payload plumbing, stub decode, features, frame sampling") {
    val df = spark.createDataset(Seq((1L, "x" * 600), (2L, "ab"), (3L, ""))).toDF("doc_id", "text")
    val assets = Multimodal.attachPayload(df, "doc_id", "text")
    val meta = Multimodal.decode(spark, assets)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(meta(1L) == ((600L, 64 + ('x' % 128), 64 + ('x' % 128), 3)))
    assert(meta(2L) == ((2L, 64 + ('a' % 128), 64 + ('b' % 128), 1)))
    assert(meta(3L) == ((0L, 0, 0, 0)))
    val feats = Multimodal.features(spark, assets)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).sum > 0.999f && feats(1L).sum < 1.001f, "L1-normalized histogram")
    assert(feats(3L).sum == 0f)
    val frames = Multimodal.sampleFrames(spark, assets, stride = 2).collect()
    // doc 1: 3 frames, stride 2 -> frames 0 and 2
    assert(frames.filter(_.getLong(0) == 1L).map(_.getInt(1)).sorted.toSeq == Seq(0, 2))
    assert(frames.forall(_.getString(2).length == 64))
  }

  test("n-gram Jaccard top-k == brute force (query = a planted near-dup's original)") {
    val qid = base(12)._1 // has a planted near-dup at 2000+qid
    val got = NgramJaccard.topSimilar(spark, docsDf, "doc_id", "text", qid, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val qText = corpus.toMap.apply(qid)
    val want = corpus.filter(_._1 != qid)
      .map { case (id, t) => (id, BigDecimal(bruteJaccard(qText, t))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .filter(_._2 > 0.0)
      .sortBy { case (id, j) => (-j, id) }.take(5)
    assert(got == want)
    assert(got.head._1 == 2000L + qid, "the planted near-dup must rank first")
  }
}
