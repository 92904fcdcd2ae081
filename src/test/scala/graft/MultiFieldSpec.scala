package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.BuildConfig
import graft.search._

/** Multi-field semantics: Term = (field, text); statistics per field
  * (`core/search/termquery.go:61`, `core/index/fieldinfos.go`). */
class MultiFieldSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val corpus: Vector[(Long, String)] = TestCorpus.generate(400, seed = 11)
  // second field: short categorical text sharing SOME tokens with content
  // ("import" appears in both fields -> same term, different stats per field)
  val rows: Vector[(Long, String, String)] = corpus.map { case (id, text) =>
    val tag = if (id % 5 == 0) "import hot" else if (id % 3 == 0) "cold zone" else "warm zone"
    (id, text, tag)
  }

  lazy val mf: MultiFieldSearcher = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mf").toString
    val df = spark.createDataset(rows).toDF("doc_id", "body", "tag")
    new MultiFieldSearcher(MultiFieldIndex.buildOrLoad(spark, df, "doc_id",
      Seq("body", "tag"), dir, BuildConfig(numSegments = 3, chunkDocs = 128)))
  }

  test("same term, two fields, different ranks and statistics") {
    val inBody = mf.search(spark, "body", TermQ("import"), 10).collect().map(_.docId).toSeq
    val inTag = mf.search(spark, "tag", TermQ("import"), 10).collect().map(_.docId).toSeq
    assert(inBody.nonEmpty && inTag.nonEmpty)
    assert(inBody != inTag, "field-scoped ranking must use the field's own postings/stats")
    // tag-field matches are exactly the id % 5 == 0 docs
    assert(mf.count(spark, "tag", TermQ("import")) == rows.count(_._1 % 5 == 0))
    // per-field df: body df comes from the body corpus, independent of tag
    val bodyDf = rows.count(r => graft.analysis.Analyzer.standard.termFreqs(r._2)._1.contains("import"))
    assert(mf.count(spark, "body", TermQ("import")) == bodyDf)
  }

  test("tag field scores: every 'import hot' doc scores identically (tf=1, len=2, avgdl const)") {
    val hits = mf.searcher("tag").scoreAll(spark, TermQ("import")).collect()
    assert(hits.map(_.score).distinct.length == 1)
  }

  test("blended cross-field sum == manual per-field composition") {
    val k = 12
    val got = mf.searchBlended(spark, Seq(("body", TermQ("def"), 1.0), ("tag", TermQ("hot"), 2.0)), k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val body = mf.searcher("body").scoreAll(spark, TermQ("def")).collect().map(h => h.docId -> h.score).toMap
    val tag = mf.searcher("tag").scoreAll(spark, TermQ("hot")).collect().map(h => h.docId -> 2.0 * h.score).toMap
    val want = (body.keySet ++ tag.keySet).toSeq
      .map(id => (id, BigDecimal(body.getOrElse(id, 0.0) + tag.getOrElse(id, 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (id, s) => (-s, id) }.take(k)
    assert(got == want)
  }

  test("cross-field filter: body scores, tag predicate") {
    val got = mf.searchFiltered(spark, "body", TermQ("def"), "tag", TermQ("cold"), 10)
      .collect().map(r => r.getLong(0)).toSet
    val coldIds = rows.collect { case (id, _, tag) if tag.contains("cold") => id }.toSet
    assert(got.nonEmpty && got.subsetOf(coldIds))
  }
}
