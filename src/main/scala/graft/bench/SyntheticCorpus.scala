package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.search._

/** Deterministic synthetic source-code corpus (FIXTURES.md §1): Zipf-ish hot
  * keywords (the stop-word-grade skew path), mid-frequency identifiers, rare
  * identifiers; log-normal doc lengths including empty docs (norm 0) and
  * docs > 255 tokens (the mod-256 norm quirk,
  * `/root/reference/core/search/similaritybm25.go:243`).
  *
  * Content is a pure function of (seed, docId), so the corpus is identical
  * regardless of generation parallelism — required for the N-vs-4N
  * rank-identity and scaling runs (BASELINE.md bench protocol).
  */
object SyntheticCorpus {
  val Seed = 42L
  val hot: Vector[String] = Vector("import", "def", "return", "val", "class",
    "public", "static", "int", "string", "if")
  val mid: Vector[String] = Vector.tabulate(80)(i => s"fn$i")

  def text(docId: Long): String = {
    val rnd = new scala.util.Random(Seed ^ (docId * 0x9E3779B97F4A7C15L))
    val len =
      if (rnd.nextDouble() < 0.02) 0
      else if (rnd.nextDouble() < 0.05) 256 + rnd.nextInt(80)
      else 1 + math.min(400, math.exp(3.2 + rnd.nextGaussian() * 0.9).toInt)
    val sb = new java.lang.StringBuilder(len * 6)
    var i = 0
    while (i < len) {
      if (i > 0) sb.append(' ')
      val r = rnd.nextDouble()
      sb.append(
        if (r < 0.55) hot(rnd.nextInt(hot.size))
        else if (r < 0.85) mid(rnd.nextInt(mid.size))
        else s"id_${rnd.nextInt(800)}")
      i += 1
    }
    sb.toString
  }

  /** Generate (doc_id, content) distributed; deterministic per docId. */
  def df(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map(id => (id, text(id))).toDF("doc_id", "content")
  }

  /** Write (once) to parquet with enough files that any session sees
    * parallel input; returns the path. Cached across rounds.
    *
    * v2 layout: files are docId-RANGE-partitioned and sorted within — the
    * natural layout of an ingested corpus (ids assigned at write time) and
    * the contract of the zero-shuffle `assumeContiguous` build path. The
    * default (shuffled) build path does identical work on any layout, so
    * one corpus serves both measurements.
    */
  def ensureParquet(spark: SparkSession, n: Long, files: Int, dir: String): String = {
    import org.apache.spark.sql.functions.col
    val path = s"$dir/graft-bench-corpus-v2-$n"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      df(spark, n).repartitionByRange(files, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** The reference query set (FIXTURES.md): seeded mix of single-term,
    * conjunction, disjunction (with minShouldMatch), mixed, boosted and
    * dis-max queries over the corpus vocabulary.
    *
    * NOTE on what this set measures: its term UNION covers essentially the
    * WHOLE vocabulary (hot + mid + rare), so a batch over it moves and
    * decodes the entire index — a deliberate worst case. Production query
    * logs touch a small slice of the dictionary per batch; see
    * [[selectiveQueries]] for that shape.
    */
  def referenceQueries(count: Int): Seq[(String, Query)] =
    mkQueries(count, new scala.util.Random(Seed),
      hot ++ mid.take(20) ++ Vector.tabulate(40)(i => s"id_${(i * 97) % 800}"))

  /** Production-shaped batch: the same query-shape mix drawn from a FIXED
    * sample of <= 5% of the corpus vocabulary (real query logs concentrate
    * on a sliver of the dictionary per batch — hot-term caches and scan
    * pushdown then touch a correspondingly small slice of the index).
    * Vocabulary = 10 hot + 80 mid + 800 rare = 890 terms; the pool below is
    * 44 terms (2 hot, 12 mid, 30 rare), seeded and disjoint-stable across
    * processes.
    */
  def selectiveQueries(count: Int): Seq[(String, Query)] = {
    val rnd = new scala.util.Random(Seed + 1)
    val pool = rnd.shuffle(hot).take(2) ++
      rnd.shuffle(mid).take(12) ++
      rnd.shuffle(Vector.tabulate(800)(i => s"id_$i")).take(30)
    mkQueries(count, rnd, pool.toVector)
  }

  private def mkQueries(count: Int, rnd: scala.util.Random,
                        pool: Vector[String]): Seq[(String, Query)] = {
    def pick(k: Int): Seq[String] = rnd.shuffle(pool).take(k)
    (0 until count).map { i =>
      val q: Query = i % 5 match {
        case 0 => TermQ(pool(rnd.nextInt(pool.size)))
        case 1 => BoolQ(must = pick(2 + rnd.nextInt(2)).map(TermQ(_)))
        case 2 => BoolQ(should = pick(2 + rnd.nextInt(4)).map(TermQ(_)),
                        minShouldMatch = if (i % 3 == 0) 2 else 1)
        case 3 => BoolQ(must = pick(1).map(TermQ(_)), should = pick(2).map(TermQ(_)),
                        mustNot = if (i % 2 == 0) pick(1).map(TermQ(_)) else Nil)
        case _ => DisjMaxQ(pick(2).map(TermQ(_)), 0.3)
      }
      s"q$i" -> q
    }
  }
}
