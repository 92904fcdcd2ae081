package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Shared text-dedup primitives (LLM-training-pipeline operators).
  *
  * Tokenization is the engine's analyzer chain (lowercase + whitespace
  * runs, `analysis/Analyzer.scala`) so dedup agrees with the index's view
  * of a document. Shingle/token hashes are the first 8 bytes of
  * sha256(UTF-8) read as an unsigned 64-bit value — platform-independent,
  * seedless, and reproducible in any other system (the DuckDB oracles
  * recompute them bit-for-bit).
  */
object TextHash {
  /** Unsigned-64 view of sha256(s)[0..8) (big-endian). */
  def h64(s: String): Long = {
    val d = graft.index.IndexBuilder.sha256Digest(s)
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) | ((d(2) & 0xFFL) << 40) |
      ((d(3) & 0xFFL) << 32) | ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }

  /** Distinct word k-shingles (space-joined). */
  def shingles(text: String, k: Int): Array[String] = {
    val toks = Analyzer.standard.terms(text)
    if (toks.length < k) Array.empty
    else (0 to toks.length - k).iterator.map(i => toks.slice(i, i + k).mkString(" "))
      .toSet.toArray
  }
}

/** Shared LSH-bucket machinery: ordered candidate pairs out of one bucket,
  * bounded by `maxBucket` (degenerate hot buckets would otherwise go
  * quadratic). One implementation keeps the cap/sort/pairing semantics in
  * lockstep across MinHash, SimHash, and embedding LSH.
  *
  * NO SILENT CAPS: a truncated bucket reports its dropped-id count through
  * `onDropped` — the operators feed a Spark accumulator and WARN after the
  * run, so a cap that actually fired is visible (a silently dropped hot
  * bucket would read as "no near-duplicates in boilerplate docs", the exact
  * docs most likely to BE near-duplicates). */
private[pipeline] object LshBuckets {
  val noDropObserver: Int => Unit = _ => ()

  /** (a, b) with a < b over the sorted, capped id set. */
  def boundedPairs(ids0: Array[Long], maxBucket: Int,
                   onDropped: Int => Unit = noDropObserver): Iterator[(Long, Long)] = {
    java.util.Arrays.sort(ids0)
    val n = math.min(ids0.length, maxBucket)
    if (ids0.length > n) onDropped(ids0.length - n)
    for { i <- (0 until n).iterator; j <- (i + 1) until n } yield (ids0(i), ids0(j))
  }

  /** As [[boundedPairs]] but rows carry a payload (sorted by id). */
  def boundedPairsWith[P](rows0: Array[(Long, P)], maxBucket: Int,
                          onDropped: Int => Unit = noDropObserver): Iterator[((Long, P), (Long, P))] = {
    val rows = rows0.sortBy(_._1)
    val n = math.min(rows.length, maxBucket)
    if (rows.length > n) onDropped(rows.length - n)
    for { i <- (0 until n).iterator; j <- (i + 1) until n } yield (rows(i), rows(j))
  }

  /** Post-run cap audit: WARN when any bucket truncated (accumulator sum of
    * dropped ids), so capped coverage is never mistaken for full coverage. */
  def warnIfDropped(op: String, acc: org.apache.spark.util.LongAccumulator): Unit =
    if (acc.value > 0L)
      System.err.println(s"[graft-pipeline] WARNING: $op truncated hot LSH buckets — " +
        s"${acc.value} bucket-member ids dropped (maxBucket cap); pairs within the " +
        "dropped tail were NOT examined. Raise maxBucket or pre-dedup exact duplicates.")
}

/** Exact deduplication: hash-groupBy on sha256(content) — one shuffle of
  * (sha, id) pairs, never content. At 100 TB this is the cheapest dedup
  * pass: the shuffle moves 40ish bytes/doc regardless of document size.
  */
object ExactDedup {

  /** (doc_id, keeper_id): keeper = the smallest doc_id with identical
    * content. A doc is a duplicate iff doc_id != keeper_id. Built with the
    * codegen'd sha2() expression — the content column never shuffles
    * (aggregate is on the 64-hex digest).
    */
  def keeperMap(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol).cast("long").as("doc_id"),
      sha2(coalesce(col(textCol).cast("string"), lit("")), 256).as("sha"))
    val keepers = hashed.groupBy("sha").agg(min("doc_id").as("keeper_id"))
    hashed.join(keepers, "sha").select("doc_id", "keeper_id")
  }

  /** Input with exact duplicates dropped (keeper survives). */
  def dropDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = keeperMap(docs, idCol, textCol)
      .where(col("doc_id") === col("keeper_id")).select("doc_id")
    docs.join(keep, docs(idCol) === keep("doc_id")).drop(keep("doc_id"))
  }
}

/** MinHash + LSH banding near-duplicate detection (Broder'97 resemblance;
  * banding per MMDS ch.3). NEVER all-pairs: candidates come only from
  * shared LSH buckets, and every candidate is verified with the EXACT
  * shingle Jaccard before being reported — the output contains no
  * approximation, only (possibly) missed pairs below the recall curve
  * 1-(1-J^r)^b (with the defaults, a J=0.9 pair is missed with p≈1e-14).
  *
  * Scale shape (100 TB): signatures are a narrow map (one pass over the
  * text, nothing shuffles but (docId, 32 longs)); banding explodes to b
  * rows/doc; bucket groups are bounded by `maxBucket` (a degenerate hot
  * bucket — boilerplate shingle sets — would otherwise go quadratic);
  * verification joins candidate pairs against the exploded shingle-hash
  * table, shuffling only shingles of docs that are IN a candidate pair.
  */
object MinHashLsh {

  final case class Params(
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16,
      threshold: Double = 0.8,
      maxBucket: Int = 10000) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** Deterministic affine mixers (seeded; odd multipliers). */
  private def mixers(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L)
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }

  /** MinHash signature of a shingle-hash set. */
  def signature(shingleHashes: Array[Long], a: Array[Long], b: Array[Long]): Array[Long] = {
    val sig = Array.fill(a.length)(Long.MaxValue)
    var i = 0
    while (i < shingleHashes.length) {
      val h = shingleHashes(i)
      var j = 0
      while (j < a.length) {
        val v = a(j) * h + b(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Near-duplicate pairs (doc_a < doc_b, exact jaccard >= threshold),
    * columns (doc_a, doc_b, jaccard) with jaccard rounded to 6dp.
    */
  def nearDuplicates(spark: SparkSession, docs: DataFrame, idCol: String,
                     textCol: String, p: Params = Params()): DataFrame = {
    import spark.implicits._
    val (ma, mb) = mixers(p.numHashes)
    val k = p.shingleK
    val bands = p.bands
    val rpb = p.rowsPerBand

    val docsTyped = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("text"))
      .as[(Long, String)]

    // banded bucket rows straight from a NARROW map: shingle, minhash, and
    // band keys are all per-doc computations — nothing shuffles until the
    // (band, bucket, doc) rows (b rows/doc of ~24 B, regardless of doc
    // size) group into buckets
    val bucketRows = docsTyped
      .flatMap { case (id, text) =>
        val hs = TextHash.shingles(text, k).map(TextHash.h64)
        if (hs.isEmpty) Iterator.empty
        else {
          val sig = signature(hs, ma, mb)
          (0 until bands).iterator.map { band =>
            var h = 1125899906842597L ^ band
            var j = band * rpb
            while (j < (band + 1) * rpb) { h = h * 0x9E3779B97F4A7C15L + sig(j); j += 1 }
            (band, h, id)
          }
        }
      }
      .toDF("band", "bucket", "doc_id")

    locally {
      // candidate pairs from shared buckets (bounded per bucket; drops audited)
      val maxBucket = p.maxBucket
      val dropped = spark.sparkContext.longAccumulator("minhash-lsh-dropped-ids")
      // persisted because it has TWO consumers (candDocs below and the
      // `inter` join): uncached, Catalyst re-executes the whole upstream
      // subtree — scan + shingle/signature map over EVERY doc + band
      // shuffle — once per consumer (seen in the r06 before-plan: the
      // signature MapPartitions chain appears twice). Bounded like the
      // shingle cache: candidate pairs only, spillable.
      val candidates = bucketRows.as[(Int, Long, Long)]
        .groupByKey(r => (r._1, r._2))
        .flatMapGroups { (_, it) =>
          LshBuckets.boundedPairs(it.map(_._3).toArray, maxBucket, d => dropped.add(d.toLong))
        }
        .distinct()
        .toDF("doc_a", "doc_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // EXACT Jaccard verification — shingles are re-derived ONLY for docs
      // that appear in >= 1 candidate pair (semi-join pushdown): the clean
      // majority of a 100 TB corpus never materializes a shingle row here
      val candDocs = candidates
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val candShingles = docsTyped.toDF("doc_id", "text")
        .join(candDocs, "doc_id")
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          TextHash.shingles(text, k).iterator.map(sh => (id, TextHash.h64(sh)))
        }
        .toDF("doc_id", "shash")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = candShingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = candidates
        .join(candShingles.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(candShingles.as("sb"),
          col("doc_b") === col("sb.doc_id") && col("sa.shash") === col("sb.shash"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      val verified = inter
        .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
        .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (col("i").cast("double") / (col("na.n") + col("nb.n") - col("i"))).as("j"))
        .where(col("j") >= p.threshold)
        .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
      // materialize the (bounded: only pairs above threshold) result while
      // the shingle cache is live, then release the cache — no driver
      // round-trip; the returned frame is itself cached
      val out = verified.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      LshBuckets.warnIfDropped("MinHashLsh.nearDuplicates", dropped)
      candShingles.unpersist(blocking = false)
      candidates.unpersist(blocking = false)
      out
    }
  }
}

/** SimHash near-duplicate detection (Charikar'02; Manku et al. WWW'07 for
  * the chunked-banding search). 64-bit tf-weighted fingerprint over
  * sha256-derived token hashes; candidate pairs share at least one of 4
  * 16-bit chunks, which by pigeonhole GUARANTEES every pair at hamming
  * distance <= 3 is found (3 differing bits can corrupt at most 3 chunks)
  * — recall 1.0 by construction, not probabilistically.
  */
object SimHash {

  /** 64-bit simhash of analyzed tokens; None for an empty (0-token) doc
    * (empty docs are trivially identical — exact dedup's job). */
  def simhash64(text: String): Option[Long] = {
    val (tf, len) = Analyzer.standard.termFreqCounts(text)
    if (len == 0) return None
    val acc = new Array[Long](64)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = TextHash.h64(e.getKey)
      val f = e.getValue.toLong
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += f else acc(b) -= f
        b += 1
      }
    }
    var v = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) v |= (1L << b); b += 1 }
    Some(v)
  }

  /** Pairs (doc_a < doc_b, hamming <= maxHamming), columns
    * (doc_a, doc_b, hamming). maxHamming <= 3 keeps the 4-chunk pigeonhole
    * guarantee; larger values lower recall below 1 (documented trade).
    */
  def nearDuplicates(spark: SparkSession, docs: DataFrame, idCol: String,
                     textCol: String, maxHamming: Int = 3,
                     maxBucket: Int = 100000): DataFrame = {
    import spark.implicits._
    val sigs = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) => simhash64(text).map(v => (id, v)) }
      .toDF("doc_id", "sim")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val chunked = sigs.as[(Long, Long)].flatMap { case (id, v) =>
        (0 until 4).iterator.map(c => (c, (v >>> (16 * c)) & 0xFFFFL, id, v))
      }.toDF("chunk", "key", "doc_id", "sim")
      val dropped = spark.sparkContext.longAccumulator("simhash-dropped-ids")
      val pairs = chunked.as[(Int, Long, Long, Long)]
        .groupByKey(r => (r._1, r._2))
        .flatMapGroups { (_, it) =>
          LshBuckets.boundedPairsWith(it.map(r => (r._3, r._4)).toArray, maxBucket,
              d => dropped.add(d.toLong))
            .flatMap { case ((ida, va), (idb, vb)) =>
              val hd = java.lang.Long.bitCount(va ^ vb)
              if (hd <= maxHamming) Iterator.single((ida, idb, hd)) else Iterator.empty
            }
        }
        .toDF("doc_a", "doc_b", "hamming")
        .distinct()
        .orderBy("doc_a", "doc_b")
      val out = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      LshBuckets.warnIfDropped("SimHash.nearDuplicates", dropped)
      out
    } finally sigs.unpersist(blocking = false)
  }
}

/** Exact n-gram Jaccard similarity search: top-k most similar documents to
  * a query document, computed via the inverted shingle table (only docs
  * sharing >= 1 shingle with the query are touched — the posting-join
  * shape, never a corpus scan per query).
  */
object NgramJaccard {

  def topSimilar(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
                 queryDocId: Long, k: Int, shingleK: Int = 3): DataFrame = {
    import spark.implicits._
    val shingleRows = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        TextHash.shingles(text, shingleK).iterator.map(sh => (id, TextHash.h64(sh)))
      }
      .toDF("doc_id", "shash")
    val sizes = shingleRows.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // query shingles broadcast into the join (tiny by construction)
    val qs = broadcast(shingleRows.where(col("doc_id") === queryDocId).select("shash"))
    val qn = sizes.where(col("doc_id") === queryDocId).select("n")
    val inter = shingleRows.join(qs, "shash")
      .where(col("doc_id") =!= queryDocId)
      .groupBy("doc_id").agg(count(lit(1)).as("i"))
    inter.join(sizes, "doc_id").crossJoin(broadcast(qn).withColumnRenamed("n", "qn"))
      .select(col("doc_id"),
        round(col("i").cast("double") / (col("n") + col("qn") - col("i")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_id").asc)
      .limit(k)
  }
}
