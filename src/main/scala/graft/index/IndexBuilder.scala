package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.analysis.Analyzer
import graft.codec.ForBlock

/** One analyzed row of the staging dataset.
  * Posting rows: `term != null`, (freq, normByte) set, `sha == null`.
  * Doc-sentinel rows (one per doc, emitted even for empty docs):
  * `term == null`, `norm` = full field length, `sha` = sha256(content)
  * (per-row invariant, BASELINE.json input_hint).
  */
final case class TokRow(
    segmentId: Int, salt: Int, term: String, localDoc: Int,
    freq: Int, normByte: Int, norm: Int, sha: String)

/** Partial postings of one (segment, term, salt) chunk — the per-partition
  * sorted posting list of Phase A (≙ a DWPT's in-RAM segment,
  * `core/index/documentswriterperthread.go`).
  */
final case class ChunkPostings(
    segmentId: Int, term: String, salt: Int,
    docFreq: Int, totalTermFreq: Long, blocks: Array[PostingBlock])

final case class DocMeta(segmentId: Int, docId: Long, norm: Int, sha: String)

/** @param numSegments   S: index segments = contiguous docId ranges. Each
  *                      segment is the unit of independent query execution
  *                      (Lucene leaf ≙ Spark partition). Choose S so a
  *                      segment's postings fit comfortably in one task.
  * @param chunkDocs     salt granularity: postings of one (segment, term) are
  *                      first built per docId-chunk of this size, bounding
  *                      every shuffle group even for stop-word-grade hot
  *                      terms (north rule skew handling). Must be a multiple
  *                      of PostingBlock.Size.
  * @param outputPartitions shuffle width of the final merge/write (defaults
  *                      to spark.sql.shuffle.partitions)
  * @param stageCheckpoint write the analyzed staging dataset to parquet under
  *                      the index dir instead of caching — the resumable
  *                      path for large corpora
  * @param stopWords     analyzer stop set (reference default: empty)
  */
final case class BuildConfig(
    numSegments: Int = 8,
    chunkDocs: Int = 1 << 16,
    outputPartitions: Option[Int] = None,
    stageCheckpoint: Boolean = false,
    stopWords: Set[String] = Set.empty)

/** Spark-native inverted-index builder (SURVEY.md §7 modules 3-4).
  *
  * Shape (scale-first; each arrow is where the reference has a thread or
  * file boundary, SURVEY.md §3.1):
  *
  *   Dataset[(docId, content)]
  *     -> flatMap analyze            (≙ DefaultIndexingChain.processField)
  *     -> repartition(seg,term,salt) + sortWithinPartitions + streaming
  *        block encode               (≙ FreqProxTermsWriter flush; salted so
  *                                     hot terms are bounded by chunkDocs)
  *     -> repartitionByRange(seg,term) + ordered concat of chunk blocks
  *                                   (≙ SegmentMerger, stub in the reference;
  *                                     semantics: docIDs remapped by base,
  *                                     stats summed)
  *     -> parquet partitioned by segment, files sorted by term (plays the
  *        FST term dictionary's role via parquet min/max data skipping)
  *
  * Every shuffle group is bounded: Phase A groups by (segment, term, salt)
  * hold <= chunkDocs postings; Phase B groups hold <= segmentSize/chunkDocs
  * chunk rows. No collect() anywhere; driver only sees per-segment stats.
  */
object IndexBuilder {

  def indexFingerprint(inputPath: String, docCount: Long): String =
    sha256Hex(s"graft-index:$inputPath:$docCount")

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Build (or load, if a manifest with a matching corpus fingerprint is
    * already committed — the `segments_N` resumability analogue) an index.
    *
    * @param docs   input with a dense non-negative Long id column and a
    *               String content column
    */
  def buildOrLoad(spark: SparkSession, docs: DataFrame, docIdCol: String,
                  contentCol: String, indexDir: String,
                  cfg: BuildConfig = BuildConfig(),
                  inputPath: String = ""): BuiltIndex = {
    IndexIO.readManifest(spark, indexDir) match {
      case Some(m) if inputPath.nonEmpty && m.corpusSha == indexFingerprint(inputPath, m.stats.docCount) =>
        new BuiltIndex(indexDir, m)
      case _ => build(spark, docs, docIdCol, contentCol, indexDir, cfg, inputPath)
    }
  }

  def build(spark: SparkSession, docs: DataFrame, docIdCol: String,
            contentCol: String, indexDir: String,
            cfg: BuildConfig = BuildConfig(),
            inputPath: String = ""): BuiltIndex = {
    import spark.implicits._
    require(cfg.chunkDocs % PostingBlock.Size == 0, "chunkDocs must be a multiple of block size")

    val input: Dataset[(Long, String)] =
      docs.select(col(docIdCol).cast("long").as("_1"), col(contentCol).cast("string").as("_2"))
        .as[(Long, String)]

    // one tiny agg to fix the segment geometry (driver-side scalars only)
    val (maxIdRow, docCount) = {
      val r = input.agg(max($"_1"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val segSize: Long = math.max(1L, (maxIdRow + cfg.numSegments) / cfg.numSegments)
    require(segSize <= Int.MaxValue, "segment size must fit in Int (raise numSegments)")

    val analyzer = new Analyzer(cfg.stopWords)
    val chunkDocs = cfg.chunkDocs
    val segSizeL = segSize

    val analyzed: Dataset[TokRow] = input.flatMap { case (docId, content) =>
      val seg = (docId / segSizeL).toInt
      val local = (docId - seg.toLong * segSizeL).toInt
      val salt = local / chunkDocs
      val (tf, len) = analyzer.termFreqs(content)
      val nb = len & 0xFF
      val sha = sha256Hex(if (content == null) "" else content)
      tf.iterator.map { case (t, f) => TokRow(seg, salt, t, local, f, nb, 0, null) } ++
        Iterator.single(TokRow(seg, salt, null, local, 0, 0, len, sha))
    }

    val staged: Dataset[TokRow] =
      if (cfg.stageCheckpoint) {
        val stagingDir = s"$indexDir/staging"
        analyzed.write.mode("overwrite").parquet(stagingDir)
        spark.read.parquet(stagingDir).as[TokRow]
      } else analyzed.persist(StorageLevel.MEMORY_AND_DISK)

    // ---- doc metadata (norms + sha256 invariant) ----------------------
    val docmeta = staged.filter(_.term == null)
      .map(r => DocMeta(r.segmentId, r.segmentId.toLong * segSizeL + r.localDoc, r.norm, r.sha))
    docmeta.write.mode("overwrite").partitionBy("segmentId").parquet(s"$indexDir/docmeta")

    // ---- Phase A: per-chunk posting blocks ----------------------------
    val postingsRaw = staged.filter(_.term != null)
    val outParts = cfg.outputPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val chunks: Dataset[ChunkPostings] = postingsRaw
      .repartition(outParts, $"segmentId", $"term", $"salt")
      .sortWithinPartitions($"segmentId", $"term", $"salt", $"localDoc")
      .mapPartitions(encodeChunks _)

    // ---- Phase B: merge chunks into final per-segment posting lists ---
    val merged: Dataset[TermPostings] = chunks
      .repartitionByRange(outParts, $"segmentId", $"term")
      .sortWithinPartitions($"segmentId", $"term", $"salt")
      .mapPartitions(mergeChunks _)

    merged.write.mode("overwrite").partitionBy("segmentId").parquet(s"$indexDir/postings")
    if (!cfg.stageCheckpoint) staged.unpersist()

    // ---- stats + manifest (small aggs; driver holds only S rows) ------
    val postingsDf = spark.read.parquet(s"$indexDir/postings")
    val segPostStats = postingsDf
      .groupBy($"segmentId")
      .agg(count(lit(1)).as("termCount"), sum($"docFreq").as("sumDocFreq"),
           sum($"totalTermFreq").as("sumTotalTermFreq"), sum($"docFreq").as("postingCount"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docmetaDf = spark.read.parquet(s"$indexDir/docmeta")
    val segDocStats = docmetaDf
      .groupBy($"segmentId")
      .agg(count(lit(1)).as("docCount"), sum(when($"norm" > 0, 1L).otherwise(0L)).as("fieldDocCount"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    val segs = segDocStats.keys.toSeq.sorted.map { sid =>
      val (dc, fdc) = segDocStats(sid)
      val (tc, sdf, sttf, pc) = segPostStats.getOrElse(sid, (0L, 0L, 0L, 0L))
      SegmentMeta(sid, sid.toLong * segSizeL, dc, fdc, sttf, sdf, tc, pc,
        bytesWritten = 0L,
        lineageSha = sha256Hex(s"$sid:${sid.toLong * segSizeL}:$dc:$sttf"))
    }
    val stats = IndexStats(
      docCount = segs.map(_.docCount).sum,
      fieldDocCount = segs.map(_.fieldDocCount).sum,
      sumTotalTermFreq = segs.map(_.sumTotalTermFreq).sum,
      sumDocFreq = segs.map(_.sumDocFreq).sum)
    val manifest = Manifest(
      generation = IndexIO.readManifest(spark, indexDir).map(_.generation + 1).getOrElse(1L),
      numSegments = cfg.numSegments,
      segmentSize = segSize,
      stats = stats, segments = segs,
      corpusSha = indexFingerprint(inputPath, docCount))
    IndexIO.writeManifest(spark, indexDir, manifest)
    new BuiltIndex(indexDir, manifest)
  }

  /** Streaming chunk encoder: input iterator sorted by (seg, term, salt,
    * localDoc); constant memory per (seg, term, salt) group (<= chunkDocs).
    */
  private def encodeChunks(it: Iterator[TokRow]): Iterator[ChunkPostings] = {
    new Iterator[ChunkPostings] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): ChunkPostings = {
        val h = buf.head
        val (seg, term, salt) = (h.segmentId, h.term, h.salt)
        val docs = Array.newBuilder[Int]
        val freqs = Array.newBuilder[Int]
        val norms = Array.newBuilder[Byte]
        var n = 0
        var ttf = 0L
        while (buf.hasNext && buf.head.segmentId == seg && buf.head.term == term && buf.head.salt == salt) {
          val r = buf.next()
          docs += r.localDoc; freqs += r.freq; norms += r.normByte.toByte
          ttf += r.freq; n += 1
        }
        ChunkPostings(seg, term, salt, n, ttf,
          buildBlocks(docs.result(), freqs.result(), norms.result()))
      }
    }
  }

  /** Pack sorted postings into fixed-size FOR blocks with impacts. */
  def buildBlocks(docs: Array[Int], freqs: Array[Int], norms: Array[Byte]): Array[PostingBlock] = {
    val B = PostingBlock.Size
    val out = Array.newBuilder[PostingBlock]
    var i = 0
    while (i < docs.length) {
      val end = math.min(i + B, docs.length)
      val d = new Array[Long](end - i)
      val f = new Array[Long](end - i)
      val nb = new Array[Byte](end - i)
      var j = i
      while (j < end) { d(j - i) = docs(j).toLong; f(j - i) = freqs(j).toLong; nb(j - i) = norms(j); j += 1 }
      val (impF, impN) = Impacts.pareto(freqs, norms, i, end)
      out += PostingBlock(docs(end - 1), end - i, ForBlock.encode(d), ForBlock.encode(f), nb, impF, impN)
      i = end
    }
    out.result()
  }

  /** Streaming merge: chunks sorted by (seg, term, salt); salt order ==
    * docId order (salt = localDoc / chunkDocs), so concatenating block
    * arrays preserves ascending docIds — the Lucene merge invariant.
    */
  private def mergeChunks(it: Iterator[ChunkPostings]): Iterator[TermPostings] = {
    new Iterator[TermPostings] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): TermPostings = {
        val h = buf.head
        val (seg, term) = (h.segmentId, h.term)
        var df = 0
        var ttf = 0L
        val blocks = Array.newBuilder[PostingBlock]
        while (buf.hasNext && buf.head.segmentId == seg && buf.head.term == term) {
          val c = buf.next()
          df += c.docFreq; ttf += c.totalTermFreq; blocks ++= c.blocks
        }
        TermPostings(seg, term, df, ttf, blocks.result())
      }
    }
  }
}

/** Competitive impacts: pareto-max set of (freq, norm) pairs per block
  * (reference `core/index/competitiveimpactaccumulator.go:40-84`). Sorted by
  * norm asc with strictly increasing freq; dominated pairs dropped.
  * Note: smaller normByte => shorter effective length => higher BM25 score,
  * so the frontier keeps, per norm, the max freq.
  */
object Impacts {
  def pareto(freqs: Array[Int], norms: Array[Byte], from: Int, until: Int): (Array[Int], Array[Int]) = {
    val maxFreqPerNorm = new Array[Int](256)
    var i = from
    while (i < until) {
      val n = norms(i) & 0xFF
      if (freqs(i) > maxFreqPerNorm(n)) maxFreqPerNorm(n) = freqs(i)
      i += 1
    }
    val outF = Array.newBuilder[Int]
    val outN = Array.newBuilder[Int]
    var best = 0
    var n = 0
    while (n < 256) {
      if (maxFreqPerNorm(n) > best) { outF += maxFreqPerNorm(n); outN += n; best = maxFreqPerNorm(n) }
      n += 1
    }
    (outF.result(), outN.result())
  }
}
