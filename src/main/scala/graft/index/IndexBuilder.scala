package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.analysis.Analyzer
import graft.codec.ForBlock

/** One row of the stage-1 output (the per-chunk in-RAM segment flush,
  * ≙ a DWPT flush, `core/index/documentswriterperthread.go:167-226`).
  * Postings rows: `term != null`, blocks carry ≤ chunkDocs FOR-compressed
  * postings of one (segment, term, salt). Doc-sentinel rows (one per doc,
  * emitted even for empty docs): `term == null`, `norm` = field length,
  * `sha` = sha256(content) (per-row invariant, BASELINE.json input_hint).
  * `firstDoc` (postings rows) = first localDoc of the row's postings: the
  * stage-2 tiebreak that keeps concatenation in docId order when ONE chunk
  * was split across input partitions (assumeContiguous path — partial
  * chunks share (segment, term, salt) but cover disjoint ascending ranges).
  */
final case class Stage1Row(
    segmentId: Int, term: String, salt: Int,
    docFreq: Int, totalTermFreq: Long, blocks: Array[PostingBlock],
    localDoc: Int, norm: Int, sha: String, firstDoc: Int)

final case class DocMeta(segmentId: Int, docId: Long, norm: Int, sha: String)

/** @param numSegments   S: index segments = contiguous docId ranges. Each
  *                      segment is the unit of independent query execution
  *                      (Lucene leaf ≙ Spark partition). Choose S so a
  *                      segment's postings fit comfortably in one task.
  * @param chunkDocs     DWPT granularity AND salt: postings are first built
  *                      per docId-chunk of this size, so (a) stage-1 tasks
  *                      need memory for only one chunk at a time, (b) every
  *                      stage-2 shuffle group holds ≤ segSize/chunkDocs
  *                      block-rows even for stop-word-grade hot terms (north
  *                      rule skew handling). Must be a multiple of
  *                      PostingBlock.Size. Stage-1 parallelism ≈
  *                      totalDocs/chunkDocs — keep it well above the core
  *                      count of the cluster.
  * @param outputPartitions shuffle width (defaults to
  *                      spark.sql.shuffle.partitions)
  * @param stageCheckpoint write the stage-1 chunk dataset to parquet under
  *                      the index dir instead of caching — the resumable
  *                      path for large corpora (re-runs restart from the
  *                      flushed chunks, not from raw text)
  * @param stopWords     analyzer stop set (reference default: empty)
  * @param assumeContiguous ZERO-SHUFFLE stage 1: the caller asserts the
  *                      input files are docId-range-partitioned (each file
  *                      a sorted, contiguous docId range, ranges pairwise
  *                      disjoint — the natural layout of an ingested
  *                      corpus). Stage 1 then inverts each partition in
  *                      place — a narrow map, no raw-text shuffle (at
  *                      100 TB the stage-1 shuffle is the single largest
  *                      data movement of the default path). The reader may
  *                      bin-pack several files per partition in any order;
  *                      chunk pieces are re-ordered in stage 2 by firstDoc,
  *                      and the merge ASSERTS the ascending-range invariant
  *                      — a violated contract fails the build rather than
  *                      corrupting it.
  */
final case class BuildConfig(
    numSegments: Int = 8,
    chunkDocs: Int = 1 << 13,
    outputPartitions: Option[Int] = None,
    stageCheckpoint: Boolean = false,
    stopWords: Set[String] = Set.empty,
    assumeContiguous: Boolean = false,
    /** store the positions stream in posting blocks (IndexOptions
      * DOCS_AND_FREQS_AND_POSITIONS, `core/document/indexoptions.go:3-29`) —
      * required for [[graft.search.PhraseQ]]; appends must match the
      * committed index's setting */
    storePositions: Boolean = false,
    /** write per-doc term vectors (freq + positions + offsets per term,
      * `codecs/simpletext/termvectorswriter.go` role) for highlighting /
      * more-like-this; appends must match the committed setting */
    storeTermVectors: Boolean = false,
    /** store character offsets in the postings stream (IndexOptions
      * ..._AND_OFFSETS, `core/document/indexoptions.go:3-29`) — lets
      * highlighting run from postings WITHOUT a term-vectors copy of
      * per-doc term data; implies storePositions; appends must match */
    storeOffsets: Boolean = false,
    /** store per-position PAYLOADS in the postings stream — the last
      * IndexOptions dimension (the reference's in-RAM posting encoding
      * reserves a per-position payload bit,
      * `core/index/freqproxtermswriterperfield.go:96-122`). The built-in
      * payload producer stores each occurrence's ORIGINAL (pre-lowercase)
      * token text as UTF-8 bytes (see
      * [[graft.analysis.Analyzer.termPositionPayloadCounts]]); implies
      * storePositions; appends must match */
    storePayloads: Boolean = false,
    /** norm (field-length) byte encoding — [[graft.bm25.NormMode.Mod256]]
      * (lucene-go's raw `len & 0xFF` quirk; default, oracle parity) or
      * [[graft.bm25.NormMode.JavaLucene]] (SmallFloat.intToByte4, Java
      * Lucene comparability; SURVEY §2.4 Q1). Recorded in the manifest;
      * appends must match */
    normMode: String = graft.bm25.NormMode.Mod256)

/** Spark-native inverted-index builder (SURVEY.md §7 modules 3-4).
  *
  * Shape (scale-first; each arrow is where the reference has a thread or
  * file boundary, SURVEY.md §3.1):
  *
  *   Dataset[(docId, content)]
  *     -> repartition by docId-chunk + sortWithinPartitions(docId)
  *        (co-locates each contiguous chunk; the ONLY shuffle that moves
  *        raw text)
  *     -> mapPartitions: analyze + in-memory invert per chunk, flush
  *        FOR/varint posting blocks  (≙ DWPT + FreqProxTermsWriter flush;
  *        everything downstream moves compressed blocks, not token rows)
  *     -> repartition(segmentId, term) + sortWithinPartitions(seg, term,
  *        salt) + ordered concat of chunk blocks   (≙ SegmentMerger, stub in
  *        the reference; salt asc == docId asc, so concatenation preserves
  *        the Lucene merge invariant; the salted pre-aggregation bounds
  *        every shuffle group for hot terms)
  *     -> parquet, files term-sorted within (parquet row-group min/max stats
  *        on `term` play the FST term dictionary's role for query pushdown)
  *
  * No collect() anywhere; the driver only sees per-segment stats.
  */
object IndexBuilder {

  def indexFingerprint(inputPath: String, docCount: Long): String =
    sha256Hex(s"graft-index:$inputPath:$docCount")

  /** Wall-clock of each phase of the LAST build in this JVM (driver-side
    * diagnosis hook — the bench uses it to report per-stage scaling). */
  val lastPhases: scala.collection.mutable.LinkedHashMap[String, Double] =
    scala.collection.mutable.LinkedHashMap.empty

  // sha256 runs once PER DOCUMENT: reuse the digest per thread (getInstance
  // is a contended provider lookup) and hex-encode via a char table (a
  // per-byte "%02x".format would allocate a Formatter 32x per doc)
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-256"))
  private val HEX = "0123456789abcdef".toCharArray

  /** Raw sha256 bytes (thread-local digest; one call per doc/token). */
  def sha256Digest(s: String): Array[Byte] =
    tlMd.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Hex sha256 of raw bytes (thread-local digest + char-table encode). */
  def bytesSha256Hex(bytes: Array[Byte]): String = hex(tlMd.get().digest(bytes))

  def sha256Hex(s: String): String = hex(sha256Digest(s))

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEX((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HEX(d(i) & 0xF)
      i += 1
    }
    new String(out)
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
        // feature flags: reuse when the committed index can SERVE the
        // request (committed features ⊇ requested). Reusing a positions-less
        // index for a storePositions=true request would report success here
        // and throw at phrase-query time, and a norm-mode mismatch would
        // silently score wrong — those rebuild, loudly (mirroring the
        // append-match requires). But a RICHER committed index serves a
        // plainer request correctly; destructively rebuilding on a subset
        // request would strip positions/TV/offsets/payloads that other
        // consumers of the same index dir rely on (and two callers with
        // different configs would thrash full rebuilds forever).
        val featuresMatch =
          (!cfg.storePositions || m.hasPositions) &&
            (!cfg.storeTermVectors || m.hasTermVectors) &&
            (!cfg.storeOffsets || m.hasOffsets) &&
            (!cfg.storePayloads || m.hasPayloads) &&
            m.normMode == cfg.normMode
        if (featuresMatch) new BuiltIndex(indexDir, m)
        else {
          System.err.println(s"[graft-build] index at $indexDir matches the corpus but not the " +
            s"requested features (committed pos=${m.hasPositions} tv=${m.hasTermVectors} " +
            s"off=${m.hasOffsets} pay=${m.hasPayloads} norm=${m.normMode}; requested " +
            s"pos=${cfg.storePositions} tv=${cfg.storeTermVectors} off=${cfg.storeOffsets} " +
            s"pay=${cfg.storePayloads} norm=${cfg.normMode}) — rebuilding")
          build(spark, docs, docIdCol, contentCol, indexDir, cfg, inputPath)
        }
      case _ => build(spark, docs, docIdCol, contentCol, indexDir, cfg, inputPath)
    }
  }

  def build(spark: SparkSession, docs: DataFrame, docIdCol: String,
            contentCol: String, indexDir: String,
            cfg: BuildConfig = BuildConfig(),
            inputPath: String = "",
            streamBatch: Long = -1L): BuiltIndex =
    buildInternal(spark, docs, docIdCol, contentCol, indexDir, cfg, inputPath, prev = None,
      streamBatch = streamBatch)

  /** Index sorting (Lucene's IndexWriterConfig.setIndexSort — docs laid out
    * in sort-field order at flush; SURVEY §2.3 "Index sorting"): docIds are
    * assigned as the DENSE RANK of `sortCols` order, so docId order == sort
    * order and early-termination-by-docId equals early-termination-by-sort.
    * Distributed: range-partition by the sort key + sort within partitions +
    * zipWithIndex (no single-task window); the ranked partitions are then
    * contiguous ascending docId runs, which is exactly the
    * `assumeContiguous` contract — the build itself is the ZERO-SHUFFLE
    * path. `sortCols` must define a total order (add a unique tiebreak
    * column) for deterministic ids under replay.
    */
  def buildSorted(spark: SparkSession, docs: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
                  contentCol: String, indexDir: String,
                  cfg: BuildConfig = BuildConfig(),
                  inputPath: String = ""): BuiltIndex = {
    val withIds = assignDenseIds(spark, docs, sortCols, base = 0L)
    buildInternal(spark, withIds, "__doc_id", contentCol, indexDir,
      cfg.copy(assumeContiguous = true), inputPath, prev = None,
      indexSort = sortCols.map(_.toString).mkString(", "))
  }

  /** Distributed dense-id assignment: ids = `base` + rank of `sortCols`
    * order, appended as `__doc_id`. Range-partition + in-partition sort +
    * zipWithIndex (partition offsets = one tiny count job) — never a
    * single-partition window, so a burst input cannot serialize/OOM one
    * task. The output partitions are contiguous ascending id runs (the
    * `assumeContiguous` contract). `sortCols` must define a total order for
    * deterministic ids under replay. Shared by [[buildSorted]] and the
    * streaming indexer's per-batch id assignment.
    */
  def assignDenseIds(spark: SparkSession, df: DataFrame,
                     sortCols: Seq[org.apache.spark.sql.Column], base: Long): DataFrame = {
    val parts = math.max(1, math.min(df.rdd.getNumPartitions,
      spark.sparkContext.defaultParallelism))
    val sorted = df.repartitionByRange(parts, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add("__doc_id", org.apache.spark.sql.types.LongType)
    val ranked = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (base + i))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Incremental append — the IndexWriter.AddDocument+Commit lifecycle
    * (`core/index/indexwriter.go:399,493`): index new docs as ADDITIONAL
    * segments of a committed index; existing segments are never rewritten
    * (Lucene's segment model). The new docs' ids must be >= the index's
    * [[BuiltIndex.nextDocBase]] (the next empty segment boundary — segment
    * geometry is fixed at first build). Commits a new manifest generation
    * whose stats cover all generations; a reader re-opening the manifest
    * sees the appended docs (the reference's NRT-reopen analogue).
    */
  def append(spark: SparkSession, docs: DataFrame, docIdCol: String,
             contentCol: String, indexDir: String,
             cfg: BuildConfig = BuildConfig(),
             inputPath: String = "",
             streamBatch: Long = -1L): BuiltIndex = {
    val prev = IndexIO.readManifest(spark, indexDir)
      .getOrElse(throw new IllegalStateException(s"append requires a committed index at $indexDir"))
    buildInternal(spark, docs, docIdCol, contentCol, indexDir, cfg, inputPath, Some(prev),
      streamBatch = streamBatch)
  }

  private def buildInternal(spark: SparkSession, docs: DataFrame, docIdCol: String,
            contentCol: String, indexDir: String,
            cfg: BuildConfig,
            inputPath: String,
            prev: Option[Manifest],
            streamBatch: Long = -1L,
            indexSort: String = ""): BuiltIndex = {
    import spark.implicits._
    require(cfg.chunkDocs % PostingBlock.Size == 0, "chunkDocs must be a multiple of block size")
    require(!cfg.storeOffsets || cfg.storePositions,
      "storeOffsets implies storePositions (IndexOptions ..._AND_OFFSETS extends ..._AND_POSITIONS)")
    require(!cfg.storePayloads || cfg.storePositions,
      "storePayloads implies storePositions (payloads are per-position metadata)")
    graft.bm25.NormMode.lengthTable(cfg.normMode) // fail fast on an unknown mode

    val input: Dataset[(Long, String)] =
      docs.select(col(docIdCol).cast("long").as("_1"), col(contentCol).cast("string").as("_2"))
        .as[(Long, String)]

    lastPhases.clear()
    var t0 = System.nanoTime()
    def phase(name: String): Unit = {
      val t1 = System.nanoTime()
      val secs = (t1 - t0) / 1e9
      lastPhases.put(name, secs)
      System.err.println(f"[graft-build] phase=$name secs=$secs%.2f")
      t0 = t1
    }

    // one tiny agg to fix the segment geometry (driver-side scalars only;
    // reads only the id column — column pruning keeps text out of this scan)
    val (minIdRow, maxIdRow, docCount) = {
      val r = input.agg(min($"_1"), max($"_1"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // segment size rounded UP to a chunk multiple, so a chunk never crosses
    // a segment boundary and chunkId == (segment, salt) 1:1; appends inherit
    // the committed geometry and must start at the next segment boundary
    val segSize: Long = prev match {
      case Some(m) =>
        require(m.segmentSize % cfg.chunkDocs == 0,
          s"append chunkDocs ${cfg.chunkDocs} must divide committed segmentSize ${m.segmentSize}")
        val nextBase = (m.segments.map(_.segmentId).max + 1).toLong * m.segmentSize
        require(minIdRow >= nextBase,
          s"append docIds must be >= nextDocBase $nextBase (got min $minIdRow)")
        m.segmentSize
      case None =>
        val segSize0 = math.max(1L, (maxIdRow + cfg.numSegments) / cfg.numSegments)
        ((segSize0 + cfg.chunkDocs - 1) / cfg.chunkDocs) * cfg.chunkDocs
    }
    require(segSize <= Int.MaxValue, "segment size must fit in Int (raise numSegments)")
    val generation = prev.map(_.generation + 1)
      .orElse(IndexIO.readManifest(spark, indexDir).map(_.generation + 1)).getOrElse(1L)
    // generation subdirectories: appends add files without touching committed
    // generations, and a failed append retries cleanly by rewriting only its
    // own gen dir. A full build FIRST retracts the manifest (readers fail
    // closed — a crash between the data-dir wipe and the new commit must not
    // leave a valid-looking manifest pointing at deleted data), then wipes
    // the data dirs plus any stale staged chunks from prior generations.
    if (prev.isEmpty) {
      IndexIO.delete(spark, IndexIO.manifestPath(indexDir))
      IndexIO.delete(spark, s"$indexDir/postings")
      IndexIO.delete(spark, s"$indexDir/docmeta")
      IndexIO.delete(spark, s"$indexDir/deletes")
      IndexIO.delete(spark, s"$indexDir/termvectors")
      // staging is NOT wiped here: a same-fingerprint stageCheckpoint
      // re-build resumes from it (the reuse check validates the fp)
    }
    val postingsDir = s"$indexDir/postings/gen=$generation"
    val docmetaDir = s"$indexDir/docmeta/gen=$generation"
    phase("geometry")

    val analyzer = new Analyzer(cfg.stopWords)
    val chunkDocs = cfg.chunkDocs
    val segSizeL = segSize
    val outParts = cfg.outputPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)

    // ---- stage 1: per-chunk invert + block encode (≙ DWPT flush) --------
    // Chunk never crosses a segment boundary (segSize is a chunk multiple),
    // so partitioning by chunkId keeps every (segment, salt) group whole —
    // a chunk split across tasks would emit two same-salt block rows whose
    // merge order is nondeterministic, breaking the ascending-docId
    // invariant. A MODULO partitioner (not hash) spreads the equal-sized
    // chunks perfectly evenly — hash partitioning of ~3 chunks/partition
    // gives binomial imbalance and stragglers. RDD drop-down is deliberate:
    // repartitionAndSortWithinPartitions is the spillable shuffle-sort this
    // stage needs (the survey's sanctioned per-partition imperative escape).
    val numChunks = (maxIdRow / chunkDocs) + 1 // upper bound on distinct chunk ids
    val stage1Parts = math.min(outParts.toLong, math.max(1L, numChunks)).toInt
    val chunkedRdd =
      if (cfg.assumeContiguous) {
        // zero-shuffle path: each input partition is a concatenation of
        // sorted, pairwise-disjoint docId runs (range-partitioned files,
        // possibly bin-packed by the reader) — invert in place. Chunks
        // split across runs/partitions yield partial rows; stage 2
        // re-orders them by firstDoc and asserts their ranges don't
        // interleave, so a violated layout contract FAILS the build.
        val storePos = cfg.storePositions
        val storeOff = cfg.storeOffsets
        val storePay = cfg.storePayloads
        val normMode = cfg.normMode
        input.rdd.mapPartitions { it =>
          invertChunks(it, analyzer, segSizeL, chunkDocs, storePos, storeOff, storePay, normMode)
        }
      } else {
        val partitioner = new org.apache.spark.Partitioner {
          def numPartitions: Int = stage1Parts
          def getPartition(key: Any): Int =
            ((key.asInstanceOf[Long] / chunkDocs) % stage1Parts).toInt
        }
        val storePos = cfg.storePositions
        val storeOff = cfg.storeOffsets
        val storePay = cfg.storePayloads
        val normMode = cfg.normMode
        input.rdd
          .repartitionAndSortWithinPartitions(partitioner)
          .mapPartitions(it =>
            invertChunks(it, analyzer, segSizeL, chunkDocs, storePos, storeOff, storePay, normMode))
      }
    val chunked: Dataset[Stage1Row] = spark.createDataset(chunkedRdd)

    // With stageCheckpoint the flushed chunks are durable and fingerprinted:
    // a re-run after a mid-build failure resumes from the staged blocks
    // (skipping re-analysis of the whole corpus — the expensive stage), the
    // Spark-checkpoint resumability of the north rule.
    val staged: Dataset[Stage1Row] =
      if (cfg.stageCheckpoint) {
        val stagingDir = s"$indexDir/staging/gen=$generation"
        val fpPath = s"$indexDir/staging-gen$generation.fp"
        val fp = sha256Hex(s"${indexFingerprint(inputPath, docCount)}:$segSize:${cfg.chunkDocs}" +
          s":${cfg.storePositions}:${cfg.storeOffsets}:${cfg.storePayloads}:${cfg.normMode}")
        val reusable = inputPath.nonEmpty &&
          IndexIO.readText(spark, fpPath).contains(fp) &&
          IndexIO.exists(spark, s"$stagingDir/_SUCCESS")
        if (!reusable) {
          chunked.write.mode("overwrite").parquet(stagingDir)
          IndexIO.writeText(spark, fpPath, fp)
        } else {
          System.err.println(s"[graft-build] resuming from staged chunks at $stagingDir")
        }
        spark.read.parquet(stagingDir).as[Stage1Row]
      } else chunked.persist(StorageLevel.MEMORY_AND_DISK)

    // ---- doc metadata (norms + sha256 invariant), docId-sorted files ----
    staged.filter(_.term == null)
      .map(r => DocMeta(r.segmentId, r.segmentId.toLong * segSizeL + r.localDoc, r.norm, r.sha))
      .write.mode("overwrite").parquet(docmetaDir)
    // term vectors: their own narrow map over the input (Lucene keeps TV in
    // separate per-segment files too — read by docId, not by term)
    if (cfg.storeTermVectors)
      TermVectors.write(spark, input, cfg.stopWords, indexDir, generation)
    phase("stage1+docmeta")

    // ---- stage 2: salted sort-merge of chunk blocks (≙ SegmentMerger) ---
    // (salt asc, firstDoc asc) == docId asc: firstDoc only differs for
    // partial chunks of the assumeContiguous path, which share a salt
    val merged: Dataset[TermPostings] = staged.filter(_.term != null)
      .repartition(outParts, $"segmentId", $"term")
      .sortWithinPartitions($"segmentId", $"term", $"salt", $"firstDoc")
      .mapPartitions(mergeChunks _)
    merged.write.mode("overwrite").parquet(postingsDir)
    phase("stage2-merge")

    // ---- stats + manifest (small aggs; driver holds only S rows) --------
    // ONE aggregation pass over the still-cached staged dataset covers both
    // posting and doc stats (merge only concatenates chunk rows, so summing
    // chunk-level docFreq/ttf equals the merged per-term totals; distinct
    // terms per segment = merged term count). Re-reading the two written
    // parquet trees here would add two serial jobs per build.
    val segStats = staged.toDF()
      .groupBy($"segmentId")
      .agg(
        sum(when($"term".isNotNull, $"docFreq")).as("sumDocFreq"),
        sum(when($"term".isNotNull, $"totalTermFreq")).as("sumTotalTermFreq"),
        countDistinct($"term").as("termCount"), // countDistinct skips nulls
        count(when($"term".isNull, 1)).as("docCount"),
        sum(when($"term".isNull && $"norm" > 0, 1L).otherwise(0L)).as("fieldDocCount"))
      .collect()
      .map(r => r.getInt(0) -> (
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    if (!cfg.stageCheckpoint) staged.unpersist(blocking = false)
    phase("stats")

    val newSegs = segStats.keys.toSeq.sorted.map { sid =>
      val (sdf, sttf, tc, dc, fdc) = segStats(sid)
      SegmentMeta(sid, sid.toLong * segSizeL, dc, fdc, sttf, sdf, tc, postingCount = sdf,
        bytesWritten = 0L,
        lineageSha = sha256Hex(s"$sid:${sid.toLong * segSizeL}:$dc:$sttf"))
    }
    val segs = prev.map(_.segments).getOrElse(Nil) ++ newSegs
    val stats = IndexStats(
      docCount = segs.map(_.docCount).sum,
      fieldDocCount = segs.map(_.fieldDocCount).sum,
      sumTotalTermFreq = segs.map(_.sumTotalTermFreq).sum,
      sumDocFreq = segs.map(_.sumDocFreq).sum)
    val corpusSha = prev match {
      case Some(m) => sha256Hex(s"${m.corpusSha}+${indexFingerprint(inputPath, docCount)}")
      case None => indexFingerprint(inputPath, docCount)
    }
    prev.foreach { m =>
      require(m.hasPositions == cfg.storePositions,
        s"append storePositions=${cfg.storePositions} must match the committed " +
          s"index's hasPositions=${m.hasPositions} (a mixed index would break phrase queries)")
      require(m.hasTermVectors == cfg.storeTermVectors,
        s"append storeTermVectors=${cfg.storeTermVectors} must match the committed " +
          s"index's hasTermVectors=${m.hasTermVectors}")
      require(m.hasOffsets == cfg.storeOffsets,
        s"append storeOffsets=${cfg.storeOffsets} must match the committed " +
          s"index's hasOffsets=${m.hasOffsets} (a mixed index would break postings highlighting)")
      require(m.hasPayloads == cfg.storePayloads,
        s"append storePayloads=${cfg.storePayloads} must match the committed " +
          s"index's hasPayloads=${m.hasPayloads} (a mixed index would break payload readers)")
      require(m.normMode == cfg.normMode,
        s"append normMode=${cfg.normMode} must match the committed index's " +
          s"normMode=${m.normMode} (a mixed index would score the same length two ways)")
    }
    val manifest = Manifest(
      generation = generation,
      minGen = prev.map(_.minGen).getOrElse(generation),
      numSegments = segs.size,
      segmentSize = segSize,
      stats = stats, segments = segs,
      corpusSha = corpusSha,
      postingsBytes = IndexIO.dirBytes(spark, s"$indexDir/postings"),
      docmetaBytes = IndexIO.dirBytes(spark, s"$indexDir/docmeta"),
      // appends preserve committed tombstones (update = delete + append)
      deleteGen = prev.map(_.deleteGen).getOrElse(0L),
      deletedCount = prev.map(_.deletedCount).getOrElse(0L),
      // ...and the tiered-merge visibility state: dropping deadGens here
      // would resurrect merged-away generations into [minGen, generation]
      // (their dirs are deleted — readers would crash, or worse read stale
      // pre-merge data in the deletion crash window)
      deadGens = prev.map(_.deadGens).getOrElse(Nil),
      minDeleteGen = prev.map(_.minDeleteGen).getOrElse(0L),
      lastStreamBatch =
        if (streamBatch >= 0L) streamBatch
        else prev.map(_.lastStreamBatch).getOrElse(-1L),
      hasPositions = cfg.storePositions,
      hasTermVectors = cfg.storeTermVectors,
      hasOffsets = cfg.storeOffsets,
      hasPayloads = cfg.storePayloads,
      normMode = cfg.normMode,
      // an append's docIds start past the existing range, so its rows CANNOT
      // interleave into the committed sort order — the global
      // docId-order == sort-order invariant no longer holds and the sorted
      // fast path must refuse (cleared, not inherited)
      indexSort = if (prev.isDefined) "" else indexSort)
    IndexIO.writeManifest(spark, indexDir, manifest)
    // drop STALE staged generations (this one stays reusable for a
    // same-fingerprint re-build; prior gens would otherwise accumulate
    // without bound across repeated checkpointed builds into one dir)
    if (cfg.stageCheckpoint) IndexIO.deleteStaging(spark, indexDir, keepGen = generation)
    phase("manifest")
    new BuiltIndex(indexDir, manifest)
  }

  /** Streaming per-chunk invert: input iterator sorted by docId; one
    * in-memory TermsHash per (segment, salt) chunk (≙ the DWPT's
    * `TermsHashPerField`, `core/index/termshashperfield.go:245-267`), flushed
    * as FOR-compressed blocks when the chunk boundary passes. Memory is
    * bounded by one chunk's postings regardless of corpus size.
    */
  /** Growable primitive posting buffer — no per-append boxing (the build's
    * hottest allocation site: one append per (doc, distinct term)).
    * `pos` (present only on positions-enabled builds) holds every doc's
    * ascending positions concatenated in posting order: the walk order of
    * (docs, freqs) recovers the per-doc runs, so no offsets are stored. */
  private final class TermBuf(withPositions: Boolean, withOffsets: Boolean = false,
                              withPayloads: Boolean = false) {
    var docs = new Array[Int](8)
    var freqs = new Array[Int](8)
    var norms = new Array[Byte](8)
    var n = 0
    val pos: graft.analysis.IntBuf = if (withPositions) new graft.analysis.IntBuf(8) else null
    // interleaved (start, end) code-point offsets, aligned with `pos`
    val off: graft.analysis.IntBuf = if (withOffsets) new graft.analysis.IntBuf(8) else null
    // per-occurrence payload lengths + concatenated bytes, aligned with `pos`
    val payLen: graft.analysis.IntBuf = if (withPayloads) new graft.analysis.IntBuf(8) else null
    val pay: java.io.ByteArrayOutputStream =
      if (withPayloads) new java.io.ByteArrayOutputStream(64) else null
    def add(doc: Int, freq: Int, norm: Byte): Unit = {
      if (n == docs.length) {
        val cap = n << 1
        docs = java.util.Arrays.copyOf(docs, cap)
        freqs = java.util.Arrays.copyOf(freqs, cap)
        norms = java.util.Arrays.copyOf(norms, cap)
      }
      docs(n) = doc; freqs(n) = freq; norms(n) = norm; n += 1
    }
  }

  private def invertChunks(it: Iterator[(Long, String)], analyzer: Analyzer,
                           segSize: Long, chunkDocs: Int,
                           storePositions: Boolean = false,
                           storeOffsets: Boolean = false,
                           storePayloads: Boolean = false,
                           normMode: String = graft.bm25.NormMode.Mod256): Iterator[Stage1Row] = {
    new Iterator[Stage1Row] {
      private val in = it.buffered
      private var out: Iterator[Stage1Row] = Iterator.empty
      // one intern table per TASK: hot terms (the Zipf mass of any real
      // corpus) allocate their String once per task, not once per
      // occurrence — stage 1 is memory-bandwidth-bound, and token-string
      // garbage was its largest allocation source
      private val intern = new graft.analysis.TermIntern()

      private def flushChunk(): Iterator[Stage1Row] = {
        // consume the chunk that starts at the head's (seg, salt), flushing
        // ALSO at any backward docId (a "run boundary": the parquet reader
        // bin-packs several sorted files into one partition in arbitrary
        // order, so a partition is a concatenation of sorted runs). Each
        // run piece becomes its own partial row; stage 2 re-orders pieces
        // by firstDoc and ASSERTS their ranges don't interleave, so any
        // genuinely illegal layout fails the build instead of corrupting it.
        val headId = in.head._1
        val seg = (headId / segSize).toInt
        val salt = ((headId - seg.toLong * segSize) / chunkDocs).toInt
        val terms = new java.util.HashMap[String, TermBuf]()
        val docRows = Vector.newBuilder[Stage1Row]
        var continue = true
        var lastLocal = -1
        while (continue && in.hasNext) {
          val (docId, content) = in.head
          val s = (docId / segSize).toInt
          val local = (docId - s.toLong * segSize).toInt
          if (s != seg || local / chunkDocs != salt || local <= lastLocal) continue = false
          else {
            lastLocal = local
            in.next()
            val len =
              if (storePayloads) {
                // positions + payloads (+ optional offsets) path — the full
                // IndexOptions surface incl. the per-position payload slot
                val (tp, l) = analyzer.termPositionPayloadCounts(content, intern, storeOffsets)
                val nb = graft.bm25.NormMode.encode(l, normMode)
                val tpIt = tp.entrySet().iterator()
                while (tpIt.hasNext) {
                  val e = tpIt.next()
                  var b = terms.get(e.getKey)
                  if (b == null) { b = new TermBuf(true, storeOffsets, true); terms.put(e.getKey, b) }
                  val pb = e.getValue
                  b.add(local, pb.pos.n, nb)
                  var j = 0
                  while (j < pb.pos.n) { b.pos.add(pb.pos.a(j)); j += 1 }
                  if (storeOffsets) {
                    j = 0
                    while (j < pb.off.n) { b.off.add(pb.off.a(j)); j += 1 }
                  }
                  j = 0
                  while (j < pb.payLen.n) { b.payLen.add(pb.payLen.a(j)); j += 1 }
                  pb.pay.writeTo(b.pay)
                }
                l
              } else if (storeOffsets) {
                // positions + offsets path (IndexOptions ..._AND_OFFSETS)
                val (tp, l) = analyzer.termPositionOffsetCounts(content, intern)
                val nb = graft.bm25.NormMode.encode(l, normMode)
                val tpIt = tp.entrySet().iterator()
                while (tpIt.hasNext) {
                  val e = tpIt.next()
                  var b = terms.get(e.getKey)
                  if (b == null) { b = new TermBuf(true, true); terms.put(e.getKey, b) }
                  val pb = e.getValue
                  b.add(local, pb.pos.n, nb)
                  var j = 0
                  while (j < pb.pos.n) { b.pos.add(pb.pos.a(j)); j += 1 }
                  j = 0
                  while (j < pb.off.n) { b.off.add(pb.off.a(j)); j += 1 }
                }
                l
              } else if (storePositions) {
                // positions path: term -> ascending token positions (the
                // prox stream, freqproxtermswriterperfield.go:96-122)
                val (tp, l) = analyzer.termPositionCounts(content, intern)
                val nb = graft.bm25.NormMode.encode(l, normMode)
                val tpIt = tp.entrySet().iterator()
                while (tpIt.hasNext) {
                  val e = tpIt.next()
                  var b = terms.get(e.getKey)
                  if (b == null) { b = new TermBuf(true); terms.put(e.getKey, b) }
                  val pb = e.getValue
                  b.add(local, pb.n, nb)
                  var j = 0
                  while (j < pb.n) { b.pos.add(pb.a(j)); j += 1 }
                }
                l
              } else {
                val (tf, l) = analyzer.termFreqCounts(content, intern)
                val nb = graft.bm25.NormMode.encode(l, normMode)
                val tfIt = tf.entrySet().iterator()
                while (tfIt.hasNext) {
                  val e = tfIt.next()
                  var b = terms.get(e.getKey)
                  if (b == null) { b = new TermBuf(false); terms.put(e.getKey, b) }
                  b.add(local, e.getValue, nb)
                }
                l
              }
            docRows += Stage1Row(seg, null, salt, 0, 0L, null, local, len,
              sha256Hex(if (content == null) "" else content), firstDoc = local)
          }
        }
        val postRows = new scala.collection.mutable.ArrayBuffer[Stage1Row](terms.size)
        terms.forEach { (t, b) =>
          var ttf = 0L
          var j = 0
          while (j < b.n) { ttf += b.freqs(j); j += 1 }
          val docsA = java.util.Arrays.copyOf(b.docs, b.n)
          val freqsA = java.util.Arrays.copyOf(b.freqs, b.n)
          val normsA = java.util.Arrays.copyOf(b.norms, b.n)
          val posA = if (b.pos == null) null else java.util.Arrays.copyOf(b.pos.a, b.pos.n)
          val offA = if (b.off == null) null else java.util.Arrays.copyOf(b.off.a, b.off.n)
          val payLensA = if (b.payLen == null) null else java.util.Arrays.copyOf(b.payLen.a, b.payLen.n)
          val payA = if (b.pay == null) null else b.pay.toByteArray
          postRows += Stage1Row(seg, t, salt, b.n, ttf,
            buildBlocks(docsA, freqsA, normsA, posA, offA, payLensA, payA),
            -1, 0, null, firstDoc = docsA(0))
        }
        postRows.iterator ++ docRows.result().iterator
      }

      def hasNext: Boolean = out.hasNext || in.hasNext
      def next(): Stage1Row = {
        if (!out.hasNext) out = flushChunk()
        out.next()
      }
    }
  }

  /** Pack sorted postings into fixed-size FOR blocks with impacts.
    * `positions` (optional): every doc's ascending positions concatenated in
    * posting order (freqs give the per-doc run lengths); each block's slice
    * is stored as a varint delta stream (first position absolute, then gaps)
    * — the prox encoding of `core/index/freqproxtermswriterperfield.go:96-122`.
    * `offsets` (optional, requires positions): interleaved (start, end)
    * code-point offsets aligned with `positions`; per occurrence the block
    * stores varint(start - prevStart) [prevStart resets per posting] +
    * varint(end - start) — the reference's startOffset-delta + length
    * encoding (same file, offsets branch).
    * `payLens`/`payFlat` (optional, requires positions): per-occurrence
    * payload lengths + concatenated bytes aligned with `positions`; per
    * occurrence the block stores varint(len) + the raw bytes — the
    * reference's per-position payload slot (same file, payload branch).
    */
  def buildBlocks(docs: Array[Int], freqs: Array[Int], norms: Array[Byte],
                  positions: Array[Int] = null,
                  offsets: Array[Int] = null,
                  payLens: Array[Int] = null,
                  payFlat: Array[Byte] = null): Array[PostingBlock] = {
    val B = PostingBlock.Size
    val out = Array.newBuilder[PostingBlock]
    var i = 0
    var pcur = 0 // cursor into the flat positions stream
    var ocur = 0 // cursor into the interleaved offsets stream (pairs)
    var ycur = 0 // occurrence cursor into payLens
    var ybyte = 0 // byte cursor into payFlat
    while (i < docs.length) {
      val end = math.min(i + B, docs.length)
      val d = new Array[Long](end - i)
      val f = new Array[Long](end - i)
      val nb = new Array[Byte](end - i)
      var j = i
      while (j < end) { d(j - i) = docs(j).toLong; f(j - i) = freqs(j).toLong; nb(j - i) = norms(j); j += 1 }
      val posBytes: Array[Byte] =
        if (positions == null) null
        else {
          val bos = new java.io.ByteArrayOutputStream(4 * (end - i))
          j = i
          while (j < end) {
            var prev = 0
            var k = 0
            while (k < freqs(j)) {
              val p = positions(pcur)
              graft.codec.Varint.writeUvarint(bos, (p - prev).toLong)
              prev = p
              pcur += 1
              k += 1
            }
            j += 1
          }
          bos.toByteArray
        }
      val offBytes: Array[Byte] =
        if (offsets == null) null
        else {
          val bos = new java.io.ByteArrayOutputStream(8 * (end - i))
          j = i
          while (j < end) {
            var prevStart = 0
            var k = 0
            while (k < freqs(j)) {
              val s = offsets(2 * ocur)
              val e = offsets(2 * ocur + 1)
              graft.codec.Varint.writeUvarint(bos, (s - prevStart).toLong)
              graft.codec.Varint.writeUvarint(bos, (e - s).toLong)
              prevStart = s
              ocur += 1
              k += 1
            }
            j += 1
          }
          bos.toByteArray
        }
      val payBytes: Array[Byte] =
        if (payLens == null) null
        else {
          val bos = new java.io.ByteArrayOutputStream(8 * (end - i))
          j = i
          while (j < end) {
            var k = 0
            while (k < freqs(j)) {
              val len = payLens(ycur)
              graft.codec.Varint.writeUvarint(bos, len.toLong)
              bos.write(payFlat, ybyte, len)
              ybyte += len
              ycur += 1
              k += 1
            }
            j += 1
          }
          bos.toByteArray
        }
      val (impF, impN) = Impacts.pareto(freqs, norms, i, end)
      out += PostingBlock(docs(end - 1), end - i, graft.codec.MonotonicBlock.encode(d), ForBlock.encode(f), nb,
        impF, impN, posBytes, offBytes, payBytes)
      i = end
    }
    out.result()
  }

  /** Streaming merge: chunk rows sorted by (seg, term, salt, firstDoc);
    * (salt, firstDoc) order == docId order (salt = localDoc / chunkDocs;
    * firstDoc orders partial chunks of the assumeContiguous path), so
    * concatenating block arrays preserves ascending docIds — the Lucene
    * merge invariant. The ascending invariant is ASSERTED here: overlapping
    * input partitions (a violated assumeContiguous contract) fail the build
    * instead of committing a corrupt index.
    */
  private def mergeChunks(it: Iterator[Stage1Row]): Iterator[TermPostings] = {
    new Iterator[TermPostings] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): TermPostings = {
        val h = buf.head
        val (seg, term) = (h.segmentId, h.term)
        var df = 0
        var ttf = 0L
        var lastMax = -1
        val blocks = Array.newBuilder[PostingBlock]
        while (buf.hasNext && buf.head.segmentId == seg && buf.head.term == term) {
          val c = buf.next()
          require(c.firstDoc > lastMax,
            s"posting merge invariant violated for term '$term' seg $seg: " +
              s"chunk first doc ${c.firstDoc} <= previous max $lastMax " +
              "(overlapping input partitions under assumeContiguous?)")
          df += c.docFreq; ttf += c.totalTermFreq; blocks ++= c.blocks
          lastMax = c.blocks(c.blocks.length - 1).maxDoc
        }
        TermPostings(seg, term, df, ttf, blocks.result(),
          termLen = term.codePointCount(0, term.length))
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
