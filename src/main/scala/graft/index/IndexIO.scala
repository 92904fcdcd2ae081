package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest commit/read — the `segments_N` analogue
  * (`core/index/segmentinfos.go:39-46`): the manifest is written last, after
  * all segment parquet is durable, so a reader that finds a manifest sees a
  * complete, consistent generation. Stored as a 1-row parquet dataset.
  *
  * Commits are VERSIONED like the reference's `segments_N` files
  * (`core/index/segmentinfos.go:39-46` writes a NEW file then flips, never
  * destroying the prior commit): each commit writes `manifest/v=N` (N = one
  * past the highest existing version) and readers pick the highest version
  * whose `_SUCCESS` marker exists. A crash mid-commit therefore leaves the
  * PREVIOUS manifest fully readable — a delete-then-overwrite scheme would
  * instead have a crash window in which a restarted stream/append sees "no
  * index" and silently rebuilds from one batch (committed-data loss).
  * Superseded versions are pruned after the new commit is durable (the
  * newest two are kept, mirroring the reference's index-deletion policy
  * keeping the last commit point).
  */
object IndexIO {
  def manifestPath(indexDir: String): String = s"$indexDir/manifest"

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v=")) name.drop(2).toLongOption else None

  /** Committed manifest versions: (version, path), ascending. */
  private def manifestVersions(spark: SparkSession, dir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(st => versionOf(st.getPath.getName).map(_ -> st.getPath))
      .filter { case (_, vp) => f.exists(new org.apache.hadoop.fs.Path(vp, "_SUCCESS")) }
      .sortBy(_._1)
  }

  def writeManifest(spark: SparkSession, indexDir: String, m: Manifest): Unit = {
    import spark.implicits._
    val dir = manifestPath(indexDir)
    val next = manifestVersions(spark, dir).lastOption.map(_._1).getOrElse(0L) + 1L
    Seq(m).toDS().coalesce(1).write.mode("overwrite").parquet(s"$dir/v=$next")
    // prune AFTER the new version is durable: the newest two versions stay
    // (crash-safety margin), everything older goes — including any legacy
    // flat (unversioned) manifest files from the pre-versioned layout
    val f = fs(spark, dir)
    manifestVersions(spark, dir).dropRight(2)
      .foreach { case (_, vp) => f.delete(vp, true) }
    val p = new org.apache.hadoop.fs.Path(dir)
    f.listStatus(p).foreach { st =>
      if (st.isFile) f.delete(st.getPath, false) // legacy flat manifest parts
    }
  }

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(path))

  def delete(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true)

  /** Remove staged stage-1 chunks and their fingerprint markers, EXCEPT the
    * given generation's (the current build's staging stays reusable for a
    * same-fingerprint re-build). Called after a successful commit so
    * repeated checkpointed builds into one dir don't accumulate stale
    * generations without bound; pass keepGen = -1 to wipe everything. */
  def deleteStaging(spark: SparkSession, indexDir: String, keepGen: Long = -1L): Unit = {
    val f = fs(spark, indexDir)
    val stagingDir = new org.apache.hadoop.fs.Path(s"$indexDir/staging")
    if (f.exists(stagingDir)) {
      f.listStatus(stagingDir).foreach { st =>
        if (st.getPath.getName != s"gen=$keepGen") f.delete(st.getPath, true)
      }
    }
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    if (f.exists(dir)) {
      f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("staging-gen") && n.endsWith(".fp") && n != s"staging-gen$keepGen.fp")
          f.delete(st.getPath, false)
      }
    }
  }

  def writeText(spark: SparkSession, path: String, text: String): Unit = {
    val out = fs(spark, path).create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  def readText(spark: SparkSession, path: String): Option[String] =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val f = fs(spark, path)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
      }
    } catch { case _: Throwable => None }

  /** Total on-disk bytes under a path (works on any Hadoop FS, not just
    * local — the bytes-written build metric per the north rule). */
  def dirBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  /** Read the committed manifest, or None: the highest `v=N` version whose
    * `_SUCCESS` marker exists (a crash mid-commit leaves a marker-less
    * partial dir, which readers skip — fail-closed). A stale/partial/absent
    * manifest dir must read as "no index" WITHOUT a Spark error-log spew (a
    * killed bench JVM can leave a half-written dir; a read-then-catch probe
    * would log a full AnalysisException stack that pollutes the driver's
    * bench stdout, BENCH_r01 tail), so the _SUCCESS check happens before
    * asking Spark to read at all. Falls back to the legacy flat layout
    * (parquet files directly under `manifest/`) for pre-versioned indexes.
    */
  def readManifest(spark: SparkSession, indexDir: String): Option[Manifest] = {
    import spark.implicits._
    val dir = manifestPath(indexDir)
    def pickTarget(): Option[String] = manifestVersions(spark, dir).lastOption match {
      case Some((_, vp)) => Some(vp.toString)
      case None => if (exists(spark, s"$dir/_SUCCESS")) Some(dir) else None
    }
    def readOnce(path: String): Option[Manifest] =
      try spark.read.parquet(path).as[Manifest].collect().headOption
      catch { case scala.util.control.NonFatal(_) => None }
    pickTarget().flatMap { path =>
      readOnce(path).orElse {
        // A concurrent committer may have pruned the version we just listed
        // (writeManifest keeps only the two newest): re-list ONCE — the new
        // head version is visible by then — instead of mapping the transient
        // race straight to "no index" for a committed index.
        pickTarget().filter(_ != path).flatMap(readOnce)
      }
    }.filter { m =>
      // codec gate: a manifest written by a different block codec must read
      // as "no index" (fail closed) rather than let MonotonicBlock.decode
      // chew FOR-encoded bytes into silent garbage. (Pre-versioned
      // manifests already fail the schema read above.)
      val ok = m.codecVersion == Manifest.CurrentCodecVersion
      if (!ok) System.err.println(s"[graft] index at $indexDir has codecVersion " +
        s"${m.codecVersion}, this build speaks ${Manifest.CurrentCodecVersion} — treating as no index")
      ok
    }
  }
}

/** Handle to a committed index generation. */
final class BuiltIndex(val indexDir: String, val manifest: Manifest) extends Serializable {
  def segmentSize: Long = manifest.segmentSize
  def stats: IndexStats = manifest.stats

  /** First docId of the next empty segment — the id base a caller must use
    * for [[IndexBuilder.append]]ed documents. */
  def nextDocBase: Long =
    (manifest.segments.map(_.segmentId).max + 1).toLong * manifest.segmentSize

  /** Committed `gen=K` subdirectories of `root` with K <= maxGen, listed via
    * the FileSystem API. Readers open ONLY these paths: an orphan gen dir
    * left by a crashed append — possibly with truncated/corrupt parquet
    * footers — is never touched, not even for schema inference (a raw
    * `read.parquet(root)` + partition filter would still plan over the
    * orphan's files and could throw on its footers). `basePath` keeps `gen`
    * as a partition column for callers that group by it.
    */
  private def committedGenDirs(spark: SparkSession, root: String, minGen: Long,
                               maxGen: Long, dead: Set[Long] = Set.empty): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("gen=")) n.drop(4).toLongOption.map(_ -> st.getPath) else None
      }
      .collect { case (g, gp) if g >= minGen && g <= maxGen && !dead.contains(g) => gp.toString }
      .sorted
  }

  // Per-(session, root) memo of the reader DataFrames: a BuiltIndex's
  // manifest is immutable, so the visible gen-dir set and schema never
  // change for this instance — re-running the FS listing + parquet footer
  // schema inference on EVERY query is pure driver latency (tens of ms per
  // search at interactive scale). Keyed by session identity so a restarted
  // session re-lists; @transient so the memo never rides task closures
  // (executors get an empty map they never touch).
  @transient private lazy val readerMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long, Long, Set[Long]), DataFrame]()

  private def readGens(spark: SparkSession, root: String, minGen: Long, maxGen: Long,
                       dead: Set[Long] = Set.empty): DataFrame = {
    // bound the memo so session-cycling processes don't retain stopped
    // sessions' plans indefinitely (this instance sees a handful of
    // (session, root) pairs in normal use; losing entries only re-lists)
    if (readerMemo.size > 64) readerMemo.clear()
    // the gen range and dead set are part of the key: for THIS manifest
    // they are constants per root, but a same-root call with a different
    // visibility window must never be served the stale frame
    readerMemo.computeIfAbsent((spark, root, minGen, maxGen, dead), _ => {
      val dirs = committedGenDirs(spark, root, minGen, maxGen, dead)
      if (dirs.isEmpty) // no committed data dirs (shouldn't happen under a manifest)
        throw new IllegalStateException(s"no committed gen in [$minGen,$maxGen] under $root")
      spark.read.option("basePath", root).parquet(dirs: _*)
    })
  }

  /** VISIBLE data generations of this manifest: [minGen, generation] minus
    * the dead (tiered-merged) generations. */
  def liveGens: Seq[Long] =
    (manifest.minGen to manifest.generation).filterNot(manifest.deadGens.contains)

  /** Posting lists under `postings/gen=N/` (one subdir per committed
    * generation; `gen` is a hive-style partition column). Files are written
    * by the stage-2 shuffle partitioned on (segmentId, term) and sorted by
    * (segmentId, term) within each file, so `filter(col("term") === t)` is
    * answered via parquet row-group min/max stats + dictionary pushdown
    * (the term-dictionary seek).
    *
    * Only generations <= this manifest's are visible (enumerated dirs, so
    * the orphan's files are never even opened): an orphan `gen=K` dir left
    * by a crashed/in-flight append must never leak into a reader opened on
    * the older manifest — the same fail-closed rule [[deleteRows]] applies
    * to tombstones.
    */
  def postings(spark: SparkSession): DataFrame =
    readGens(spark, s"$indexDir/postings", manifest.minGen, manifest.generation,
      manifest.deadGens.toSet)

  /** (segmentId, docId, norm, sha) — norms + the per-row sha256 invariant.
    * Same committed-generation visibility rule as [[postings]]. */
  def docmeta(spark: SparkSession): DataFrame =
    readGens(spark, s"$indexDir/docmeta", manifest.minGen, manifest.generation,
      manifest.deadGens.toSet)

  /** Committed term-vector rows (when built with storeTermVectors) — same
    * gen-visibility rule as [[postings]]. */
  def termVectorsDf(spark: SparkSession): DataFrame =
    readGens(spark, s"$indexDir/termvectors", manifest.minGen, manifest.generation,
      manifest.deadGens.toSet)

  /** Committed tombstones (segmentId, localDoc); empty when the index has
    * no deletes. Only generations in [minDeleteGen, deleteGen] are read —
    * an orphan dir from a crashed delete op (above) or a superseded
    * pre-merge dir (below the floor) never leaks into queries. */
  def deleteRows(spark: SparkSession): org.apache.spark.sql.Dataset[DeleteRow] = {
    import spark.implicits._
    if (manifest.deletedCount == 0L) spark.emptyDataset[DeleteRow]
    else readGens(spark, s"$indexDir/deletes", manifest.minDeleteGen, manifest.deleteGen)
      .select($"segmentId", $"localDoc").as[DeleteRow]
  }
}
