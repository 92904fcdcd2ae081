package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest commit/read — the `segments_N` analogue
  * (`core/index/segmentinfos.go:39-46`): the manifest is written last, after
  * all segment parquet is durable, so a reader that finds a manifest sees a
  * complete, consistent generation. Stored as a 1-row parquet dataset (plus
  * the raw parquet _SUCCESS markers Spark already writes per directory).
  */
object IndexIO {
  def manifestPath(indexDir: String): String = s"$indexDir/manifest"

  def writeManifest(spark: SparkSession, indexDir: String, m: Manifest): Unit = {
    import spark.implicits._
    Seq(m).toDS().coalesce(1).write.mode("overwrite").parquet(manifestPath(indexDir))
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

  /** Read the committed manifest, or None. A stale/partial/absent manifest
    * dir must read as "no index" WITHOUT a Spark error-log spew (a killed
    * bench JVM can leave a half-written dir; the old read-then-catch path
    * logged a full AnalysisException stack that polluted the driver's bench
    * stdout, BENCH_r01 tail). We therefore check for the _SUCCESS commit
    * marker before asking Spark to read at all — readers fail closed.
    */
  def readManifest(spark: SparkSession, indexDir: String): Option[Manifest] = {
    import spark.implicits._
    val dir = manifestPath(indexDir)
    if (!exists(spark, s"$dir/_SUCCESS")) return None
    try {
      val ds = spark.read.parquet(dir).as[Manifest]
      ds.collect().headOption
    } catch { case scala.util.control.NonFatal(_) => None }
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

  /** Posting lists under `postings/gen=N/` (one subdir per committed
    * generation; `gen` is a hive-style partition column). Files are written
    * by the stage-2 shuffle partitioned on (segmentId, term) and sorted by
    * (segmentId, term) within each file, so `filter(col("term") === t)` is
    * answered via parquet row-group min/max stats + dictionary pushdown
    * (the term-dictionary seek).
    *
    * Only generations <= this manifest's are visible (a zero-cost
    * PARTITION filter): an orphan `gen=K` dir left by a crashed/in-flight
    * append must never leak into a reader opened on the older manifest —
    * the same fail-closed rule [[deleteRows]] applies to tombstones.
    */
  def postings(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$indexDir/postings")
      .where(org.apache.spark.sql.functions.col("gen") <= manifest.generation)

  /** (segmentId, docId, norm, sha) — norms + the per-row sha256 invariant.
    * Same committed-generation visibility rule as [[postings]]. */
  def docmeta(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$indexDir/docmeta")
      .where(org.apache.spark.sql.functions.col("gen") <= manifest.generation)

  /** Committed tombstones (segmentId, localDoc); empty when the index has
    * no deletes. Only generations <= manifest.deleteGen are read, so an
    * orphan dir from a crashed delete op never leaks into queries. */
  def deleteRows(spark: SparkSession): org.apache.spark.sql.Dataset[DeleteRow] = {
    import spark.implicits._
    if (manifest.deletedCount == 0L) spark.emptyDataset[DeleteRow]
    else spark.read.parquet(s"$indexDir/deletes")
      .where(org.apache.spark.sql.functions.col("gen") <= manifest.deleteGen)
      .select($"segmentId", $"localDoc").as[DeleteRow]
  }
}
