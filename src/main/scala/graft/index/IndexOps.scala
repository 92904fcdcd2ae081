package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.search.{IndexSearcher, Query, TermQ}

/** Mutating index operations on a committed index — the
  * IndexWriter.DeleteDocuments / UpdateDocument lifecycle
  * (`/root/reference/core/index/indexwriter.go:416`: update =
  * delete-by-term + add). Spark mapping:
  *
  *  - a delete runs the query DISTRIBUTED through the normal kernels (with
  *    existing tombstones applied, so re-deleting is a no-op), writes the
  *    matching (segmentId, localDoc) pairs as a NEW tombstone generation
  *    under `deletes/gen=K`, then commits a manifest with deleteGen = K —
  *    readers only see committed generations (live-docs analogue,
  *    `codecs/simpletext/livedocsformat.go`)
  *  - an update appends the replacement docs as new segments (Lucene's
  *    updated docs get new docIDs; old ones are tombstoned)
  *  - statistics are NOT adjusted for deleted docs until a full rebuild —
  *    exactly Lucene's behavior before merges reclaim tombstones
  */
object IndexOps {

  /** Tombstone every doc matching `q`. Returns the index handle for the new
    * committed generation (the same handle if nothing new matched). */
  def deleteByQuery(spark: SparkSession, indexDir: String, q: Query): BuiltIndex = {
    import spark.implicits._
    val m = IndexIO.readManifest(spark, indexDir)
      .getOrElse(throw new IllegalStateException(s"no committed index at $indexDir"))
    val idx = new BuiltIndex(indexDir, m)
    val searcher = new IndexSearcher(idx)
    val segSize = m.segmentSize
    // matchingDocs applies current tombstones — only NEW deletions are
    // written, keeping deletedCount exact (and MatchAll count O(1))
    val newDel = searcher.matchingDocs(spark, q)
      .map(sd => DeleteRow((sd.docId / segSize).toInt, (sd.docId % segSize).toInt))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = newDel.count()
      if (n == 0L) return idx
      // tombstone dirs are numbered by deleteGen ONLY — the shared
      // `generation` counter stays untouched. Bumping it here would let a
      // delete commit claim a generation number for which no postings/
      // docmeta were written, aliasing an orphan postings/gen=K left by a
      // crashed append into the committed-visibility window.
      val dgen = m.deleteGen + 1
      newDel.write.mode("overwrite").parquet(s"$indexDir/deletes/gen=$dgen")
      val m2 = m.copy(deleteGen = dgen, deletedCount = m.deletedCount + n)
      IndexIO.writeManifest(spark, indexDir, m2)
      new BuiltIndex(indexDir, m2)
    } finally newDel.unpersist(blocking = false)
  }

  def deleteByTerm(spark: SparkSession, indexDir: String, term: String): BuiltIndex =
    deleteByQuery(spark, indexDir, TermQ(term))

  /** UpdateDocument: tombstone every doc matching `term`, then append the
    * replacement docs as new segments. The replacements' ids must be >=
    * the index's nextDocBase (fresh docIDs, the Lucene update contract). */
  def updateDocuments(spark: SparkSession, indexDir: String, term: String,
                      newDocs: DataFrame, docIdCol: String, contentCol: String,
                      cfg: BuildConfig = BuildConfig()): BuiltIndex = {
    deleteByTerm(spark, indexDir, term)
    IndexBuilder.append(spark, newDocs, docIdCol, contentCol, indexDir, cfg)
  }
}
