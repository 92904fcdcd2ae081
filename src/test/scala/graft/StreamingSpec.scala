package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{BuildConfig, IndexIO}
import graft.search.{IndexSearcher, TermQ}
import graft.streaming.StreamingIndexer

/** Structured-Streaming ingestion: micro-batches become committed index
  * generations; replayed batches are idempotent (exactly-once via the
  * manifest's lastStreamBatch watermark). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val cfg = BuildConfig(numSegments = 2, chunkDocs = 128)

  test("stream of micro-batches builds a live index; each batch visible after commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    source.addData((1L, "streamed alpha doc"), (2L, "streamed beta doc"), (3L, "gamma"))
    val query = StreamingIndexer.start(spark,
      source.toDF().toDF("event_id", "content"), "event_id", "content", dir, ckpt, cfg,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    query.processAllAvailable()
    query.awaitTermination()

    val m1 = IndexIO.readManifest(spark, dir).get
    assert(m1.stats.docCount == 3L && m1.lastStreamBatch >= 0L)
    val s1 = new IndexSearcher(new graft.index.BuiltIndex(dir, m1))
    assert(s1.count(spark, TermQ("streamed")) == 2L)

    // second run of the stream = second micro-batch appended
    source.addData((4L, "streamed delta doc"))
    val query2 = StreamingIndexer.start(spark,
      source.toDF().toDF("event_id", "content"), "event_id", "content", dir, ckpt, cfg,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    query2.processAllAvailable()
    query2.awaitTermination()

    val m2 = IndexIO.readManifest(spark, dir).get
    assert(m2.stats.docCount == 4L)
    assert(m2.lastStreamBatch > m1.lastStreamBatch)
    val s2 = new IndexSearcher(new graft.index.BuiltIndex(dir, m2))
    assert(s2.count(spark, TermQ("streamed")) == 3L)
    // rank results include docs from both generations
    val hits = s2.search(spark, TermQ("streamed"), 10).collect()
    assert(hits.length == 3)
  }

  test("replayed micro-batch is idempotent (exactly-once on batchId)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-replay").toString
    val batch = Seq((10L, "replay doc one"), (11L, "replay doc two")).toDF("event_id", "content")
    StreamingIndexer.indexBatch(spark, batch, "event_id", "content", dir, cfg, batchId = 0L)
    val m1 = IndexIO.readManifest(spark, dir).get
    // a foreachBatch retry re-delivers the SAME batchId -> no-op
    StreamingIndexer.indexBatch(spark, batch, "event_id", "content", dir, cfg, batchId = 0L)
    val m2 = IndexIO.readManifest(spark, dir).get
    assert(m2 == m1, "replay must not commit a new generation")
    // the NEXT batch appends
    val batch2 = Seq((12L, "replay doc three")).toDF("event_id", "content")
    StreamingIndexer.indexBatch(spark, batch2, "event_id", "content", dir, cfg, batchId = 1L)
    val m3 = IndexIO.readManifest(spark, dir).get
    assert(m3.stats.docCount == 3L && m3.lastStreamBatch == 1L)
  }
}
