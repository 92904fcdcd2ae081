package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batched decode / feature-extract / frame-sample operators.
  *
  * The Spark side is REAL — schema, batching, partitioning, operator
  * signatures — while the codec itself is a clearly-marked DETERMINISTIC
  * STUB (this container ships no image/audio libraries): "decoding" derives
  * dimensions from payload bytes, "features" are a byte histogram,
  * "frames" are fixed-size payload slices. Swapping the stub for a real
  * JNI/library decoder changes only the function body inside the
  * mapPartitions batch loop; every contract around it stays.
  *
  * Scale notes: payloads never shuffle — every operator is a narrow map;
  * batch iteration inside mapPartitions amortizes per-record overhead the
  * way Arrow batches do for Pandas UDFs.
  */
object Multimodal {

  /** Decoded-asset metadata (the STUBBED decode output). */
  final case class AssetMeta(byteLen: Long, width: Int, height: Int, nFrames: Int)

  /** ==== STUB ==== Deterministic fake "decode": dimensions are a pure
    * function of the first payload bytes; frame count = ceil(len/256).
    * A real decoder (libjpeg/ffmpeg/...) would replace exactly this body.
    */
  def decodeStub(payload: Array[Byte]): AssetMeta = {
    if (payload == null || payload.isEmpty) return AssetMeta(0L, 0, 0, 0)
    val b0 = payload(0) & 0xFF
    val b1 = if (payload.length > 1) payload(1) & 0xFF else 0
    AssetMeta(payload.length.toLong,
      width = 64 + (b0 % 128),
      height = 64 + (b1 % 128),
      nFrames = ((payload.length + 255) / 256))
  }

  /** Attach a binary payload column to a text table (here: the UTF-8 bytes
    * themselves — the testdata ships no binary column; a real pipeline
    * reads payloads from object storage by reference). Uses the codegen'd
    * encode() expression — no UDF.
    */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(coalesce(col(textCol).cast("string"), lit("")), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"))

  /** Batched decode: payload -> typed metadata columns. */
  def decode(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch loop (Arrow-batch shape): the stub is per-record, but a
        // real decoder would process `batch` as one library call
        it.grouped(256).flatMap { batch =>
          batch.iterator.map { case (id, p) =>
            val m = decodeStub(p)
            (id, m.byteLen, m.width, m.height, m.nFrames)
          }
        }
      }
      .toDF("doc_id", "byte_len", "width", "height", "n_frames")
  }

  /** Feature extraction: 16-bin normalized byte histogram per payload —
    * the embedding-shaped output a real visual encoder would produce
    * (array<float>, unit L1 mass), ready for the Ann/EmbeddingNearDup
    * operators downstream.
    */
  def features(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          val hist = new Array[Float](16)
          if (p != null && p.nonEmpty) {
            var i = 0
            while (i < p.length) { hist((p(i) & 0xFF) >> 4) += 1f; i += 1 }
            var j = 0
            while (j < 16) { hist(j) /= p.length.toFloat; j += 1 }
          }
          (id, hist)
        }
      }
      .toDF("doc_id", "features")
  }

  /** Frame sampling: every `stride`-th 256-byte frame, identified by its
    * sha256 (a video keyframe-sampling stand-in). Output explodes to one
    * row per sampled frame — the fan-out shape downstream dedup expects.
    */
  def sampleFrames(spark: SparkSession, assets: DataFrame, stride: Int = 4): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        if (p == null || p.isEmpty) Iterator.empty
        else {
          val nFrames = (p.length + 255) / 256
          (0 until nFrames by stride).iterator.map { f =>
            val from = f * 256
            val until = math.min(from + 256, p.length)
            val frame = java.util.Arrays.copyOfRange(p, from, until)
            // thread-local digest + table hex (the per-frame fan-out makes
            // getInstance + "%02x".format the dominant cost otherwise —
            // same lesson as IndexBuilder.sha256Hex)
            (id, f, graft.index.IndexBuilder.bytesSha256Hex(frame))
          }
        }
      }
      .toDF("doc_id", "frame", "frame_sha")
  }
}
