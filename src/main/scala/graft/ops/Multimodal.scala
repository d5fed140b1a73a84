package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed in partition-sized batches.
 *
 * The actual media decode is STUBBED (no image/audio libs in this
 * container): `decodeStub` derives deterministic fake features from the
 * bytes. Everything around it — schema, batching, partitioning, output
 * shape — is the real distributed plumbing a decode UDF would run in, so
 * swapping a real decoder in changes one function.
 */
object Multimodal {

  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
                             width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, kind: String,
                                 feature: Array[Float], frames: Int)

  /** ======== STUB: deterministic fake decode (no media libs offline).
    * A real implementation would decode bytes → pixels/samples here. */
  def decodeStub(bytes: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i); h *= 0x100000001b3L
      out(Math.floorMod(h, dims.toLong).toInt) += 1.0f
      i += 1
    }
    var j = 0
    while (j < dims) { out(j) = out(j) / math.max(1, bytes.length); j += 1 }
    out
  }

  /** Attach typed metadata to a binary media column (pure column ops). */
  def withMeta(df: DataFrame, binCol: String, kind: String): DataFrame =
    df.withColumn("kind", lit(kind))
      .withColumn("n_bytes", length(col(binCol)).cast("long"))
      // stub header sniff: fake dims from first bytes, deterministic
      .withColumn("width", (abs(hash(col(binCol))) % 1920 + 1).cast("int"))
      .withColumn("height", (abs(hash(col(binCol))) % 1080 + 1).cast("int"))

  /** Batched feature extraction over partitions (the mapInPandas analogue in
    * Scala: one decode call per row inside mapPartitions, vectorizable). */
  def extractFeatures(spark: SparkSession, media: DataFrame, binCol: String,
                      kind: String, dims: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col(binCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          MediaFeatures(id, kind, decodeStub(bytes, dims),
            frames = 1 + (bytes.length % 8))
        }
      }
  }

  /** Frame sampling stub for video-like payloads: deterministic frame index
    * selection, returning (doc_id, frame_idx, frame_feature). */
  def sampleFrames(spark: SparkSession, media: DataFrame, binCol: String,
                   everyN: Int = 4, dims: Int = 16): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col(binCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = 1 + (bytes.length % 32)
        (0 until nFrames by everyN).map { f =>
          (id, f, decodeStub(bytes ++ Array(f.toByte), dims))
        }
      }.toDF("doc_id", "frame_idx", "feature")
  }
}
