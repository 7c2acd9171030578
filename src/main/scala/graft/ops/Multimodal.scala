package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata — the
  * same model Spark's own `binaryFile` source and the mllib image schema
  * use. Decode / feature-extract run as `mapPartitions` over the typed
  * Dataset (the Scala analogue of `mapInPandas`: one iterator per
  * partition, so per-partition library init — a codec, a model session —
  * is amortized across the batch).
  *
  * The actual codec is STUBBED (`FakeCodec`): media libraries are not in
  * this container. The stub is deterministic on the payload bytes so tests
  * are stable; the Spark-side plumbing — schema, partitioning, batch
  * iteration shape — is real and is what matters at scale.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (fixed-width, columnar-friendly). */
  final case class MediaFeatures(
      media_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** STUB decode: deterministic pseudo-metadata from payload bytes. A real
    * deployment swaps this object for a codec-backed one with the same
    * signature; nothing else changes.
    */
  object FakeCodec {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      val w = 64 + math.abs(h % 1024)
      val ht = 64 + math.abs((h >> 10) % 1024)
      val frames = kind match {
        case "video" => 1 + math.abs(h % 300)
        case "audio" => 1 + math.abs(h % 16000)
        case _       => 1
      }
      (w, ht, frames)
    }
  }

  /** Decode + feature-extract: one pass, per-partition codec reuse, output
    * is a fixed-schema Dataset ready for columnar write. No shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (codec handles, model sessions)
      rows.map { r =>
        val (w, h, frames) = FakeCodec.decode(r.kind, r.payload)
        val checksum = r.payload.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, frames, checksum)
      }
    }
  }

  /** STUB resize: deterministic fake re-encode to a `targetW x targetH`
    * thumbnail — payload is truncated/cycled to the target byte budget
    * (3 bytes/px), so downstream sizes are what a real codec would hand
    * back. Same `mapPartitions` shape as [[extractFeatures]]: a real
    * deployment replaces the body with a codec call, nothing else moves.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    val budget = targetW * targetH * 3
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = Array.tabulate(budget)(i =>
          if (r.payload.isEmpty) 0.toByte else r.payload(i % r.payload.length))
        MediaRow(r.media_id, r.kind, out)
      }
    }
  }

  /** Frame sampling plan for video: every `stride`-th frame index, capped.
    * Pure column math over the decoded metadata — the expensive per-frame
    * decode happens downstream only for the selected indices.
    */
  def sampleFrameIndices(features: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    features
      .filter(col("kind") === "video")
      .withColumn("frame_indices",
        slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames))

  /** Ingest real media files as binary payloads via Spark's binaryFile
    * source — path/length/modTime metadata plus content, with
    * pathGlobFilter narrowing at the listing level (no decode needed to
    * skip non-matching files).
    */
  def readBinaryFiles(spark: SparkSession, path: String, glob: String = "*"): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("kind"),
        col("content").as("payload"))
      .as[MediaRow]
  }

  /** Build a deterministic synthetic media table from the documents table
    * (payload = utf-8 text bytes) — the fixture generator for tests and the
    * smoke path; real data arrives via `spark.read.format("binaryFile")`.
    */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
