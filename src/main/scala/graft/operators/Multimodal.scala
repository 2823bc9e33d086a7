package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with a
  * typed metadata struct, plus per-batch feature extraction.
  *
  * Spark-side plumbing (schema, partition sizing, batch iteration) is real
  * and tested; the *actual media decode* is stubbed behind
  * [[MediaCodec.decodeStub]] — the container has no image/audio libraries,
  * so the stub is a clearly-marked deterministic fake with the same
  * signature a real decoder (e.g. javacv / a JNI codec) would have.
  */
object Multimodal {

  /** Canonical media row: id + payload + typed metadata. */
  case class MediaRecord(media_id: Long, modality: String, payload: Array[Byte],
                         width: Int, height: Int, sample_rate: Int)
  /** Extracted features: fixed-size vector + payload digest + size. */
  case class MediaFeatures(media_id: Long, modality: String, byte_len: Int,
                           digest: String, features: Array[Float])

  object MediaCodec {
    /** STUB — stands in for a real image/audio decoder (none available in
      * this container). Deterministic: features are derived from the bytes
      * (histogram of byte values folded to 16 bins, L1-normalized), so tests
      * and oracles are stable. A real implementation would decode pixels /
      * PCM frames here with the same signature.
      */
    def decodeStub(payload: Array[Byte]): Array[Float] = {
      val bins = new Array[Float](16)
      var i = 0
      while (i < payload.length) { bins((payload(i) & 0xff) % 16) += 1f; i += 1 }
      val n = math.max(1, payload.length).toFloat
      bins.map(_ / n)
    }

    /** STUB resize — a real implementation would decode pixels, scale
      * (bilinear), and re-encode with the same signature. The stub
      * nearest-neighbor-samples payload bytes down/up to `targetBytes`, so
      * it is deterministic, size-exact, and an identity when sizes match.
      */
    def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
      if (payload.isEmpty || targetBytes <= 0) Array.emptyByteArray
      else if (targetBytes == payload.length) payload
      else Array.tabulate(targetBytes)(i =>
        payload(((i.toLong * payload.length) / targetBytes).toInt))
  }

  /** Wrap a DataFrame that has a binary column into the canonical media
    * schema, deriving metadata columns. Pure column ops — stays columnar.
    */
  def asMedia(df: DataFrame, idCol: String, binCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(binCol).as("payload"),
      lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))

  /** Batch feature extraction: the decode runs per-partition over an
    * iterator (the JVM analogue of `mapInPandas` batches) so a real codec
    * would amortize model/codec init per partition, not per row. Partition
    * count should be sized so `payload` batches fit executor memory —
    * callers `repartition` by bytes upstream for large media.
    */
  def extractFeatures(media: Dataset[MediaRecord])(
      implicit enc: org.apache.spark.sql.Encoder[MediaFeatures]): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      // per-partition init: one digest instance (and, in a real codec, one
      // decoder) reused across the batch
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val feats = MediaCodec.decodeStub(m.payload)
        md5.reset()
        MediaFeatures(m.media_id, m.modality, m.payload.length,
          md5.digest(m.payload).map("%02x".format(_)).mkString,
          feats)
      }
    }

  /** Batch resize: per-partition iterator like [[extractFeatures]] (codec
    * init amortized per partition). Only the payload is replaced in place —
    * `MediaRecord` carries no size metadata; `byte_len` lives on
    * [[MediaFeatures]] and is recomputed downstream by [[extractFeatures]].
    */
  def resize(media: Dataset[MediaRecord], targetBytes: Int)(
      implicit enc: org.apache.spark.sql.Encoder[MediaRecord]): Dataset[MediaRecord] =
    media.mapPartitions { it =>
      it.map(m => m.copy(payload = MediaCodec.resizeStub(m.payload, targetBytes)))
    }

  /** Frame sampling for video-like payloads: keep every `stride`-th chunk of
    * `frameBytes` bytes — the plumbing (explode to frames, keyed by index)
    * that a real frame decoder would feed.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col(binCol)) / frameBytes).cast("int")
    df.select(col(idCol).as("media_id"), col(binCol).as("payload"), nFrames.as("n_frames"))
      .withColumn("frame_idx", explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .filter(col("n_frames") > 0)
      .withColumn("frame", expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select("media_id", "frame_idx", "frame")
  }
}
