package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY north-star): image/audio/video as
  * opaque `binary` payloads with typed metadata, batch-decoded inside
  * `mapPartitions`.
  *
  * The Spark-side contract is real and tested — schema, hash
  * repartitioning for decode parallelism, per-partition batch iteration
  * (the Scala analog of `mapInPandas` batches), frame-sampling explode —
  * while the codec itself is a clearly marked deterministic STUB: this
  * container ships no image/audio libraries, so `decodeStub` derives fake
  * dimensions from the payload bytes. Swapping in a real decoder changes
  * only that one function.
  */
object Multimodal {

  final case class MediaRow(id: Long, modality: String, payload: Array[Byte])
  final case class MediaFeatures(
      id: Long, modality: String, n_bytes: Int, width: Int, height: Int,
      n_frames: Int, checksum: Long)

  /** Attach a modality + binary payload to any (id, text) relation — the
    * fixture adapter for the media pipeline (real corpora read
    * `binaryFile`/parquet binary columns instead). */
  def asMedia(df: DataFrame, id: String, payload: String): Dataset[MediaRow] =
    df.select(
      col(id).cast("long").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(id), lit(3)) + 1).cast("int")).as("modality"),
      col(payload).cast("binary").as("payload"))
      .as(Encoders.product[MediaRow])

  /** STUB decoder: deterministic fake "decode" of a payload. A real
    * implementation would parse the container format here (and only
    * here); everything around it — batching, partitioning, schema — is
    * production plumbing. */
  def decodeStub(m: MediaRow): MediaFeatures = {
    val bytes = m.payload
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = (checksum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    val width = 64 + (checksum % 960).toInt
    val height = 64 + ((checksum / 7) % 540).toInt
    val frames = if (m.modality == "video") 1 + (bytes.length % 120) else 1
    MediaFeatures(m.id, m.modality, bytes.length, width, height, frames, checksum)
  }

  /** Batch feature extraction: repartition by id for even decode
    * parallelism (decode cost is per-item, not per-byte-of-split), then
    * decode per partition — one iterator pass, no per-row task overhead,
    * mirroring mapInPandas batch shape. */
  def extractFeatures(media: Dataset[MediaRow], partitions: Int): Dataset[MediaFeatures] =
    media.repartition(partitions, col("id"))
      .mapPartitions((rows: Iterator[MediaRow]) => rows.map(decodeStub))(
        Encoders.product[MediaFeatures])

  /** Frame sampling plan: every `step`-th frame index per video — pure
    * relational explode over the decoded metadata (no payload movement). */
  def sampleFrames(features: Dataset[MediaFeatures], step: Int): DataFrame =
    features.filter(col("modality") === "video")
      .select(col("id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_no"))

  /** Resize plan: aspect-preserving fit of each visual item into a
    * `box`×`box` square — the standard pre-training normalization step.
    * Output dimensions are pure INTEGER math over the decoded metadata
    * ((dim * box) div max(w,h) — exactly mirrorable in SQL, no float
    * rounding divergence), so the plan is oracle-checkable end-to-end;
    * the pixel resample itself would live next to the codec in
    * [[decodeStub]]'s slot and is out of scope in this container. Audio
    * is excluded (no spatial dims to resize). */
  def resizePlan(features: Dataset[MediaFeatures], box: Int): DataFrame =
    features.filter(col("modality") =!= "audio")
      .select(col("id"), col("modality"), col("width"), col("height"),
        expr(s"cast((width * $box) div greatest(width, height) as int)").as("out_w"),
        expr(s"cast((height * $box) div greatest(width, height) as int)").as("out_h"))
}
