package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in batched
  * per-partition passes.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape,
  * typed output — is real and tested. The codec step is a clearly
  * marked STUB (this container has no image/audio libraries): it
  * deterministically fakes a decode from the payload bytes, preserving
  * exactly the call shape a real codec (JNI/JavaCV/ImageIO) would have.
  *
  * Scale notes: payloads stay columnar (parquet binary) end-to-end;
  * [[decodeImages]] is a narrow mapPartitions (no shuffle) that
  * processes rows in bounded batches — the Scala analogue of
  * `mapInPandas` batch processing — so executor memory is bounded by
  * `batchSize × payload`, not partition size. Repartition upstream by
  * byte budget (`repartitionForDecode`) before fan-out to the codec.
  */
object Multimodal {

  final case class MediaFile(media_id: Long, modality: String,
                             payload: Array[Byte], source: String)
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 channels: Int, brightness: Double,
                                 embedding: Array[Float])

  /** Deterministic media fixture from `documents`: payload = UTF-8 text
    * bytes posing as an encoded image.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"),
        lit("image").as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[MediaFile]
  }

  /** Size partitions for the codec step: target ~`targetMb` MB of
    * payload per partition so decode memory is bounded regardless of
    * upstream layout.
    */
  def repartitionForDecode(media: Dataset[MediaFile], totalBytes: Long,
                           targetMb: Int = 64): Dataset[MediaFile] = {
    val parts = math.max(1, (totalBytes / (targetMb * 1024L * 1024L)).toInt)
    media.repartition(parts, col("media_id"))
  }

  /** STUB — stands in for a real image codec.
    *
    * A production build replaces ONLY this function with e.g. an
    * ImageIO/JavaCV call returning the same `ImageFeatures` shape.
    * The fake is deterministic in the payload bytes: "dimensions" come
    * from the first bytes, "brightness" is the mean byte value, the
    * "embedding" is a seeded byte-histogram projection.
    */
  private[operators] def decodeOneStub(m: MediaFile): ImageFeatures = {
    val p = m.payload
    val w = 64 + (if (p.length > 0) (p(0) & 0x7f) else 0)
    val h = 64 + (if (p.length > 1) (p(1) & 0x7f) else 0)
    val brightness =
      if (p.isEmpty) 0.0 else p.map(b => (b & 0xff).toDouble).sum / p.length
    val hist = new Array[Float](16)
    p.foreach(b => hist((b & 0xff) % 16) += 1f)
    val n = math.max(1, p.length).toFloat
    ImageFeatures(m.media_id, w, h, 3, brightness, hist.map(_ / n))
  }

  /** Batched decode over partitions — bounded-memory batches, the
    * `mapInPandas` call shape in Scala; ONE batching shell serves every
    * modality (a real codec would decode each `batch` in one vectorized
    * call).
    */
  private def batchedDecode[O: org.apache.spark.sql.Encoder](
      media: Dataset[MediaFile], batchSize: Int)(decode: MediaFile => O): Dataset[O] =
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => batch.iterator.map(decode))
    }

  /** Batched image decode (see [[batchedDecode]]). */
  def decodeImages(media: Dataset[MediaFile], batchSize: Int = 256): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    batchedDecode(media, batchSize)(decodeOneStub)
  }

  /** Resize plan: target dimensions preserving aspect ratio against a
    * bounding box — pure integer arithmetic on metadata, decode-free
    * (the real resample happens in the codec stage).
    */
  def resizePlan(features: Dataset[ImageFeatures], maxSide: Int): DataFrame = {
    val scaleNum = lit(maxSide)
    val longest = greatest(col("width"), col("height"))
    val needs = longest > maxSide
    features.toDF().select(col("media_id"), col("width"), col("height"),
      when(needs, (col("width") * scaleNum).divide(longest).cast("int"))
        .otherwise(col("width")).as("target_w"),
      when(needs, (col("height") * scaleNum).divide(longest).cast("int"))
        .otherwise(col("height")).as("target_h"))
  }

  /** Frame-sampling plan for video payloads: every `everyNth` frame of
    * `frameCount` (metadata-declared) frames — pure plan, no decode.
    */
  def frameSamplePlan(media: DataFrame, frameCount: Int, everyNth: Int): DataFrame =
    media.select(col("media_id"),
        explode(sequence(lit(0), lit(frameCount - 1), lit(everyNth))).as("frame_idx"))
      .orderBy(col("media_id"), col("frame_idx"))

  final case class AudioFeatures(media_id: Long, sample_rate: Int,
                                 n_samples: Long, duration_s: Double,
                                 rms: Double)

  /** STUB — stands in for a real audio codec (same contract as
    * [[decodeOneStub]]): a production build swaps ONLY this function for
    * e.g. a javax.sound/FFmpeg call with the same `AudioFeatures` shape.
    * Deterministic in the payload: "sample rate" from the header byte,
    * samples = payload length, RMS over the byte values.
    */
  private[operators] def decodeAudioStub(m: MediaFile): AudioFeatures = {
    val p = m.payload
    val rate = if (p.nonEmpty && (p(0) & 1) == 1) 44100 else 16000
    val n = p.length.toLong
    val rms = if (p.isEmpty) 0.0
      else math.sqrt(p.map(b => { val v = (b & 0xff) - 128.0; v * v }).sum / p.length)
    AudioFeatures(m.media_id, rate, n, n.toDouble / rate, rms)
  }

  /** Batched audio decode (see [[batchedDecode]]). */
  def decodeAudio(media: Dataset[MediaFile], batchSize: Int = 256): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    batchedDecode(media, batchSize)(decodeAudioStub)
  }

  /** Segmentation plan for audio: fixed `windowS`-second chunks with
    * `overlapS` seconds of overlap (the ASR/embedding pre-chunking
    * shape) — pure metadata arithmetic, decode-free. Emits
    * (media_id, chunk_idx, start_s, end_s).
    */
  def audioChunkPlan(features: Dataset[AudioFeatures], windowS: Double,
                     overlapS: Double = 0.0): DataFrame = {
    require(windowS > overlapS,
      s"window ($windowS s) must exceed overlap ($overlapS s)")
    val stride = windowS - overlapS
    val nChunks = greatest(lit(1),
      ceil((col("duration_s") - lit(overlapS)) / stride).cast("int"))
    features.toDF().select(col("media_id"), col("duration_s"),
        posexplode(sequence(lit(0), nChunks - 1)))
      .select(col("media_id"), col("pos").as("chunk_idx"),
        round(col("col") * stride, 6).as("start_s"),
        round(least(col("col") * stride + windowS, col("duration_s")), 6)
          .as("end_s"))
      .orderBy(col("media_id"), col("chunk_idx"))
  }
}
