package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in batched
  * per-partition passes.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape,
  * typed output — is real and tested. IMAGE decode is REAL
  * (`javax.imageio`, the JDK-shipped PNG/JPEG/BMP/GIF codecs) and
  * AUDIO decode is REAL for WAV/AIFF (`javax.sound.sampled`, also
  * JDK-shipped — zero external dependencies); both keep a clearly
  * marked deterministic STUB fallback for payloads outside the JDK
  * codec set (e.g. MP3/OGG), preserving exactly the call shape a
  * production codec swap (FFmpeg) would have.
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

  /** REAL image decode via `javax.imageio` (JDK-shipped PNG/JPEG/BMP/GIF
    * codecs — no external dependency): true width/height, mean-luminance
    * brightness, and a 16-bin luminance histogram as the embedding.
    * Returns None for payloads no installed reader recognizes, so the
    * caller can fall back ([[decodeOneStub]]) instead of poisoning the
    * whole partition batch on one corrupt file.
    */
  private[graft] def decodeOneImageIO(m: MediaFile): Option[ImageFeatures] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val hist = new Array[Float](16)
      var lumSum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          // ITU-R BT.601 luma from the packed sRGB int
          val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          lumSum += lum
          hist(math.min(15, (lum / 16.0).toInt)) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(1, w * h)
      ImageFeatures(m.media_id, w, h, im.getColorModel.getNumComponents,
        lumSum / n, hist.map(_ / n))
    }
  }

  /** STUB fallback for payloads that are not decodable images (the
    * synthetic fixture's UTF-8 text payloads, truncated files) — keeps
    * the pipeline total and deterministic where a real codec would
    * dead-letter the row. The fake is deterministic in the payload
    * bytes: "dimensions" come from the first bytes, "brightness" is the
    * mean byte value, the "embedding" is a byte-histogram projection.
    */
  private[graft] def decodeOneStub(m: MediaFile): ImageFeatures = {
    val p = m.payload
    val w = 64 + (if (p.length > 0) (p(0) & 0x7f) else 0)
    val h = 64 + (if (p.length > 1) (p(1) & 0x7f) else 0)
    var i = 0
    var sum = 0.0
    val hist = new Array[Float](16)
    while (i < p.length) { // while-loop: the batched-decode hot path,
      val v = p(i) & 0xff  // no boxed map/sum allocation per row
      sum += v
      hist(v % 16) += 1f
      i += 1
    }
    val brightness = if (p.isEmpty) 0.0 else sum / p.length
    val n = math.max(1, p.length).toFloat
    ImageFeatures(m.media_id, w, h, 3, brightness, hist.map(_ / n))
  }

  /** Magic-byte sniff for the formats the JDK readers handle — PNG,
    * JPEG, GIF, BMP. Payloads without a known signature skip the
    * ImageIO reader probe entirely (scanning the reader registry per
    * row costs ~100µs even to FAIL; at corpus scale that dominated the
    * decode stage for non-image payloads).
    */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      ((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) ||            // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||  // GIF
      (p(0) == 'B' && p(1) == 'M'))                                  // BMP

  /** Image decode: real `ImageIO` when the payload carries a known
    * image signature and decodes, deterministic stub otherwise (see
    * [[decodeOneImageIO]] / [[decodeOneStub]]).
    */
  private[graft] def decodeOne(m: MediaFile): ImageFeatures =
    (if (looksLikeImage(m.payload)) decodeOneImageIO(m) else None)
      .getOrElse(decodeOneStub(m))

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

  /** Batched image decode (see [[batchedDecode]]): real `javax.imageio`
    * for decodable payloads, deterministic stub fallback otherwise.
    */
  def decodeImages(media: Dataset[MediaFile], batchSize: Int = 256): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    batchedDecode(media, batchSize)(decodeOne)
  }

  final case class ImageHash(media_id: Long, phash: Long)

  /** 64-bit average hash (aHash) of a decoded image: the 8×8 grid of
    * block-mean luminances, each bit = cell above the grid's own mean.
    * Block averaging is explicit integer-bounded arithmetic (no AWT
    * rescale call), so the hash is deterministic across JVMs and — by
    * construction — INVARIANT under pixel-replication upscaling
    * (spec-pinned): the scaled recrawl of an image hashes identically.
    */
  private[graft] def aHashFromImage(im: java.awt.image.BufferedImage): Long = {
    val (w, h) = (im.getWidth, im.getHeight)
    val cells = new Array[Double](64)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val x0 = cx * w / 8; val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
        val y0 = cy * h / 8; val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = im.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        cells(cy * 8 + cx) = if (n == 0) 0.0 else sum / n
        cx += 1
      }
      cy += 1
    }
    val mean = cells.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Deterministic stub hash for non-image payloads: a byte fold mixed
    * through splitmix64 — equal payloads get equal hashes (so the
    * dedup semantics survive on the synthetic fixture), unequal ones
    * scatter. */
  private[graft] def aHashStub(m: MediaFile): Long = {
    var hsh = 0L
    var i = 0
    while (i < m.payload.length) {
      hsh = hsh * 31L + (m.payload(i) & 0xffL)
      i += 1
    }
    var z = hsh + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Batched perceptual hashing: real aHash where the payload decodes,
    * stub fold otherwise — total, never job-failing. */
  def imageHashes(media: Dataset[MediaFile], batchSize: Int = 256): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    batchedDecode(media, batchSize) { m =>
      val real = if (looksLikeImage(m.payload))
        (try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload)))
        catch { case scala.util.control.NonFatal(_) => None })
          .map(aHashFromImage)
      else None
      ImageHash(m.media_id, real.getOrElse(aHashStub(m)))
    }
  }

  /** Near-duplicate images by perceptual-hash Hamming distance: the
    * 64-bit hash splits into four 16-bit chunk bands (the SimHash
    * pigeonhole — any pair within Hamming distance 3 shares at least
    * one band EXACTLY, so candidates come from a chunk equi-join, and
    * `bit_count(xor)` verifies before the pair dedup). Guaranteed
    * recall for `maxHamming` ≤ 3 with these 4 bands; beyond that the
    * band join is a recall/cost trade (same caveat as SimHash,
    * spec-documented). Never all-pairs: candidate space = Σ bucket².
    */
  def phashNearDup(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = (0 until 4).map(b => struct(lit(b).as("band"),
      shiftright(col("phash"), b * 16).bitwiseAND(lit(0xffffL)).as("v")))
    val chunks = hashes.select(col("media_id"), col("phash"),
        explode(array(bands: _*)).as("c"))
      .select(col("media_id"), col("phash"), col("c.band"), col("c.v"))
    chunks.as("a").join(chunks.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
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

  /** Magic-byte sniff for the containers the JDK readers handle — WAV
    * (`RIFF….WAVE`) and AIFF (`FORM….AIFF`). Same rationale as
    * [[looksLikeImage]]: unrecognized payloads skip the reader-registry
    * probe entirely.
    */
  private def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M' &&
        p(8) == 'A' && p(9) == 'I' && p(10) == 'F' && p(11) == 'F'))

  /** REAL audio decode via `javax.sound.sampled` (JDK-shipped WAV/AIFF
    * readers — no external dependency): true sample rate, per-channel
    * sample count, duration from the frame count, and RMS computed over
    * the actual PCM samples normalized to [-1, 1] (all channels
    * pooled). Handles 8- and 16-bit PCM, signed/unsigned, either
    * endianness. Returns None for payloads no reader accepts or sample
    * layouts outside that set, so the caller falls back to the stub
    * instead of poisoning the batch.
    */
  /** Decoded PCM access without per-sample boxing: sample count across
    * channels, an Int => Double accessor (both specialized — no
    * allocation per sample), rate, channels. None for layouts outside
    * signed/unsigned 8/16-bit PCM. Shared by the feature decode and
    * the envelope fingerprint so the two can't drift.
    */
  private def pcmAccess(m: MediaFile): Option[(Int, Int => Double, Float, Int)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        if (!(signed || unsigned) || (bits != 8 && bits != 16)) None
        else {
          val bytes = in.readAllBytes()
          val bytesPerSample = bits / 8
          val nAll = bytes.length / bytesPerSample // samples across channels
          val bigEndian = fmt.isBigEndian
          val sampleAt: Int => Double = { i =>
            val off = i * bytesPerSample
            val raw =
              if (bits == 8) { if (signed) bytes(off).toInt else (bytes(off) & 0xff) - 128 }
              else {
                val (b0, b1) = if (bigEndian) (bytes(off), bytes(off + 1))
                  else (bytes(off + 1), bytes(off))
                val s = ((b0 & 0xff) << 8) | (b1 & 0xff)
                if (signed) s.toShort.toInt else s - 32768
              }
            raw.toDouble / (if (bits == 8) 128.0 else 32768.0)
          }
          Some((nAll, sampleAt, fmt.getSampleRate, fmt.getChannels))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  private[graft] def decodeOneAudioJdk(m: MediaFile): Option[AudioFeatures] =
    pcmAccess(m).map { case (nAll, sampleAt, rateF, channels) =>
      var i = 0
      var sq = 0.0
      while (i < nAll) { // while-loop, matching the decode hot-path
        val x = sampleAt(i) // perf story (no boxed map/sum)
        sq += x * x
        i += 1
      }
      val frames = if (channels > 0) nAll / channels else nAll
      val rate = rateF.toDouble
      AudioFeatures(m.media_id, rate.toInt, frames,
        if (rate > 0) frames / rate else 0.0,
        if (nAll == 0) 0.0 else math.sqrt(sq / nAll))
    }

  final case class AudioHash(media_id: Long, fp: Long)

  /** 64-bit energy-envelope fingerprint: the stream splits into 64
    * equal time segments, bit i = segment i's energy above the track's
    * mean segment energy. GAIN-INVARIANT by construction (a uniform
    * volume change scales every segment and the mean equally —
    * spec-pinned on a real WAV) and exactly invariant under
    * sample-replication resampling, the audio analogs of the image
    * hash's rescale law. One pass, no sample materialization beyond
    * the decoded buffer. */
  private[graft] def audioEnvelopeJdk(m: MediaFile): Option[Long] =
    pcmAccess(m).flatMap { case (nAll, sampleAt, _, _) =>
      if (nAll < 64) None // too short to envelope — stub covers it
      else {
        val energy = new Array[Double](64)
        var i = 0
        while (i < nAll) {
          val x = sampleAt(i)
          // integer segment index: i*64/n, monotone, exact
          energy((i.toLong * 64L / nAll).toInt min 63) += x * x
          i += 1
        }
        val mean = energy.sum / 64.0
        var bits = 0L
        var b = 0
        while (b < 64) {
          if (energy(b) > mean) bits |= (1L << b)
          b += 1
        }
        Some(bits)
      }
    }

  /** Deterministic 16-bit mono WAV synthesis (specs + driver-contract
    * fixture): a square tone whose per-segment loud/quiet ENVELOPE is
    * `seed`'s bit pattern (bit of segment i ⇒ loud), so distinct seeds
    * produce distinct energy envelopes and the same seed at a
    * different `gainShift` (amplitudes are powers of two — right
    * shifts are exact) produces the same envelope at lower volume.
    */
  def synthWav(seed: Long, n: Int = 6400, gainShift: Int = 0): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bytes = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val seg = (i.toLong * 64L / n).toInt
      val loud = ((seed >> seg) & 1L) == 1L
      val base = if ((i / 16) % 2 == 0) 8192 else -8192 // square carrier
      val amp = if (loud) base else base / 8
      val v = amp >> gainShift
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally in.close()
    bos.toByteArray
  }

  /** Batched audio fingerprinting: real envelope hash where the
    * payload decodes, the deterministic byte-fold stub otherwise —
    * total, never job-failing ([[aHashStub]]'s contract). */
  def audioHashes(media: Dataset[MediaFile], batchSize: Int = 256): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    batchedDecode(media, batchSize) { m =>
      val real = if (looksLikeAudio(m.payload)) audioEnvelopeJdk(m) else None
      AudioHash(m.media_id, real.getOrElse(aHashStub(m)))
    }
  }

  /** STUB fallback — stands in for codecs beyond the JDK's WAV/AIFF
    * (same contract as [[decodeOneStub]]): a production build swaps ONLY
    * this function for e.g. an FFmpeg call with the same
    * `AudioFeatures` shape. Deterministic in the payload: "sample rate"
    * from the header byte, samples = payload length, RMS over the byte
    * values.
    */
  private[graft] def decodeAudioStub(m: MediaFile): AudioFeatures = {
    val p = m.payload
    val rate = if (p.nonEmpty && (p(0) & 1) == 1) 44100 else 16000
    val n = p.length.toLong
    var i = 0
    var sq = 0.0
    while (i < p.length) { // while-loop, matching the batched-decode
      val v = (p(i) & 0xff) - 128.0 // perf story (no boxed map/sum)
      sq += v * v
      i += 1
    }
    val rms = if (p.isEmpty) 0.0 else math.sqrt(sq / p.length)
    AudioFeatures(m.media_id, rate, n, n.toDouble / rate, rms)
  }

  /** Audio decode: real `javax.sound.sampled` when the payload carries
    * a WAV/AIFF signature and decodes, deterministic stub otherwise
    * (see [[decodeOneAudioJdk]] / [[decodeAudioStub]]).
    */
  private[graft] def decodeAudioOne(m: MediaFile): AudioFeatures =
    (if (looksLikeAudio(m.payload)) decodeOneAudioJdk(m) else None)
      .getOrElse(decodeAudioStub(m))

  /** Batched audio decode (see [[batchedDecode]]): real JDK WAV/AIFF
    * codecs for decodable payloads, deterministic stub fallback
    * otherwise.
    */
  def decodeAudio(media: Dataset[MediaFile], batchSize: Int = 256): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    batchedDecode(media, batchSize)(decodeAudioOne)
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
