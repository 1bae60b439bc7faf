package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageHash, MediaFile}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + Hamming-banded near-dup
  * ([[Multimodal.imageHashes]]/[[Multimodal.phashNearDup]]).
  */
class PhashSpec extends SparkSpec {

  /** A deterministic little PNG: 8×8 gradient-ish pattern. */
  private def png(f: (Int, Int) => Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }
  private def gray(v: Int): Int = (v << 16) | (v << 8) | v

  test("aHash is invariant under pixel-replication upscaling (the recrawl-rescale case)") {
    val base = png((x, y) => gray(((x * 8 + y) * 4) % 256))
    // 2x upscale by pixel replication: block means equal the source pixels
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val up = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) up.setRGB(x, y, im.getRGB(x / 2, y / 2))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(up, "png", bos)
    import spark.implicits._
    val media = Seq(
      MediaFile(0L, "image", base, "s"),
      MediaFile(1L, "image", bos.toByteArray, "s"),
      MediaFile(2L, "image", png((x, y) => gray(255 - ((x * 8 + y) * 4) % 256)), "s"))
      .toDS()
    val hs = Multimodal.imageHashes(media).collect().sortBy(_.media_id)
    assert(hs(0).phash == hs(1).phash, "scaled copy must hash identically")
    assert(hs(0).phash != hs(2).phash, "inverted image must not collide")
  }

  test("stub path: equal payloads hash equal, different payloads scatter") {
    import spark.implicits._
    val media = Seq(
      MediaFile(0L, "image", "same bytes".getBytes, "s"),
      MediaFile(1L, "image", "same bytes".getBytes, "s"),
      MediaFile(2L, "image", "other bytes".getBytes, "s")).toDS()
    val hs = Multimodal.imageHashes(media).collect().sortBy(_.media_id)
    assert(hs(0).phash == hs(1).phash)
    assert(hs(0).phash != hs(2).phash)
  }

  test("phashNearDup: pigeonhole guarantee at hamming <= 3; 4-band spread misses (documented)") {
    import spark.implicits._
    val base = 0x0123456789abcdefL
    val hs = Seq(
      ImageHash(0L, base),
      ImageHash(1L, base ^ 0x7L),                 // 3 bits, one band
      ImageHash(2L, base ^ 0x0001000100010001L),  // 4 bits, one per band
      ImageHash(3L, base)                         // exact dup
    ).toDF()
    val pairs = Multimodal.phashNearDup(hs, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "<=3-bit pair must be found (pigeonhole)")
    assert(pairs.contains((0L, 3L)) && pairs.contains((1L, 3L)))
    // every band differs → no candidate, even though hamming 4 <= maxHamming:
    // the documented recall bound of 4 bands
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("audio envelope fingerprint: gain- and replication-invariant on real WAVs, seeds differ") {
    import spark.implicits._
    val seed = 0x5a5a1234abcdL
    val base = Multimodal.synthWav(seed)
    val half = Multimodal.synthWav(seed, gainShift = 2)
    val other = Multimodal.synthWav(0x0f0f9876fedcL)
    // sample-replication "resample": decode base, repeat each 16-bit
    // sample twice, rewrap as WAV (n divisible by 64 keeps segment
    // boundaries pair-aligned, so the envelope is EXACTLY preserved)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(base))
    val pcm = in.readAllBytes(); in.close()
    val rep = new Array[Byte](pcm.length * 2)
    for (i <- 0 until pcm.length / 2) {
      rep(4 * i) = pcm(2 * i); rep(4 * i + 1) = pcm(2 * i + 1)
      rep(4 * i + 2) = pcm(2 * i); rep(4 * i + 3) = pcm(2 * i + 1)
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val repIn = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(rep), fmt, (pcm.length / 2) * 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(repIn,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(
      MediaFile(0L, "audio", base, "s"), MediaFile(1L, "audio", half, "s"),
      MediaFile(2L, "audio", other, "s"), MediaFile(3L, "audio", bos.toByteArray, "s"))
      .toDS()
    val hs = Multimodal.audioHashes(media).collect().sortBy(_.media_id)
    assert(hs(0).fp == hs(1).fp, "half-gain copy must fingerprint identically")
    assert(hs(0).fp == hs(3).fp, "replication-resampled copy must fingerprint identically")
    assert(hs(0).fp != hs(2).fp, "different envelope must not collide")
  }

  test("recrawl detection on the fixture: 50 duplicated payloads pair with their originals") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticMedia(docs)
    val recrawl = Multimodal.syntheticMedia(docs.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 300000L))
    val pairs = Multimodal.phashNearDup(
        Multimodal.imageHashes(media.unionByName(recrawl)).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 50L).foreach { id =>
      assert(pairs.contains((id, id + 300000L)), s"recrawl of $id not detected")
    }
  }
}
