package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaCodec

/** JDK-native media decode: ImageIO (PNG/JPEG/BMP/GIF) and
  * javax.sound.sampled (WAV) — format sniffing, metadata recovery,
  * histogram features, the opaque fallback, and pixel resize.
  */
class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int, gray: Int) = Multimodal.MediaGen.solidPng(w, h, gray)

  private def encodeAs(fmt: String, w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("sniff recognizes every JDK-decodable format by magic bytes") {
    assert(MediaCodec.sniff(png(2, 2, 10)) == "png")
    assert(MediaCodec.sniff(encodeAs("jpg", 4, 4, 200)) == "jpeg")
    assert(MediaCodec.sniff(encodeAs("bmp", 2, 2, 10)) == "bmp")
    assert(MediaCodec.sniff(encodeAs("gif", 2, 2, 10)) == "gif")
    assert(MediaCodec.sniff(Multimodal.MediaGen.constWav(8000, 100, 10)) == "wav")
    assert(MediaCodec.sniff("just text".getBytes) == "opaque")
  }

  test("PNG/BMP/GIF decode recovers dimensions and the exact luminance bin") {
    for (fmt <- Seq("png", "bmp", "gif")) {
      val d = MediaCodec.decode(encodeAs(fmt, 6, 3, gray = 77))
      assert(d.kind == fmt.replace("jpg", "jpeg"), s"$fmt kind=${d.kind}")
      assert(d.width == 6 && d.height == 3)
      // solid gray 77 -> every pixel in bin 77 >> 4 = 4, mass exactly 1
      assert(d.features(4) == 1.0f, s"$fmt hist=${d.features.toSeq}")
      assert(d.features.sum == 1.0f)
    }
  }

  test("JPEG decode recovers dimensions (lossy: histogram only sums to 1)") {
    val d = MediaCodec.decode(encodeAs("jpg", 5, 7, gray = 128))
    assert(d.kind == "jpeg" && d.width == 5 && d.height == 7)
    assert(math.abs(d.features.sum - 1.0f) < 1e-5)
  }

  test("WAV decode recovers the sample rate and the exact |PCM| bin") {
    val d = MediaCodec.decode(Multimodal.MediaGen.constWav(11000, amplitude = 12345, nSamples = 50))
    assert(d.kind == "wav" && d.sampleRate == 11000)
    assert(d.features(12345 * 16 / 32768) == 1.0f) // bin 6
    assert(d.width == 0 && d.height == 0)
  }

  test("undecodable payloads fall back to the deterministic byte histogram") {
    val junk = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val d = MediaCodec.decode(junk)
    assert(d.kind == "opaque" && d.width == 0 && d.sampleRate == 0)
    assert(d.features.toSeq == MediaCodec.byteHistogram(junk).toSeq)
    // corrupt magic: sniffs as png but ImageIO rejects -> opaque, not a throw
    val corrupt = png(2, 2, 10).take(12)
    assert(MediaCodec.decode(corrupt).kind == "opaque")
  }

  test("resizeImages pixel-resizes JDK images and passes opaque payloads through") {
    import spark.implicits._
    implicit val enc: org.apache.spark.sql.Encoder[Multimodal.MediaRecord] =
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png(8, 8, 50), 8, 8, 0),
      Multimodal.MediaRecord(2L, "blob", "not an image".getBytes, 7, 9, 0)).toDS()
    val out = Multimodal.resizeImages(media, 3, 2).collect().sortBy(_.media_id)
    val resized = MediaCodec.decode(out(0).payload)
    assert(resized.width == 3 && resized.height == 2)
    assert(resized.features(50 >> 4) == 1.0f) // solid gray survives the resize
    assert(out(0).width == 3 && out(0).height == 2) // re-encoded -> stamped
    // pass-through payload keeps its ORIGINAL metadata: the record must not
    // claim target dimensions its bytes don't have
    assert(out(1).payload.toSeq == "not an image".getBytes.toSeq)
    assert(out(1).width == 7 && out(1).height == 9)
  }

  test("extractFeatures carries decoded metadata per modality") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png(4, 5, 200), 0, 0, 0),
      Multimodal.MediaRecord(2L, "audio", Multimodal.MediaGen.constWav(9000, 1000, 20), 0, 0, 0),
      Multimodal.MediaRecord(3L, "text", "hello".getBytes, 0, 0, 0)).toDS()
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f(0).kind == "png" && f(0).width == 4 && f(0).height == 5)
    assert(f(1).kind == "wav" && f(1).sample_rate == 9000)
    assert(f(2).kind == "opaque" && f(2).byte_len == 5)
  }
}
