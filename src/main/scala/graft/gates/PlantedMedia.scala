package graft.gates

import java.awt.image.BufferedImage

/** Deterministic planted media fixtures: REAL encoded bytes whose decoded
  * content is an analytic function of the id alone, so a SQL oracle can
  * restate the expected decode features without any codec — the planted-
  * input trick the PII/boilerplate gates use, applied to binary media.
  *
  * [[checkerPng]]: a w×h checkerboard of two id-derived colors, encoded
  * as a real PNG via `javax.imageio`. PNG is lossless, so the decoded
  * pixels equal the planted ones exactly; dims, per-channel means and the
  * luminance histogram are closed-form in (id → w, h, colorA, colorB)
  * arithmetic any engine can mirror.
  */
object PlantedMedia {

  /** Planted geometry/colors (all nonnegative-id arithmetic, mirrored
    * literally by the `multimodal_decode` oracle SQL):
    * w = 1 + id%7, h = 1 + id%5;
    * colorA = (id%256, 7id%256, 13id%256) on cells with (x+y) even;
    * colorB = (3id%256, 11id%256, 17id%256) on the odd cells.
    */
  def checkerPng(id: Long): Array[Byte] = {
    val w = (1 + id % 7).toInt
    val h = (1 + id % 5).toInt
    val ca = rgb((id % 256).toInt, ((id * 7) % 256).toInt, ((id * 13) % 256).toInt)
    val cb = rgb(((id * 3) % 256).toInt, ((id * 11) % 256).toInt, ((id * 17) % 256).toInt)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if ((x + y) % 2 == 0) ca else cb)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def rgb(r: Int, g: Int, b: Int): Int = (r << 16) | (g << 8) | b

  /** Planted mono PCM-16 WAV (8 kHz): n = 16 + id%17 samples with
    * sample_i = (31·id + 7·i) mod 65536 − 32768 — every sample value is
    * closed-form in (id, i), so the `multimodal_audio` oracle recomputes
    * mean/RMS by unnesting `range(n)` with the same arithmetic.
    */
  def pcmWav(id: Long): Array[Byte] = {
    val n = (16 + id % 17).toInt
    val pcm = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      pcm.putShort((((id * 31 + i * 7) % 65536) - 32768).toShort)
      i += 1
    }
    graft.llm.WavDecoder.wrapPcm(pcm.array(), channels = 1, sampleRate = 8000)
  }
}
