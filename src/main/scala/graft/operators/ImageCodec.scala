package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Dataset, SparkSession}

/** REAL image decode over the JDK's own codecs — `javax.imageio` ships
  * PNG/BMP/GIF/JPEG readers in every JDK, so the decode path needs zero
  * new dependencies. Payload bytes decode to a pixel raster whose
  * integer luma feeds the SAME signature plumbing
  * ([[Multimodal.aHashGrid]]) the byte-domain phash queries use. This
  * retires the decode stub for image payloads; [[Multimodal.FakeDecoder]]
  * remains only for the byte-domain queries whose oracles are defined
  * over raw payload bytes.
  *
  * Luma is integer Rec.601 (`(299·r + 587·g + 114·b) / 1000`, exact in
  * 64-bit arithmetic) read from RASTER SAMPLES, not `getRGB`: for
  * grayscale images `getRGB` routes through a CS_GRAY→sRGB colorspace
  * transform that remaps stored values nonlinearly, while band samples
  * return the stored pixel exactly (and r=g=b=v collapses the formula
  * to v). 8-bit gray PNG, 24-bit RGB PNG, and 24-bit RGB BMP are all
  * lossless, so decode→features is bit-exact and the planted-image
  * query carries a full analytic value oracle: the oracle never decodes
  * anything — it recomputes the features from the pixel FORMULAS, so a
  * decoder that mangles channels, rows, or values fails the gate.
  *
  * Scale shape: encode and decode are scan-local `mapPartitions`
  * (iterator in/out, no partition materialization, zero shuffle) — at
  * cluster scale each task decodes its own partition's payloads, the
  * same contract as [[Multimodal.extractFrames]].
  */
object ImageCodec {
  ImageIO.setUseCache(false) // in-memory streams; no temp-file cache per call

  /** Decoded-image features: dimensions, exact integer luma sum, and
    * the [[Multimodal.aHashGrid]] perceptual signature over the
    * row-major luma raster.
    */
  case class ImageFeatures(media_id: Long, fmt: String, width: Long,
      height: Long, n_px: Long, luma_sum: Long, phash: Long)

  /** payload → (width, height, row-major integer luma raster, one byte
    * per pixel); None when the bytes decode as no supported image —
    * including TRUNCATED payloads that match a codec's magic but fail
    * mid-stream (`ImageIO.read` throws there rather than returning
    * null; a corrupt blob must quarantine, never kill the ingest task).
    */
  def lumaRaster(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) None
    else {
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val bands = raster.getNumBands
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v =
            if (bands >= 3) {
              val r = raster.getSample(x, y, 0)
              val g = raster.getSample(x, y, 1)
              val b = raster.getSample(x, y, 2)
              (299 * r + 587 * g + 114 * b) / 1000
            } else raster.getSample(x, y, 0)
          out(y * w + x) = v.toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    }
  } catch { case _: Exception => None }

  // Planted pixel formulas — plain integer arithmetic shared verbatim
  // with the DuckDB oracle, which recomputes the features analytically.
  // The three channels use DISTINCT coefficients so a decoder that
  // swaps bands (e.g. reads BGR storage order as RGB) fails the gate.
  def plantedR(id: Long, x: Int, y: Int): Int = ((7L * x + 13L * y + 31L * id) % 256).toInt
  def plantedG(id: Long, x: Int, y: Int): Int = ((11L * x + 17L * y + 29L * id) % 256).toInt
  def plantedB(id: Long, x: Int, y: Int): Int = ((5L * x + 19L * y + 23L * id) % 256).toInt

  /** Render + encode one planted image with the JDK writer for `fmt`
    * (`png-gray` = 8-bit grayscale PNG of the R formula, `png-rgb` /
    * `bmp-rgb` = 24-bit color). Loud failure if the JDK lacks the
    * writer — a silent empty payload would corrupt the oracle compare.
    */
  def encodePlanted(id: Long, w: Int, h: Int, fmt: String): Array[Byte] = {
    val img =
      if (fmt == "png-gray") {
        val im = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val r = im.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { r.setSample(x, y, 0, plantedR(id, x, y)); x += 1 }
          y += 1
        }
        im
      } else {
        val im = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        val r = im.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            r.setSample(x, y, 0, plantedR(id, x, y))
            r.setSample(x, y, 1, plantedG(id, x, y))
            r.setSample(x, y, 2, plantedB(id, x, y))
            x += 1
          }
          y += 1
        }
        im
      }
    val out = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, if (fmt == "bmp-rgb") "bmp" else "png", out)
    require(ok, s"no JDK image writer for format $fmt")
    out.toByteArray
  }

  /** Decode every payload and emit its luma features — one
    * `mapPartitions` pass (zero shuffle); payloads that are not images
    * are dropped (a production ingest would route them to quarantine,
    * the `src_corrupt` contract). `fmt` is carried from the row's mime
    * tag.
    */
  def decodeFeatures(in: Dataset[Multimodal.MediaRow], bits: Int)(
      implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        lumaRaster(r.payload).map { case (w, h, luma) =>
          var sum = 0L
          var i = 0
          while (i < luma.length) { sum += luma(i) & 0xff; i += 1 }
          ImageFeatures(r.media_id, r.mime, w.toLong, h.toLong,
            w.toLong * h, sum, Multimodal.aHashGrid(luma, bits))
        }
      }
    }
  }
}
