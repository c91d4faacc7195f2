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
    if (img == null) None else Some(lumaOf(img))
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
          ImageFeatures(r.media_id, r.mime, w.toLong, h.toLong,
            w.toLong * h, lumaSum(luma), Multimodal.aHashGrid(luma, bits))
        }
      }
    }
  }

  /** Exact integer sum of a luma raster's unsigned byte values. */
  def lumaSum(luma: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < luma.length) { sum += luma(i) & 0xff; i += 1 }
    sum
  }

  // ---- Animated GIF (multi-frame) -------------------------------------

  /** Per-frame temporal shift of the planted animated-GIF formula:
    * frame f's gray value is `(7x + 13y + 31·id + 41·f) mod 256`, so
    * consecutive frames differ by exactly 41 (mod 256) at every pixel —
    * which makes the per-pixel |Δ| analytically two-valued (41 below
    * the wrap, 215 across it) and the temporal-difference feature
    * exactly oracle-able.
    */
  val GifFrameShift = 41

  def plantedFrameGray(id: Long, f: Int, x: Int, y: Int): Int =
    ((7L * x + 13L * y + 31L * id + GifFrameShift.toLong * f) % 256).toInt

  /** The identity 256-level gray palette: index i renders as (i,i,i),
    * so stored GIF indices ARE the planted gray values and the
    * write→read round trip is bit-lossless (GIF's palette indirection
    * costs nothing when the palette is the identity).
    */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Encode one planted animated GIF: `n` full-size indexed-gray frames
    * through the JDK's own sequence writer
    * (`ImageWriter.prepareWriteSequence` / `writeToSequence` — the
    * multi-image API `ImageIO.write` hides). Loud failure if the JDK
    * lacks the writer.
    */
  def encodePlantedGif(id: Long, w: Int, h: Int, n: Int): Array[Byte] = {
    val writers = ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no JDK GIF writer")
    val writer = writers.next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < n) {
        val im = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val r = im.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { r.setSample(x, y, 0, plantedFrameGray(id, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(im, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** ALL frames of a (possibly animated) image payload, each as a
    * (width, height, row-major luma raster) — `ImageReader.getNumImages`
    * + `read(i)`, the frame-enumeration API `ImageIO.read` truncates to
    * frame 0. None when no JDK reader claims the bytes or the stream
    * dies mid-frame (the quarantine contract, like [[lumaRaster]]).
    * Single-frame formats come back as one-element sequences, so this
    * subsumes the still-image path.
    */
  def frameRasters(payload: Array[Byte]): Option[Seq[(Int, Int, Array[Byte])]] = try {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    val readers = ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); None }
    else {
      val rd = readers.next()
      try {
        rd.setInput(iis, false, true)
        val n = rd.getNumImages(true)
        Some((0 until n).map(i => lumaOf(rd.read(i))))
      } finally {
        rd.dispose()
        iis.close()
      }
    }
  } catch { case _: Exception => None }

  /** Row-major integer luma of a decoded image (the [[lumaRaster]] loop,
    * shared by the single- and multi-frame readers). Band-1 rasters
    * return the stored sample directly — for an indexed GIF under the
    * identity gray palette that IS the planted value.
    */
  private def lumaOf(img: BufferedImage): (Int, Int, Array[Byte]) = {
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
    (w, h, out)
  }
}
