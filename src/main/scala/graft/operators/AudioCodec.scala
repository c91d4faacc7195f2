package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Dataset, SparkSession}

/** REAL audio decode over the JDK's own codec — `javax.sound.sampled`
  * ships a WAV (RIFF/PCM) reader and writer in every JDK, so like
  * [[ImageCodec]] this needs zero new dependencies and retires the
  * decode stub for audio payloads (video remains byte-domain: the JDK
  * has no video codec, and that residual stub is documented as such).
  *
  * 16-bit signed little-endian mono PCM round-trips WAV losslessly, so
  * decode → features is bit-exact and the planted-clip query carries a
  * full analytic value oracle: the oracle recomputes sample statistics
  * from the generating FORMULA without touching the codec — a decoder
  * that mangles endianness, sign, channel count, or frame length fails
  * the exact value compare.
  *
  * Scale shape: encode and decode are scan-local `mapPartitions`
  * (iterator in/out, zero shuffle), the [[Multimodal.extractFrames]]
  * contract.
  */
object AudioCodec {

  /** Decoded-clip features, all exact integers: frame count, sample
    * sum, sum of absolute samples (the scaled loudness proxy), and the
    * sample range.
    */
  case class AudioFeatures(media_id: Long, fmt: String, n_samples: Long,
      sum_s: Long, abs_sum: Long, s_min: Long, s_max: Long)

  /** The planted clips' PCM format: 8 kHz, 16-bit signed LE, mono. */
  private val PlantedRate = 8000f

  /** Planted sample formula — plain integer arithmetic shared verbatim
    * with the DuckDB oracle: sample i of clip `id` covers the full
    * signed 16-bit range (so an unsigned or big-endian misread fails
    * loudly on the planted set).
    */
  def plantedSample(id: Long, i: Int): Int =
    (((31L * id + 17L * i) % 65536L) - 32768L).toInt

  /** Render + WAV-encode one planted clip of `n` samples. */
  def encodePlanted(id: Long, n: Int): Array[Byte] =
    encodeWith(n, i => plantedSample(id, i))

  /** Window width (samples) of the SEGMENTED planted formula and the
    * VAD query's energy frames — one constant so the planted quiet/
    * loud boundaries land exactly on analysis-frame boundaries and the
    * oracle reproduces the segmentation from arithmetic alone.
    */
  val SegWindow = 50

  /** Segmented planted formula — speech-shaped clips for the VAD
    * query: window `i div SegWindow` is QUIET (|v| ≤ 100) when
    * `(window + id) % 3 == 0`, else LOUD with |v| ∈ [8000, 27999] and
    * alternating sign (both polarities exercised without the
    * full-range formula's occasional near-silent stretches — the
    * active/quiet classification is unambiguous by construction).
    * Plain integer arithmetic, shared verbatim with the DuckDB oracle.
    */
  def plantedSegSample(id: Long, i: Int): Int =
    if (((i / SegWindow) + id) % 3 == 0)
      ((7L * id + 13L * i) % 201L - 100L).toInt
    else {
      val b = ((31L * id + 17L * i) % 20000L + 8000L).toInt
      if (i % 2 == 0) b else -b
    }

  /** Render + WAV-encode one planted SEGMENTED clip of `n` samples. */
  def encodePlantedSegments(id: Long, n: Int): Array[Byte] =
    encodeWith(n, i => plantedSegSample(id, i))

  private def encodeWith(n: Int, sample: Int => Int): Array[Byte] = {
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(i)
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(PlantedRate, 16, 1, true, false)
    val in = new AudioInputStream(new ByteArrayInputStream(raw), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** payload → signed 16-bit samples; None when the bytes are not a
    * WAV clip in the supported shape (16-bit mono PCM — a production
    * ingest resamples other shapes first; here anything else routes to
    * quarantine like a corrupt record).
    */
  def samples(payload: Array[Byte]): Option[Array[Int]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val f = in.getFormat
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
        f.getSampleSizeInBits != 16 || f.getChannels != 1) None
      else {
        val raw = in.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val b0 = raw(2 * i) & 0xff
          val b1 = raw(2 * i + 1) & 0xff
          out(i) = (if (f.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0)
            .toShort.toInt
          i += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** One analysis frame's exact integer energy. */
  case class WindowEnergy(media_id: Long, w: Long, abs_sum: Long)

  /** Decode every payload and emit one row per [[SegWindow]]-sample
    * analysis frame with its exact abs-sum energy — the scan-local
    * front half of the VAD query (decode + framing + energy all inside
    * one `mapPartitions`, zero shuffle; only the tiny per-frame rows
    * ever leave the scan). Non-audio payloads drop (the quarantine
    * contract).
    */
  def windowEnergies(in: Dataset[Multimodal.MediaRow])(
      implicit spark: SparkSession): Dataset[WindowEnergy] = {
    import spark.implicits._
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        samples(r.payload).toSeq.flatMap { s =>
          s.grouped(SegWindow).zipWithIndex.map { case (g, w) =>
            var abs = 0L
            var i = 0
            while (i < g.length) { abs += math.abs(g(i).toLong); i += 1 }
            WindowEnergy(r.media_id, w.toLong, abs)
          }
        }
      }
    }
  }

  /** Decode every payload and emit exact sample statistics — one
    * `mapPartitions` pass (zero shuffle); non-audio payloads drop (the
    * quarantine contract). `fmt` carries the row's mime tag.
    */
  def decodeFeatures(in: Dataset[Multimodal.MediaRow])(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        samples(r.payload).map { s =>
          var sum = 0L
          var abs = 0L
          var mn = Long.MaxValue
          var mx = Long.MinValue
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            sum += v; abs += math.abs(v)
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          AudioFeatures(r.media_id, r.mime, s.length.toLong, sum, abs,
            if (s.isEmpty) 0L else mn, if (s.isEmpty) 0L else mx)
        }
      }
    }
  }
}
