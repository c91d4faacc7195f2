package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing (SURVEY.md §2.4): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * runs per partition over batches of payloads — the Scala/Dataset analog
  * of Python's `mapInPandas` (per-partition iterator in, iterator out; no
  * per-row UDF dispatch, decoder state amortized across the partition).
  *
  * IMAGE and AUDIO payloads decode for REAL through the JDK's own
  * codecs — see [[ImageCodec]] (javax.imageio PNG/BMP/GIF/JPEG) and
  * [[AudioCodec]] (javax.sound.sampled WAV), zero new dependencies,
  * each exercised end-to-end by its planted-media query's analytic
  * oracle (`multimodal_decode`, `multimodal_audio`). [[FakeDecoder]]
  * remains ONLY for the byte-domain queries whose oracles are defined
  * over raw payload bytes (the JDK ships no VIDEO codec, and document
  * text stands in for those payloads); the schema, frame sampling,
  * partition-batched execution shape, and encoders around it are real
  * and are what any further codec plugs into via [[MediaDecoder]].
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features: one row per sampled frame. */
  case class FrameFeatures(
      media_id: Long,
      byte_len: Long,
      frame_idx: Int,
      frame_off: Long,
      features: Array[Double])

  /** Decoder contract — a real implementation would wrap an image/audio
    * codec; it sees one frame's byte slice and returns a fixed-width
    * feature vector.
    */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decodeFrame(payload: Array[Byte], offset: Int, length: Int): Array[Double]
  }

  /** STUB decoder — deterministic fake standing in for the absent media
    * libraries: features are byte-histogram moments of the frame slice.
    * Do NOT interpret the values; only the plumbing around them is real.
    */
  object FakeDecoder extends MediaDecoder {
    val featureDim = 4
    def decodeFrame(payload: Array[Byte], offset: Int, length: Int): Array[Double] = {
      var sum = 0L; var sumSq = 0L; var mn = 255; var mx = 0
      var i = offset
      val end = math.min(offset + length, payload.length)
      while (i < end) {
        val b = payload(i) & 0xff
        sum += b; sumSq += b.toLong * b; mn = math.min(mn, b); mx = math.max(mx, b)
        i += 1
      }
      val n = math.max(end - offset, 1)
      Array(sum.toDouble / n, sumSq.toDouble / n, mn.toDouble, mx.toDouble)
    }
  }

  /** Average-hash perceptual signature (aHash) with PROPORTIONAL block
    * boundaries: byte i belongs to block `⌊i·bits/n⌋`, so the payload
    * is gridded into exactly `bits` cells like the classic image aHash
    * (resize to a fixed cell COUNT, per-cell mean vs global mean) —
    * every block is non-empty whenever `n ≥ bits`, and for shorter
    * payloads the `n` populated bits SPREAD ACROSS the full bit range
    * instead of packing low. Both alternatives fail: a fixed block
    * width leaves the high bits structurally zero below `bits × width`
    * bytes (round-7 verdict — the whole short-doc corpus collided in
    * the zero bands and banded LSH degenerated to all-pairs), and a
    * uniform `ceil(n/bits)` width still zeroes the tail bits for most
    * lengths (`ceil(n/ceil(n/bits)) < bits` for e.g. n=70 → 35
    * populated bits), starving the top LSH band of signal on any
    * short-payload corpus. Bit b compares block b's mean to the whole
    * payload's by cross-multiplied integers (`s·n > total·len`, never
    * a float division), exactly reproducible in SQL (`(i * bits) // n`
    * is the block index).
    */
  def aHashGrid(payload: Array[Byte], bits: Int): Long = {
    require(bits > 0 && bits < 64,
      s"bits must be in [1, 63] to keep the signature a positive long, got $bits")
    val n = payload.length
    if (n == 0) return 0L
    // Proportional blocks make s ≤ 255·(n/bits + 1), so the
    // cross-multiplied compare s·n can reach ~255·n²/bits and silently
    // wraps Long once n²/bits passes ~2⁵⁴ (inside JVM array limits —
    // plausible for real media blobs, where the fixed-width version's
    // s ≤ 255·width could never overflow). The guard scales WITH bits:
    // the old fixed `n > 2³⁰` cutoff was derived from bits=60 and
    // wrapped well below it for small widths (bits=4 overflows near
    // n≈3.8e8). Branch to an exact 128-bit compare past the bound;
    // the DuckDB twin errors loudly on BIGINT overflow rather than
    // diverging.
    val huge = n.toLong * n / bits > (1L << 54)
    var total = 0L
    var i = 0
    while (i < n) { total += payload(i) & 0xff; i += 1 }
    var sig = 0L
    var start = 0
    while (start < n) {
      val b = (start.toLong * bits / n).toInt
      var end = start
      var s = 0L
      while (end < n && (end.toLong * bits / n).toInt == b) {
        s += payload(end) & 0xff; end += 1
      }
      val above =
        if (huge) BigInt(s) * n > BigInt(total) * (end - start)
        else s * n > total * (end - start)
      if (above) sig |= 1L << b
      start = end
    }
    sig
  }

  /** Stride-resample each payload to every `stride`-th byte — the stub
    * stand-in for an image resize / audio downsample (a real resampler
    * slots into the same per-partition, zero-shuffle shape and the same
    * payload-in/payload-out contract). Deterministic byte selection, so
    * the result is oracle-able from the original blob.
    */
  def resample(in: Dataset[MediaRow], stride: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    require(stride > 0, "stride must be positive")
    in.mapPartitions { rows =>
      rows.map { r =>
        val out = Array.ofDim[Byte]((r.payload.length + stride - 1) / stride)
        var i = 0
        var j = 0
        while (i < r.payload.length) { out(j) = r.payload(i); j += 1; i += stride }
        r.copy(payload = out)
      }
    }
  }

  /** Frame-sample each payload every `frameBytes` bytes and decode each
    * frame. Runs as one `mapPartitions` pass: the iterator-in /
    * iterator-out shape never materializes a partition in memory, and at
    * cluster scale each task decodes its partition's payloads with zero
    * shuffle.
    */
  def extractFrames(in: Dataset[MediaRow], decoder: MediaDecoder, frameBytes: Int)(
      implicit spark: SparkSession): Dataset[FrameFeatures] = {
    import spark.implicits._
    require(frameBytes > 0, "frameBytes must be positive")
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val len = r.payload.length
        val nFrames = math.max(1, (len + frameBytes - 1) / frameBytes)
        (0 until nFrames).iterator.map { f =>
          FrameFeatures(
            media_id = r.media_id,
            byte_len = len.toLong,
            frame_idx = f,
            frame_off = f.toLong * frameBytes,
            features = decoder.decodeFrame(r.payload, f * frameBytes, frameBytes))
        }
      }
    }
  }
}
