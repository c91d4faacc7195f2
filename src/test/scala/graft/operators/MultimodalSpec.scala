package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal.{FakeDecoder, MediaRow}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("frame sampling: one row per frameBytes slice, zero-byte payload gets one frame") {
    import spark.implicits._
    implicit val s = spark
    val in = Seq(
      MediaRow(1L, Array.fill[Byte](600)(7), "image/fake"),
      MediaRow(2L, Array.empty[Byte], "audio/fake")).toDS()
    val out = Multimodal.extractFrames(in, FakeDecoder, frameBytes = 256)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    val byId = out.groupBy(_.media_id)
    assert(byId(1L).map(_.frame_idx).toSeq === Seq(0, 1, 2)) // ceil(600/256)=3
    assert(byId(1L).map(_.frame_off).toSeq === Seq(0L, 256L, 512L))
    assert(byId(1L).forall(_.byte_len === 600L))
    assert(byId(2L).map(_.frame_idx).toSeq === Seq(0))
  }

  test("aHashGrid: bit set iff block mean beats payload mean; dup payloads collide") {
    // 120 bytes over 60 proportional blocks (2 bytes each): the low
    // half's blocks sit below the mean (bits 0..29 clear), the high
    // half's above (bits 30..59 set) — including bit 59, pinning that
    // the TOP block populates and can set.
    val p = Array.fill[Byte](60)(0) ++ Array.fill[Byte](60)(100)
    val sig = Multimodal.aHashGrid(p, 60)
    (0 until 30).foreach(b => assert((sig >> b & 1L) === 0L, s"low block $b clear"))
    (30 until 60).foreach(b => assert((sig >> b & 1L) === 1L, s"high block $b set"))
    // Identical payloads collide; one-byte jitter leaves blocks that
    // sit decisively above/below the mean unmoved (borderline blocks
    // MAY flip — the global mean shifted — which is why near-equality
    // composes via Hamming bands, not exact equality).
    assert(Multimodal.aHashGrid(p.clone(), 60) === sig)
    val jitter = p.clone(); jitter(3) = 1
    val jSig = Multimodal.aHashGrid(jitter, 60)
    assert((jSig >> 59 & 1L) === 1L && (jSig & 1L) === 0L,
      "decisive blocks must survive one-byte jitter")
    // Empty payload hashes to 0; nothing at or above bit 60 ever sets.
    assert(Multimodal.aHashGrid(Array.empty[Byte], 60) === 0L)
    assert((sig >>> 60) === 0L)
    // Sub-60-byte payloads spread their populated bits across the full
    // range rather than packing low: a 10-byte payload's last byte
    // lands in block ⌊9·60/10⌋ = 54 — deep inside the top LSH band
    // (bits 45-59), where the old fixed-width scheme left nothing.
    val tiny = Array.fill[Byte](9)(0) :+ 100.toByte
    assert((Multimodal.aHashGrid(tiny, 60) >> 54 & 1L) === 1L,
      "final byte of a 10-byte payload must land in block 54 and set it")
  }

  test("phash groups surface planted duplicate payloads, nothing else") {
    import spark.implicits._
    // The corpus has NO exact text duplicates (the round-7 fixed-width
    // signature made corpus groups appear via hash-collision artifacts
    // — a symptom of its degeneracy, not planted dups), so this drill
    // plants its own: docs 1/3 identical, 2 unique.
    val tmp = java.nio.file.Files.createTempDirectory("phash_docs").toString
    val a = (1 to 60).map(i => s"tok$i").mkString(" ")
    val b = (1 to 60).map(i => s"other$i").mkString(" ")
    Seq((1L, a, "en", "t", 0L), (2L, b, "en", "t", 0L), (3L, a, "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = graft.queries.MultimodalOps.phashGroups(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(r => (r._2, r._3)).toSeq === Seq((2L, 1L)),
      s"exactly the planted dup group (rep=1, cnt=2): ${rows.toSeq}")
  }

  test("imageio codec: encode→decode roundtrips exact planted pixels per format") {
    // Every supported format must recover the EXACT analytic luma: gray
    // PNG returns the stored sample (not a CS_GRAY→sRGB remap), RGB
    // PNG/BMP recover each channel in order (the distinct per-channel
    // coefficients catch band swaps) and collapse through the integer
    // Rec.601 division.
    def refLuma(id: Long, w: Int, h: Int, gray: Boolean): Array[Int] =
      (0 until w * h).map { i =>
        val x = i % w
        val y = i / w
        if (gray) ImageCodec.plantedR(id, x, y)
        else (299 * ImageCodec.plantedR(id, x, y) +
          587 * ImageCodec.plantedG(id, x, y) +
          114 * ImageCodec.plantedB(id, x, y)) / 1000
      }.toArray
    for ((fmt, id, w, h) <- Seq(("png-gray", 3L, 9, 8), ("png-rgb", 4L, 16, 11),
        ("bmp-rgb", 5L, 8, 23))) {
      val bytes = ImageCodec.encodePlanted(id, w, h, fmt)
      val Some((gw, gh, luma)) = ImageCodec.lumaRaster(bytes)
      assert((gw, gh) === ((w, h)), fmt)
      assert(luma.map(_ & 0xff).toSeq === refLuma(id, w, h, fmt == "png-gray").toSeq,
        s"$fmt luma mismatch")
    }
  }

  test("gif codec: animated encode→decode enumerates every exact frame") {
    val (id, w, h, n) = (7L, 10, 9, 4)
    val bytes = ImageCodec.encodePlantedGif(id, w, h, n)
    val Some(frames) = ImageCodec.frameRasters(bytes)
    assert(frames.length === n, "every planted frame must come back")
    for ((f, idx) <- frames.zipWithIndex) {
      val (gw, gh, luma) = f
      assert((gw, gh) === ((w, h)))
      val ref = (0 until w * h).map { i =>
        ImageCodec.plantedFrameGray(id, idx, i % w, i / w)
      }
      assert(luma.map(_ & 0xff).toSeq === ref,
        s"frame $idx luma mismatch (palette remap or frame reorder)")
    }
    // frameRasters subsumes still images (one-element sequence)...
    val still = ImageCodec.encodePlanted(3L, 9, 8, "png-gray")
    assert(ImageCodec.frameRasters(still).map(_.length) === Some(1))
    // ...and quarantines garbage and mid-stream truncation.
    assert(ImageCodec.frameRasters(Array.tabulate(32)(_.toByte)).isEmpty)
    assert(ImageCodec.frameRasters(bytes.take(24)).forall(_.isEmpty))
  }

  test("imageio codec: non-image payloads decode to None, empty set dropped") {
    import spark.implicits._
    implicit val s = spark
    assert(ImageCodec.lumaRaster("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.lumaRaster(Array.empty[Byte]).isEmpty)
    // Truncated REAL encode: the PNG magic matches so ImageIO picks a
    // reader, then the body fails mid-stream — must quarantine (None),
    // not throw through the ingest task.
    assert(ImageCodec.lumaRaster(
      ImageCodec.encodePlanted(2L, 8, 8, "png-rgb").take(24)).isEmpty)
    val in = Seq(
      MediaRow(1L, ImageCodec.encodePlanted(1L, 8, 8, "png-rgb"), "png-rgb"),
      MediaRow(2L, Array[Byte](1, 2, 3), "garbage")).toDS()
    val out = ImageCodec.decodeFeatures(in, 60).collect()
    assert(out.map(_.media_id).toSeq === Seq(1L),
      "non-image payloads are dropped, image payloads decode")
    assert(out.head.n_px === 64L && out.head.width === 8L)
    assert(out.head.luma_sum === out.head.luma_sum.toLong &&
      out.head.phash === Multimodal.aHashGrid(
        ImageCodec.lumaRaster(ImageCodec.encodePlanted(1L, 8, 8, "png-rgb")).get._3, 60))
  }

  test("wav codec: encode→decode roundtrips exact planted samples") {
    // Long enough that 17·i wraps the full 16-bit range (i > 65536/17),
    // so the sign/endianness assertion below has teeth.
    val n = 5000
    val bytes = AudioCodec.encodePlanted(7L, n)
    val Some(got) = AudioCodec.samples(bytes)
    assert(got.length === n)
    assert(got.toSeq === (0 until n).map(AudioCodec.plantedSample(7L, _)),
      "16-bit LE signed samples must round-trip bit-exact")
    // The planted formula spans the signed range; a sign or endianness
    // misread cannot reproduce it.
    assert(got.min < -30000 && got.max > 30000)
  }

  test("wav codec: non-audio and unsupported shapes decode to None") {
    import spark.implicits._
    implicit val s = spark
    assert(AudioCodec.samples("definitely not riff".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.samples(Array.empty[Byte]).isEmpty)
    // Truncated WAV (RIFF magic, cut header) must quarantine, not throw.
    assert(AudioCodec.samples(AudioCodec.encodePlanted(2L, 100).take(24)).isEmpty)
    // A stereo clip is a real WAV but not the supported shape — it must
    // route to quarantine (None), not silently misparse as mono.
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val raw = new Array[Byte](400)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 100L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(AudioCodec.samples(out.toByteArray).isEmpty)
    val ds = Seq(
      Multimodal.MediaRow(1L, AudioCodec.encodePlanted(1L, 250), "audio/wav"),
      Multimodal.MediaRow(2L, Array[Byte](9, 9), "garbage")).toDS()
    val feats = AudioCodec.decodeFeatures(ds).collect()
    assert(feats.map(_.media_id).toSeq === Seq(1L))
    assert(feats.head.n_samples === 250L)
  }

  test("segmented wav: decode round-trips the formula; frame energies classify exactly") {
    import spark.implicits._
    implicit val s = spark
    val id = 4L
    val n = 400 // 8 full SegWindow frames
    val bytes = AudioCodec.encodePlantedSegments(id, n)
    val Some(got) = AudioCodec.samples(bytes)
    assert(got.toSeq === (0 until n).map(AudioCodec.plantedSegSample(id, _)),
      "decoded segmented samples must equal the planted formula")
    val ds = Seq(Multimodal.MediaRow(id, bytes, "audio/wav")).toDS()
    val wins = AudioCodec.windowEnergies(ds).collect().sortBy(_.w)
    assert(wins.length === n / AudioCodec.SegWindow)
    wins.foreach { we =>
      val expect = (0 until AudioCodec.SegWindow).map { j =>
        math.abs(AudioCodec.plantedSegSample(id,
          we.w.toInt * AudioCodec.SegWindow + j).toLong)
      }.sum
      assert(we.abs_sum === expect, s"frame ${we.w} energy")
      // Quiet frames ((w + id) % 3 == 0) sit far below the VAD cut,
      // loud frames far above — the classification has no edge cases.
      if ((we.w + id) % 3 == 0)
        assert(we.abs_sum <= 100L * AudioCodec.SegWindow &&
          we.abs_sum < graft.queries.MultimodalOps.VadThreshold / 10)
      else
        assert(we.abs_sum >= 8000L * AudioCodec.SegWindow &&
          we.abs_sum > graft.queries.MultimodalOps.VadThreshold * 8)
    }
  }

  test("stub decoder is deterministic and respects frame boundaries") {
    // distinct content per frame (0..511 would wrap mod 256 and make the
    // two frames byte-identical histograms)
    val payload = (Array.fill[Byte](256)(10) ++ Array.fill[Byte](128)(20)
      ++ (0 until 128).map(_.toByte).toArray)
    val f0 = FakeDecoder.decodeFrame(payload, 0, 256)
    val f1 = FakeDecoder.decodeFrame(payload, 256, 256)
    assert(f0.length === FakeDecoder.featureDim)
    assert(f0.toSeq !== f1.toSeq) // different slices → different features
    assert(f0.toSeq === FakeDecoder.decodeFrame(payload, 0, 256).toSeq)
    // last frame may be short: must not read past the payload
    val short = FakeDecoder.decodeFrame(payload, 384, 256)
    assert(short(3) === 127.0) // max byte of the 128-byte tail slice only
  }
}
