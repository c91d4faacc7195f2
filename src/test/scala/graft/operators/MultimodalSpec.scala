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
