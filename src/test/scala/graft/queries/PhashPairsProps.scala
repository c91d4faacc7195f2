package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark
import graft.operators.Multimodal

/** Executable specification of [[MultimodalOps.phashNearPairsOf]]: on
  * random payload sets (exact duplicates and single-byte mutations
  * planted so collisions actually occur), the banded plan must emit
  * exactly the pairs a brute-force enumeration admits — Hamming ≤ the
  * cut AND sharing at least one 15-bit chunk (the banded-LSH recall
  * contract: band-sharing is what makes the pair discoverable without
  * all-pairs).
  */
object PhashPairsProps extends Properties("MultimodalOps.phashNearPairsOf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val genPayloads: Gen[List[Array[Byte]]] = for {
    n <- Gen.chooseNum(2, 10)
    bases <- Gen.listOfN(n, Gen.listOfN(200, Gen.chooseNum(0, 255)))
    // For each payload, either keep it, duplicate an earlier one, or
    // mutate an earlier one in a single position — near pairs by
    // construction.
    picks <- Gen.listOfN(n, Gen.chooseNum(0, 2))
  } yield bases.map(_.map(_.toByte).toArray).zip(picks).zipWithIndex.map {
    case ((p, 0), _) => p
    case ((p, 1), i) if i > 0 => bases(i - 1).map(_.toByte).toArray
    case ((p, _), i) if i > 0 =>
      val m = bases(i - 1).map(_.toByte).toArray
      m(17) = (m(17) ^ 0xff).toByte
      m
    case ((p, _), _) => p
  }

  private def chunks(h: Long): Seq[Long] =
    (0 until MultimodalOps.PhashBands).map { b =>
      (h >> (b * MultimodalOps.PhashChunkBits)) &
        ((1L << MultimodalOps.PhashChunkBits) - 1)
    }

  property("banded pairs equal brute force over chunk-sharing signatures") =
    Prop.forAllNoShrink(genPayloads) { payloads =>
      import spark.implicits._
      val sigs = payloads.zipWithIndex.map { case (p, i) =>
        (i.toLong, Multimodal.aHash(p, MultimodalOps.PhashBlock, MultimodalOps.PhashBits))
      }
      val want = (for {
        (a, ha) <- sigs; (b, hb) <- sigs if a < b
        ham = java.lang.Long.bitCount(ha ^ hb)
        if ham <= MultimodalOps.PhashMaxHamming
        if chunks(ha).zip(chunks(hb)).exists { case (x, y) => x == y }
      } yield (a, b, ham.toLong)).toSet
      val got = MultimodalOps.phashNearPairsOf(sigs.toDF("media_id", "phash"))
        .as[(Long, Long, Long)].collect().toSet
      got == want
    }
}
