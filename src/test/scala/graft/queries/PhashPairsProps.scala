package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark
import graft.operators.Multimodal

/** Executable specification of [[MultimodalOps.phashNearPairsOf]]: on
  * random payload sets (exact duplicates and single-byte mutations
  * planted so collisions actually occur, lengths spanning SHORTER than
  * one signature's bit count through several hundred bytes), the banded
  * plan must emit exactly the pairs a brute-force enumeration admits —
  * Hamming ≤ the cut AND sharing at least one 15-bit chunk whose bucket
  * holds 2..[[MultimodalOps.PhashMaxBucket]] members (the banded-LSH
  * recall contract plus the bucket cap). Short payloads are planted
  * deliberately: the round-7 fixed-width signature left high bits
  * structurally zero below 960 bytes, which a length-varied corpus
  * exposes via the band-signal property below.
  */
object PhashPairsProps extends Properties("MultimodalOps.phashNearPairsOf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val genPayloads: Gen[List[Array[Byte]]] = for {
    n <- Gen.chooseNum(2, 10)
    lens <- Gen.listOfN(n, Gen.chooseNum(1, 300))
    bases <- Gen.sequence[List[List[Int]], List[Int]](
      lens.map(l => Gen.listOfN(l, Gen.chooseNum(0, 255))))
    // For each payload, either keep it, duplicate an earlier one, or
    // mutate an earlier one in a single position — near pairs by
    // construction, at mixed (including sub-60-byte) lengths.
    picks <- Gen.listOfN(n, Gen.chooseNum(0, 2))
  } yield bases.map(_.map(_.toByte).toArray).zip(picks).zipWithIndex.map {
    case ((p, 0), _) => p
    case ((p, 1), i) if i > 0 => bases(i - 1).map(_.toByte).toArray
    case ((p, _), i) if i > 0 =>
      val m = bases(i - 1).map(_.toByte).toArray
      val at = m.length / 2
      m(at) = (m(at) ^ 0xff).toByte
      m
    case ((p, _), _) => p
  }

  private def chunks(h: Long): Seq[Long] =
    (0 until MultimodalOps.PhashBands).map { b =>
      (h >> (b * MultimodalOps.PhashChunkBits)) &
        ((1L << MultimodalOps.PhashChunkBits) - 1)
    }

  /** Brute-force twin of the banded plan, INCLUDING the bucket cap: a
    * pair is admitted iff within the Hamming cut and some shared (band,
    * chunk) bucket holds between 2 and `cap` members corpus-wide.
    */
  private def bruteForce(sigs: Seq[(Long, Long)], cap: Int): Set[(Long, Long, Long)] = {
    val bucketSize: Map[(Int, Long), Int] = sigs
      .flatMap { case (_, h) => chunks(h).zipWithIndex.map { case (c, b) => (b, c) } }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      ham = java.lang.Long.bitCount(ha ^ hb)
      if ham <= MultimodalOps.PhashMaxHamming
      if chunks(ha).zip(chunks(hb)).zipWithIndex.exists { case ((x, y), band) =>
        x == y && bucketSize((band, x)) >= 2 && bucketSize((band, x)) <= cap
      }
    } yield (a, b, ham.toLong)).toSet
  }

  private def sigsOf(payloads: List[Array[Byte]]): List[(Long, Long)] =
    payloads.zipWithIndex.map { case (p, i) =>
      (i.toLong, Multimodal.aHashGrid(p, MultimodalOps.PhashBits))
    }

  property("banded pairs equal brute force over capped chunk-sharing buckets") =
    Prop.forAllNoShrink(genPayloads) { payloads =>
      import spark.implicits._
      val sigs = sigsOf(payloads)
      val want = bruteForce(sigs, MultimodalOps.PhashMaxBucket)
      val got = MultimodalOps.phashNearPairsOf(sigs.toDF("media_id", "phash"))
        .as[(Long, Long, Long)].collect().toSet
      got == want
    }

  /** The bucket cap actually drops over-cap buckets: a corpus of
    * identical signatures larger than the (test-shrunk) cap emits NO
    * pairs through the plan, and exactly matches the capped brute
    * force; at the default cap the same corpus emits all pairs.
    */
  property("bucket cap drops oversized buckets") =
    Prop.forAllNoShrink(Gen.chooseNum(4, 9)) { n =>
      import spark.implicits._
      val p = Array.tabulate(120)(i => (i * 7).toByte)
      val sigs = sigsOf(List.fill(n)(p))
      val capped = MultimodalOps.phashNearPairsOf(
        sigs.toDF("media_id", "phash"), maxBucket = 3)
        .as[(Long, Long, Long)].collect().toSet
      val uncapped = MultimodalOps.phashNearPairsOf(sigs.toDF("media_id", "phash"))
        .as[(Long, Long, Long)].collect().toSet
      capped == bruteForce(sigs, 3) &&
        capped.isEmpty && uncapped.size == n * (n - 1) / 2
    }

  /** Every band carries signal at every payload length: across a corpus
    * of random payloads of assorted lengths (including well under the
    * old 16-byte-block signature's 960-byte full-coverage threshold),
    * EACH of the 4 bands must see more than one distinct chunk value.
    * The round-7 fixed-width signature fails this immediately — bands 2
    * and 3 were structurally zero for every payload under 480 bytes, so
    * this is the property that would have caught the degeneracy.
    */
  property("every band distinguishes random payloads of any length") =
    Prop.forAllNoShrink(
      Gen.listOfN(12,
        Gen.chooseNum(24, 400).flatMap(l => Gen.listOfN(l, Gen.chooseNum(0, 255))))) {
      rows =>
        val hs = rows.map(r => Multimodal.aHashGrid(r.map(_.toByte).toArray,
          MultimodalOps.PhashBits))
        (0 until MultimodalOps.PhashBands).forall { b =>
          hs.map(h => chunks(h)(b)).distinct.size > 1
        }
    }

  /** Stricter still — and the case a uniform `ceil(n/bits)` block width
    * fails: for lengths 60..90 that width is 2 and only ⌈n/2⌉ ≤ 45 bits
    * populate, leaving band 3 (bits 45–59) structurally zero. The
    * proportional grid populates ALL 60 bits for every n ≥ 60, so each
    * band must distinguish a short-payload-only corpus too.
    */
  property("all 60 bits populate for payloads of 60..90 bytes") =
    Prop.forAllNoShrink(
      Gen.listOfN(12,
        Gen.chooseNum(60, 90).flatMap(l => Gen.listOfN(l, Gen.chooseNum(0, 255))))) {
      rows =>
        val hs = rows.map(r => Multimodal.aHashGrid(r.map(_.toByte).toArray,
          MultimodalOps.PhashBits))
        (0 until MultimodalOps.PhashBands).forall { b =>
          hs.map(h => chunks(h)(b)).distinct.size > 1
        }
    }
}
