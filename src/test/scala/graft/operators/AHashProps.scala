package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Executable specification of [[Multimodal.aHash]] on arbitrary
  * payloads: every bit must independently equal the cross-multiplied
  * block-vs-payload mean compare, recomputed here with BigInt (no
  * overflow question), the cap must hold exactly, and the signature is
  * a pure function of the bytes.
  */
object AHashProps extends Properties("Multimodal.aHash") {

  private val genPayload: Gen[Array[Byte]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  private val genBlock: Gen[Int] = Gen.chooseNum(1, 32)
  private val genBits: Gen[Int] = Gen.chooseNum(1, 60)

  private def reference(p: Array[Byte], block: Int, maxBits: Int): Long = {
    if (p.isEmpty) return 0L
    val vals = p.map(b => BigInt(b & 0xff))
    val total = vals.sum
    val n = BigInt(p.length)
    val nBlocks = math.min(maxBits, (p.length + block - 1) / block)
    (0 until nBlocks).foldLeft(0L) { (sig, b) =>
      val slice = vals.slice(b * block, math.min((b + 1) * block, p.length))
      if (slice.sum * n > total * slice.length) sig | (1L << b) else sig
    }
  }

  property("equals the BigInt reference bit for bit") =
    Prop.forAll(genPayload, genBlock, genBits) { (p, block, bits) =>
      Multimodal.aHash(p, block, bits) == reference(p, block, bits)
    }

  property("cap: no bit at or above maxBits, signature stays non-negative") =
    Prop.forAll(genPayload, genBlock, genBits) { (p, block, bits) =>
      val sig = Multimodal.aHash(p, block, bits)
      sig >= 0L && (bits == 60 || (sig >>> bits) == 0L)
    }

  property("deterministic under cloning") =
    Prop.forAll(genPayload, genBlock, genBits) { (p, block, bits) =>
      Multimodal.aHash(p, block, bits) == Multimodal.aHash(p.clone(), block, bits)
    }
}
