package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Executable specification of [[Multimodal.aHashGrid]] on arbitrary
  * payloads: every bit must independently equal the cross-multiplied
  * block-vs-payload mean compare over PROPORTIONAL block boundaries
  * (byte i in block ⌊i·bits/n⌋), recomputed here with BigInt (no
  * overflow question); all `bits` blocks must be populated whenever
  * `n ≥ bits` (the guarantee the LSH banding rests on); no bit at or
  * above `bits` may ever be set; and the signature is a pure function
  * of the bytes.
  */
object AHashProps extends Properties("Multimodal.aHashGrid") {

  private val genPayload: Gen[Array[Byte]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  private val genBits: Gen[Int] = Gen.chooseNum(1, 60)

  private def reference(p: Array[Byte], bits: Int): Long = {
    if (p.isEmpty) return 0L
    val vals = p.map(b => BigInt(b & 0xff))
    val total = vals.sum
    val n = BigInt(p.length)
    val byBlock = vals.indices.groupBy(i => (i.toLong * bits / p.length).toInt)
    byBlock.foldLeft(0L) { case (sig, (b, idxs)) =>
      val s = idxs.map(vals).sum
      if (s * n > total * idxs.length) sig | (1L << b) else sig
    }
  }

  property("equals the BigInt reference bit for bit") =
    Prop.forAll(genPayload, genBits) { (p, bits) =>
      Multimodal.aHashGrid(p, bits) == reference(p, bits)
    }

  property("all blocks populate when n >= bits (none are structurally empty)") =
    Prop.forAll(Gen.chooseNum(60, 2000), genBits) { (n, bits) =>
      // Pure boundary arithmetic: the block-index image over 0..n-1
      // must be exactly 0..bits-1 whenever n >= bits.
      n < bits ||
        (0 until n).map(i => (i.toLong * bits / n).toInt).toSet ==
          (0 until bits).toSet
    }

  property("no bit at or above bits; signature stays non-negative") =
    Prop.forAll(genPayload, genBits) { (p, bits) =>
      val sig = Multimodal.aHashGrid(p, bits)
      sig >= 0L && (bits == 60 || (sig >>> bits) == 0L)
    }

  property("deterministic under cloning") =
    Prop.forAll(genPayload, genBits) { (p, bits) =>
      Multimodal.aHashGrid(p, bits) == Multimodal.aHashGrid(p.clone(), bits)
    }
}
