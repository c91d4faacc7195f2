package graft.functions

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Properties}

/** Pins the bounded top-k buffer against the obvious sequential
  * reference (sort everything, take k) under arbitrary reduce/merge
  * splits — the associativity Spark's partial aggregation relies on.
  */
object TopKProps extends Properties("TopKAgg") {

  private val agg = new TopKAgg(3)

  private def toPairs(b: TopKBuf): Seq[(Double, Long)] =
    b.scores.zip(b.keys).toSeq

  private def reference(rows: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.sortBy { case (s, key) => (-s, key) }.take(k)

  private def part(xs: Seq[(Double, Long)]): TopKBuf =
    xs.foldLeft(agg.zero) { case (b, (s, key)) => agg.reduce(b, Row(s, key)) }

  private val rowsGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 20L)))

  property("sequential reduce matches sort-and-take") =
    Prop.forAll(rowsGen) { rows =>
      toPairs(part(rows)) == reference(rows, 3)
    }

  property("merge of arbitrarily split partials matches the global answer") =
    Prop.forAll(rowsGen, Gen.chooseNum(0, 100)) { (rows, cut) =>
      val (l, r) = rows.splitAt(cut % (rows.size + 1))
      toPairs(agg.merge(part(l), part(r))) == reference(rows, 3)
    }

  property("null inputs are ignored, not ranked") = Prop {
    val b = agg.reduce(agg.reduce(agg.zero, Row(null, 5L)), Row(1.5, 7L))
    toPairs(b) == Seq((1.5, 7L))
  }
}
