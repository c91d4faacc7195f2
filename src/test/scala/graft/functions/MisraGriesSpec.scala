package graft.functions

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Properties}

/** Executable form of the Misra-Gries guarantee: under ANY partitioning
  * of the input into reduce/merge chunks, (1) every item with true count
  * > N/(k+1) survives to the summary, and (2) summary counts never
  * overestimate. These two facts are what let the exact verify pass in
  * `text_heavyhitters` report provably-complete heavy hitters.
  */
object MisraGriesProps extends Properties("MisraGries") {

  private val K = 4
  private val agg = new MisraGries(K)

  // Skewed alphabet so heavy hitters actually occur at tiny sizes.
  private val wordGen: Gen[String] =
    Gen.frequency(8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
      1 -> Gen.oneOf("c1", "c2", "c3", "c4", "c5", "c6"))

  private val inputGen: Gen[(List[String], List[Int])] = for {
    ws <- Gen.listOf(wordGen)
    cuts <- Gen.listOf(Gen.chooseNum(0, math.max(ws.size, 1)))
  } yield (ws, cuts)

  private def summarize(ws: Seq[String], cuts: Seq[Int]): MGBuf = {
    val boundaries = (cuts.map(c => if (ws.isEmpty) 0 else c % (ws.size + 1))
      :+ 0 :+ ws.size).distinct.sorted
    val chunks = boundaries.zip(boundaries.tail).map { case (a, b) => ws.slice(a, b) }
    agg.finish(chunks
      .map(_.foldLeft(agg.zero)((b, w) => agg.reduce(b, Row(w))))
      .foldLeft(agg.zero)(agg.merge))
  }

  property("every > N/(k+1) item survives any reduce/merge split") =
    Prop.forAll(inputGen) { case (ws, cuts) =>
      val summary = summarize(ws, cuts)
      val truth = ws.groupBy(identity).view.mapValues(_.size.toLong)
      val threshold = ws.size.toDouble / (K + 1)
      truth.filter(_._2 > threshold).keys.forall(summary.words.contains)
    }

  property("summary counts never exceed true counts") =
    Prop.forAll(inputGen) { case (ws, cuts) =>
      val summary = summarize(ws, cuts)
      val truth = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      summary.words.zip(summary.counts).forall { case (w, c) =>
        c <= truth.getOrElse(w, 0L)
      }
    }

  property("summary never holds more than k entries") =
    Prop.forAll(inputGen) { case (ws, cuts) =>
      summarize(ws, cuts).words.length <= K
    }
}
