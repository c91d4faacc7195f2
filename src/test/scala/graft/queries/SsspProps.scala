package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[GraphOps.ssspOf]]: on random weighted
  * directed graphs (self-loops, duplicate and parallel edges with
  * different weights included), R relaxation rounds must equal the
  * brute-force minimum path cost over walks of ≤ R edges — pinning
  * both the later-round cost IMPROVEMENT case (a longer but cheaper
  * path must overwrite an earlier tentative cost) and the bounded-round
  * contract.
  */
object SsspProps extends Properties("GraphOps.ssspOf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val genCase: Gen[(List[(Long, Long, Long)], Long, Int)] = for {
    n <- Gen.chooseNum(1, 8)
    m <- Gen.chooseNum(0, 24)
    es <- Gen.listOfN(m, for {
      s <- Gen.chooseNum(0L, n - 1L)
      d <- Gen.chooseNum(0L, n - 1L)
      w <- Gen.chooseNum(1L, 9L)
    } yield (s, d, w))
    seed <- Gen.chooseNum(0L, n - 1L)
    rounds <- Gen.chooseNum(0, 4)
  } yield (es, seed, rounds)

  /** Brute-force bounded Bellman-Ford over a cost map. */
  private def brute(es: List[(Long, Long, Long)], seed: Long,
      rounds: Int): Map[Long, Long] = {
    var dist = Map(seed -> 0L)
    for (_ <- 1 to rounds) {
      val relaxed = es.flatMap { case (s, d, w) =>
        dist.get(s).map(c => d -> (c + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .view.mapValues(_.map(_._2).min).toMap
    }
    dist
  }

  property("equals brute-force bounded relaxation") =
    Prop.forAllNoShrink(genCase) { case (es, seed, rounds) =>
      import spark.implicits._
      val want = brute(es, seed, rounds)
      val got = GraphOps
        .ssspOf((es :+ ((7L, 7L, 3L))).toDF("src", "dst", "w"), seed, rounds)
        .as[(Long, Long)].collect().toMap
      got == want
    }
}
