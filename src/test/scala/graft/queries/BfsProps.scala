package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[GraphOps.bfsOf]]: on random directed
  * edge lists (self-loops and duplicates included), the frontier loop's
  * (id, dist) set must equal a brute-force level-by-level expansion —
  * pinning both minimality of dist and completeness of the reach set.
  */
object BfsProps extends Properties("GraphOps.bfsOf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val genCase: Gen[(List[(Long, Long)], Long, Int)] = for {
    n <- Gen.chooseNum(1, 10)
    m <- Gen.chooseNum(0, 30)
    es <- Gen.listOfN(m,
      Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
    seed <- Gen.chooseNum(0L, n - 1L)
    hops <- Gen.chooseNum(0, 4)
  } yield (es, seed, hops)

  /** Brute-force BFS: expand one level at a time from the seed. */
  private def brute(es: List[(Long, Long)], seed: Long, hops: Int): Map[Long, Long] = {
    val adj = es.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = Map(seed -> 0L)
    var frontier = Set(seed)
    for (h <- 1 to hops) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  property("equals brute-force level expansion") =
    Prop.forAllNoShrink(genCase) { case (es, seed, hops) =>
      import spark.implicits._
      val want = brute(es, seed, hops)
      val got = GraphOps
        .bfsOf((es :+ (7L, 7L)).toDF("src", "dst"), seed, hops)
        .as[(Long, Long)].collect().toMap
      got == want
    }

  // The declarative twin: Spark's WITH RECURSIVE path-enumeration +
  // min(dist) must land on the same (id, dist) set the frontier loop
  // computes — minimality via group-by instead of anti-join.
  property("recursive CTE equals the frontier loop") =
    Prop.forAllNoShrink(genCase) { case (es, seed, hops) =>
      import spark.implicits._
      val want = brute(es, seed, hops)
      val got = GraphOps
        .bfsRecursiveOf((es :+ (7L, 7L)).toDF("src", "dst"), seed, hops)
        .as[(Long, Long)].collect().toMap
      got == want
    }
}
