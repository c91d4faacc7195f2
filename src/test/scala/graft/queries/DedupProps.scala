package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[DedupOps.connectedGroups]]: on random
  * graphs, the distributed min-label propagation must agree with a
  * sequential union-find — same components, same (minimum) label per
  * vertex. This pins both termination (fixpoint within the iteration
  * cap on every generated graph) and the uniqueness argument the exact
  * recursive-CTE oracle relies on.
  */
object DedupProps extends Properties("DedupOps.connectedGroups") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genEdges: Gen[List[(Long, Long)]] =
    Gen.listOfN(25, for {
      a <- Gen.chooseNum(0L, 30L)
      d <- Gen.chooseNum(1L, 5L)
    } yield (a, a + d))

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // find() roots at the minimum because unions always parent the
    // larger root under the smaller one.
    vs.map(v => v -> find(v)).toMap
  }

  property("agrees with sequential union-find on random graphs") =
    Prop.forAllNoShrink(genEdges) { edges =>
      import spark.implicits._
      edges.isEmpty || {
        val got = DedupOps.connectedGroups(edges.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        got == unionFind(edges)
      }
    }
}
