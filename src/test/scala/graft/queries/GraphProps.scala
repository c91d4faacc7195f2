package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[GraphOps.pagerankOf]]: on random
  * constant-out-degree graphs (self-loops and parallel edges included),
  * the distributed iteration must equal a sequential fold of the same
  * integer recurrence — rank conservation and truncation behavior have
  * no room to drift.
  */
object GraphProps extends Properties("GraphOps.pagerankOf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val genGraph: Gen[(Int, List[Int])] = for {
    n <- Gen.chooseNum(2, 30)
    targets <- Gen.listOfN(n * GraphOps.OutDeg, Gen.chooseNum(0, n - 1))
  } yield (n, targets)

  property("equals the sequential integer recurrence") =
    Prop.forAllNoShrink(genGraph) { case (n, targets) =>
      import spark.implicits._
      val edges = targets.zipWithIndex.map { case (dst, i) =>
        ((i / GraphOps.OutDeg).toLong, dst.toLong)
      }
      val nodesDf = (0 until n).map(_.toLong).toDF("id")
      val edgesDf = edges.toDF("src", "dst")
      val got = GraphOps.pagerankOf(nodesDf, edgesDf)
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq

      val base = GraphOps.Scale * (100 - GraphOps.Damp) / 100
      var ranks = Array.fill(n)(GraphOps.Scale)
      for (_ <- 1 to GraphOps.Iters) {
        val in = Array.fill(n)(0L)
        edges.foreach { case (s, d) =>
          in(d.toInt) += ranks(s.toInt) / GraphOps.OutDeg
        }
        ranks = Array.tabulate(n)(i => base + in(i) * GraphOps.Damp / 100)
      }
      got == ranks.toSeq
    }

  // The production convergence loop, pinned to the unrolled form at the
  // same round count: tol = -1 can never be met (the abs-delta probe is
  // ≥ 0), so pagerankLoop runs exactly Iters rounds through BOTH
  // checkpoint cadences — the every-round probe and a mid-loop
  // checkpoint — and must reproduce pagerankOf's ranks bit-for-bit.
  property("convergence loop equals the unrolled form at Iters rounds") =
    Prop.forAllNoShrink(genGraph) { case (n, targets) =>
      import spark.implicits._
      val edges = targets.zipWithIndex.map { case (dst, i) =>
        ((i / GraphOps.OutDeg).toLong, dst.toLong)
      }
      val nodesDf = (0 until n).map(_.toLong).toDF("id")
      val edgesDf = edges.toDF("src", "dst")
      val want = GraphOps.pagerankOf(nodesDf, edgesDf)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      Seq(1, 2).forall { k =>
        GraphOps.pagerankLoop(nodesDf, edgesDf,
            maxIters = GraphOps.Iters, tol = -1L, checkpointEvery = k)
          .as[(Long, Long)].collect().sortBy(_._1).toSeq == want
      }
    }
}
