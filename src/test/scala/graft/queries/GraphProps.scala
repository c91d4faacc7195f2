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

  // Synchronous LPA against a sequential fold of the same recurrence:
  // undirected-deduped neighbor multiset, most-frequent label with ties
  // to the smallest, isolated nodes keeping their own — community
  // sizes, representatives and the global count must agree exactly
  // (on the same size-desc/label-asc head the production query emits).
  property("lpaOf equals the sequential synchronous propagation") =
    Prop.forAllNoShrink(genGraph) { case (n, targets) =>
      import spark.implicits._
      val rounds = 3
      val edges = targets.zipWithIndex.map { case (dst, i) =>
        ((i / GraphOps.OutDeg).toLong, dst.toLong)
      }
      val nodesDf = (0 until n).map(_.toLong).toDF("id")
      val edgesDf = edges.toDF("src", "dst")
      val got = GraphOps.lpaOf(nodesDf, edgesDf, rounds)
        .as[(Long, Long, Long, Long)].collect().toSeq

      val und = edges.flatMap { case (s, d) => Seq((s, d), (d, s)) }
        .filter(p => p._1 != p._2).toSet
      var lbl = Array.tabulate(n)(_.toLong)
      for (_ <- 1 to rounds) {
        val next = Array.tabulate(n) { i =>
          // toSeq BEFORE collect: neighbors are a set, but their labels
          // are a MULTISET (two neighbors sharing a label count twice).
          val nbr = und.toSeq.collect { case (s, d) if s == i.toLong => lbl(d.toInt) }
          if (nbr.isEmpty) lbl(i)
          else {
            val counts = nbr.groupBy(identity).map { case (l, g) => (l, g.size) }
            val mc = counts.values.max
            counts.collect { case (l, c) if c == mc => l }.min
          }
        }
        lbl = next
      }
      val comms = lbl.zipWithIndex.groupBy(_._1).map { case (l, g) =>
        (l, g.length.toLong, g.map(_._2.toLong).min)
      }.toSeq
      val want = comms.sortBy { case (l, sz, _) => (-sz, l) }
        .take(GraphOps.TopK)
        .map { case (l, sz, mn) => (comms.size.toLong, l, sz, mn) }
      got == want
    }
}
