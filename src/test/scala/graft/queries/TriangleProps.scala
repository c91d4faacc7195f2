package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[GraphOps.trianglesOf]]: on random edge
  * lists (self-loops, duplicates, and reversed pairs included), the
  * oriented-wedge count must equal a brute-force enumeration over the
  * canonicalized undirected edge set.
  */
object TriangleProps extends Properties("GraphOps.trianglesOf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 12)
    m <- Gen.chooseNum(0, 40)
    es <- Gen.listOfN(m,
      Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
  } yield es

  /** Brute-force triangle count over a canonical undirected edge set. */
  private def brute(und: Set[(Long, Long)]): Long = {
    val verts = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    (for {
      i <- verts.indices; j <- (i + 1) until verts.size; k <- (j + 1) until verts.size
      a = verts(i); b = verts(j); c = verts(k)
      if und((a, b)) && und((b, c)) && und((a, c))
    } yield 1).size.toLong
  }

  private def canon(es: List[(Long, Long)]): Set[(Long, Long)] =
    es.filter { case (s, d) => s != d }
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }.toSet

  property("equals brute-force enumeration over the canonical edge set") =
    Prop.forAllNoShrink(genEdges) { es =>
      import spark.implicits._
      val want = brute(canon(es))
      val got = GraphOps
        .trianglesOf((es :+ (0L, 0L)).toDF("src", "dst"))
        .as[Long].collect().head
      got == want
    }

  // The TriangleMaxDeg hub stoplist, exercised where it BITES: a small
  // cap must count exactly the triangles of the sub-cap edge set
  // (degrees measured in the full graph, before the cut) — pinning that
  // degree orientation and the stoplist compose without over- or
  // under-counting around the dropped hub edges.
  property("hub cap equals brute force over the capped edge set") =
    Prop.forAllNoShrink(genEdges, Gen.chooseNum(1, 5)) { (es, cap) =>
      import spark.implicits._
      val und = canon(es)
      val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, vs) => v -> vs.size }
      val kept = und.filter { case (a, b) => deg(a) <= cap && deg(b) <= cap }
      val got = GraphOps
        .trianglesOf(es.toDF("src", "dst"), maxDeg = cap)
        .as[Long].collect().head
      got == brute(kept)
    }
}
