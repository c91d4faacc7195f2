package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Sequential md5-prefix hash — the plain-Scala twin of portable64
    * (same shape SampleProps uses).
    */
  private def portableSeq(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("pagerank equals a sequential reimplementation of the recurrence") {
    val n = Tables.documents(spark, dir).count().toInt
    val edges = for {
      src <- 0 until n
      j <- 0 until GraphOps.OutDeg
    } yield (src.toLong, portableSeq(s"pr:$src:$j") % n)
    val base = GraphOps.Scale * (100 - GraphOps.Damp) / 100
    var ranks = Array.fill(n)(GraphOps.Scale)
    for (_ <- 1 to GraphOps.Iters) {
      val in = Array.fill(n)(0L)
      edges.foreach { case (s, d) =>
        in(d.toInt) += ranks(s.toInt) / GraphOps.OutDeg
      }
      ranks = Array.tabulate(n)(i => base + in(i) * GraphOps.Damp / 100)
    }
    val want = ranks.zipWithIndex
      .map { case (r, i) => (i.toLong, r) }
      .sortBy { case (i, r) => (-r, i) }
      .take(GraphOps.TopK).toSeq
    val got = GraphOps.pagerank(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("triangle count equals a sequential enumeration") {
    val n = Tables.documents(spark, dir).count().toInt
    val und = (for {
      src <- 0 until n
      j <- 0 until GraphOps.OutDeg
      dst = (portableSeq(s"pr:$src:$j") % n).toInt
      if dst != src
    } yield (math.min(src, dst), math.max(src, dst))).toSet
    val byA = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = und.toSeq.map { case (a, b) =>
      byA.getOrElse(b, Set.empty).count(c => und.contains((a, c)))
    }.sum
    val got = GraphOps.triangles(spark, dir).as[Long].collect().head
    assert(got === want.toLong)
  }

  test("pagerank ranks are bounded below by the teleport base") {
    val base = GraphOps.Scale * (100 - GraphOps.Damp) / 100
    val rows = GraphOps.pagerank(spark, dir).as[(Long, Long)].collect()
    assert(rows.length === GraphOps.TopK)
    rows.foreach { case (_, r) => assert(r >= base) }
    // Top-k is rank-descending with id tie-break.
    assert(rows.map(r => (-r._2, r._1)).toSeq === rows.map(r => (-r._2, r._1)).sorted.toSeq)
  }

  test("bfs takes the shorter of two paths and stops at the hop bound") {
    import spark.implicits._
    // Diamond with a long tail: 0→1→3, 0→2→3 (dist 3 = 2, not 3),
    // then 3→4→5→6 — node 6 is 5 hops out, beyond a 4-hop frontier.
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = GraphOps.bfsOf(e, seed = 0L, hops = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("k-core peels the pendant path and keeps the clique, cascading") {
    // 4-clique {1,2,3,4} with a pendant path 4-5-6: at k = 2 the peel
    // must CASCADE (6 falls first, then 5 — two rounds), and the
    // surviving core is the clique plus nothing, every member at
    // in-core degree 3. Edge 7→99 targets a non-node and must drop.
    val nodes = (1L to 7L).toDF("id")
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (7L, 99L)).toDF("src", "dst")
    val out = GraphOps.kcoreOf(nodes, e, k = 2, maxRounds = 6)
      .select("core_size", "id", "core_deg")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((4L, 1L, 3L), (4L, 2L, 3L), (4L, 3L, 3L), (4L, 4L, 3L)))
    // A k above the clique's degree empties the core entirely.
    assert(GraphOps.kcoreOf(nodes, e, k = 4, maxRounds = 6).count() === 0L)
  }

  test("label propagation separates disjoint triangles and keeps isolated labels") {
    // Two disjoint triangles and an isolated node. In {0,1,2}: round 1
    // gives (0→1, 1→0, 2→0) — each node takes its neighbors' min on
    // the 1-vs-1 tie — and round 2 settles everyone on 0 (node 1's
    // {1, 0} tie breaks to 0). {10,11,12} settles on 10 identically.
    // Node 99 has no edges and must keep its own label through every
    // round.
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L, 99L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val got = GraphOps.lpaOf(nodes, e, rounds = 4)
      .select("n_communities", "label", "n_members", "min_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((3L, 0L, 3L, 0L), (3L, 10L, 3L, 10L),
      (3L, 99L, 1L, 99L)))
  }

  test("common neighbors predicts unconnected pairs and respects the hub cap") {
    import spark.implicits._
    // Star 0-{1,2,3} plus edge 1-2: unconnected pairs sharing a
    // neighbor are (1,3) and (2,3) via 0; (1,2) is connected and must
    // not appear; (0, x) pairs are all connected.
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("src", "dst")
    val got = GraphOps.commonNeighborsOf(e, maxDeg = 1024, k = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 1L), (2L, 3L, 1L)))
    // Hub stoplist: capping degree at 2 drops node 0 (degree 3), so the
    // only surviving wedge center is 1/2 (degree 2 each) — but their
    // edges all connect existing pairs, leaving no predictions.
    val capped = GraphOps.commonNeighborsOf(e, maxDeg = 2, k = 10)
      .as[(Long, Long, Long)].collect()
    assert(capped.isEmpty, "hub-capped graph yields no wedges through the hub")
  }
}
