package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over a deterministic document link graph
  * (SURVEY.md §2.4 adjunct — the web-graph half of a crawl pipeline:
  * rank pages before sampling/dedup keep decisions).
  *
  * The corpus tables carry no link column, so the graph is PLANTED
  * deterministically: every document emits [[OutDeg]] edges whose
  * targets are salted portable hashes of the source id folded onto the
  * contiguous doc_id domain — identically in the oracle SQL, so the
  * whole iterative computation gets an exact value oracle. Production
  * would read real (src, dst) pairs; every plan shape below is
  * unchanged by that swap.
  *
  * All arithmetic is scaled BIGINT (ranks in units of 1e-9): each
  * engine runs the identical `div`-truncated recurrence, so three
  * iterations of float-free PageRank compare hash-exact. At a 1e10-node
  * corpus the scaled sums approach Long range; production widens the
  * accumulator to DECIMAL(38,0) (Spark and the warehouse both sum
  * decimals exactly) — the recurrence is unchanged.
  */
object GraphOps {

  /** Out-degree of every node in the planted graph. */
  val OutDeg = 3

  /** Rank scale: ranks are integers in units of 1e-9. */
  val Scale = 1000000000L

  /** Damping numerator (PageRank d = 0.85 as an integer percentage). */
  val Damp = 85

  /** Power-iteration rounds. Three unrolled rounds keep the lineage
    * shallow enough to need no checkpoint; a production run iterating
    * to convergence would localCheckpoint every few rounds exactly like
    * the connected-components loop ([[DedupOps.neardupGroups]]) already
    * does, keeping the plan O(1) deep per round.
    */
  val Iters = 3

  /** Result head size. */
  val TopK = 25

  /** Planted edge list: (src, dst) with dst = salted-hash(src, j) mod N
    * for j < [[OutDeg]]. N arrives as a broadcast single-row cross join
    * (never a driver-side collect), so the edge generator is one narrow
    * projection over the corpus scan.
    */
  private def edges(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("cnt"))
    val targets = (0 until OutDeg).map { j =>
      pmod(DedupOps.portable64(
        concat(lit("pr:"), col("doc_id").cast("string"), lit(":"), lit(j.toString))),
        col("cnt"))
    }
    docs.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"), explode(array(targets: _*)).as("dst"))
  }

  /** PageRank, three exact integer iterations: r' = 0.15·S + 0.85·Σ
    * (r_in div outdeg), every step `div`-truncated identically on both
    * engines. Per iteration the plan is one join of the edge list with
    * the current ranks on `src` (shuffle on id), one partial-aggregated
    * sum per `dst`, and one left join back to the node set for the
    * teleport base — O(edges) per round, no all-pairs anywhere, and the
    * constant out-degree means the contribution divisor is a literal.
    * Result: the [[TopK]] highest-ranked nodes (rank desc, id asc) via
    * TakeOrderedAndProject.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    pagerankOf(docs.select(col("doc_id").as("id")), edges(docs))
      .orderBy(desc("rank"), asc("id")).limit(TopK)
  }

  /** The iteration over arbitrary `nodes(id)` / `edges(src, dst)`
    * frames with constant out-degree [[OutDeg]] (exposed so property
    * tests can drive random graphs through the exact production loop).
    */
  def pagerankOf(nodes: DataFrame, e: DataFrame): DataFrame = {
    val base = Scale * (100 - Damp) / 100
    var ranks = nodes.select(col("id"), lit(Scale).as("rank"))
    for (_ <- 1 to Iters) {
      val contribs = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr(s"rank div $OutDeg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      ranks = nodes.join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(base) + expr(s"(coalesce(in_sum, 0L) * $Damp) div 100")).as("rank"))
    }
    ranks
  }

  /** Triangle count over the undirected form of the planted graph —
    * the canonical multi-way self-join graph workload. Orientation does
    * the heavy lifting: every edge canonicalizes to (a < b), so each
    * triangle materializes as exactly ONE wedge (a,b)+(b,c) with
    * a < b < c, closed by a semi join probing (a,c) — no triple
    * counting, no post-hoc division. The wedge join is the quadratic
    * risk (Σ deg² pairs); at 100 TB the standard mitigations compose
    * onto this exact plan: orient by DEGREE instead of id (splits hub
    * fan-outs), and stoplist hubs past a bound the way the shingle
    * expansion caps [[DedupOps.JaccardMaxDf]]. The closing probe is a
    * semi join, so nothing wider than (a,b,c) ever crosses a shuffle.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    trianglesOf(edges(Tables.documents(spark, dir)))

  /** The count over an arbitrary `(src, dst)` edge frame (exposed so
    * property tests can drive random graphs through the production
    * plan); self-loops and duplicate/reversed edges canonicalize away.
    */
  def trianglesOf(e: DataFrame): DataFrame = {
    val und = e.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val wedges = und.join(und.select(col("a").as("b2"), col("b").as("c")),
        col("b") === col("b2"))
      .select("a", "b", "c")
    wedges.join(und.select(col("a").as("a3"), col("b").as("c3")),
        col("a") === col("a3") && col("c") === col("c3"), "left_semi")
      .agg(count(lit(1)).as("triangles"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerank _),
    "graph_triangles" -> (triangles _),
  )

  /** One unrolled-iteration CTE per round, generated from the same
    * constants as the Spark plan (scale, damping, out-degree, salt).
    */
  private val duckEdges: String =
    (0 until OutDeg).map { j =>
      s"""SELECT doc_id AS src,
         |  CAST(concat('0x', substr(md5('pr:' || CAST(doc_id AS VARCHAR) || ':$j'), 1, 15)) AS BIGINT)
         |    % (SELECT count(*) FROM documents) AS dst
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")

  private def duckIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT d.doc_id AS id,
       |    ${Scale * (100 - Damp) / 100} + (COALESCE(SUM($prev.rank // $OutDeg), 0) * $Damp) // 100 AS rank
       |  FROM documents d
       |  LEFT JOIN e ON e.dst = d.doc_id
       |  LEFT JOIN $prev ON $prev.id = e.src
       |  GROUP BY d.doc_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "graph_triangles" ->
      s"""WITH e AS (
          |$duckEdges),
          |und AS (
          |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |  FROM e WHERE src <> dst)
          |SELECT count(*) AS triangles
          |FROM und x
          |JOIN und y ON y.a = x.b
          |JOIN und z ON z.a = x.a AND z.b = y.b""".stripMargin,
    "graph_pagerank" ->
      (s"""WITH e AS (
          |$duckEdges),
          |r0 AS (SELECT doc_id AS id, CAST($Scale AS BIGINT) AS rank FROM documents),
          |""".stripMargin
        + (1 to Iters).map(i => duckIter(s"r${i - 1}", s"r$i")).mkString(",\n") + "\n"
        + s"""SELECT id, rank FROM r$Iters
            |ORDER BY rank DESC, id LIMIT $TopK""".stripMargin),
  )
}
