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

  /** One power-iteration round: contributions shuffle on `src`, partial-
    * aggregate per `dst`, left join back to the node set for the
    * teleport base — O(edges), no all-pairs.
    */
  private def step(nodes: DataFrame, e: DataFrame, ranks: DataFrame): DataFrame = {
    val base = Scale * (100 - Damp) / 100
    val contribs = e.join(ranks, e("src") === ranks("id"))
      .select(col("dst"), expr(s"rank div $OutDeg").as("c"))
      .groupBy("dst").agg(sum("c").as("in_sum"))
    nodes.join(contribs, nodes("id") === contribs("dst"), "left")
      .select(col("id"),
        (lit(base) + expr(s"(coalesce(in_sum, 0L) * $Damp) div 100")).as("rank"))
  }

  /** The iteration over arbitrary `nodes(id)` / `edges(src, dst)`
    * frames with constant out-degree [[OutDeg]] (exposed so property
    * tests can drive random graphs through the exact production loop).
    */
  def pagerankOf(nodes: DataFrame, e: DataFrame): DataFrame = {
    var ranks = nodes.select(col("id"), lit(Scale).as("rank"))
    for (_ <- 1 to Iters) ranks = step(nodes, e, ranks)
    ranks
  }

  /** Iterate-to-convergence PageRank — the production loop the unrolled
    * [[pagerankOf]] is a 3-round slice of. Runs [[step]] until the
    * latest round's max per-node rank delta (probed at checkpoint
    * rounds) is ≤ `tol` (scaled units) or `maxIters` rounds elapse. Every `checkpointEvery` rounds
    * the ranks localCheckpoint (the [[DedupOps.connectedGroups]]
    * posture: materialize + truncate lineage so the plan stays O(k)
    * deep and the convergence probe — one abs-delta aggregate, a single
    * long to the driver — reads materialized blocks instead of
    * recomputing the whole chain). Integer truncation means a strict
    * fixpoint is not guaranteed (ranks can cycle by ±1 in the last
    * scaled digit), so `maxIters` is a hard bound, not a safety net;
    * `tol` at default absorbs that noise. Per-round cost and shuffle
    * shape are identical to the unrolled form, so the registered
    * query's oracle covers this loop's arithmetic exactly — the
    * property spec pins loop ≡ unrolled at [[Iters]] rounds.
    */
  def pagerankLoop(nodes: DataFrame, e: DataFrame, maxIters: Int = 40,
      tol: Long = 1000L, checkpointEvery: Int = 4): DataFrame = {
    require(maxIters >= 1 && checkpointEvery >= 1)
    var ranks = nodes.select(col("id"), lit(Scale).as("rank"))
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      it += 1
      val atCheckpoint = it % checkpointEvery == 0 || it == maxIters
      val next =
        if (atCheckpoint) step(nodes, e, ranks).localCheckpoint()
        else step(nodes, e, ranks)
      if (atCheckpoint) {
        val delta = next.select(col("id"), col("rank").as("r2"))
          .join(ranks.select(col("id"), col("rank").as("r1")), Seq("id"))
          .agg(coalesce(max(abs(col("r2") - col("r1"))), lit(0L)))
          .head().getLong(0)
        converged = delta <= tol
      }
      ranks = next
    }
    ranks
  }

  /** Hub cap for [[trianglesOf]]: an edge touching a node whose
    * undirected degree exceeds this bound is dropped before the wedge
    * join — the [[DedupOps.JaccardMaxDf]] move applied to graphs. Even
    * degree-oriented counting pays O(out-deg²) wedges per node, and a
    * social-graph celebrity node with degree 10⁷ would emit 10¹⁴ of
    * them; the cap makes the count a documented lower bound when it
    * bites (triangles entirely inside the sub-cap graph are exact).
    * The oracle SQL applies the identical cap (generated from this
    * constant), so both engines agree exactly. 1024 is far above the
    * planted graph's max degree (~2·[[OutDeg]]), so the registered
    * query's count is exact.
    */
  val TriangleMaxDeg = 1024

  /** Triangle count over the undirected form of the planted graph —
    * the canonical multi-way self-join graph workload. Orientation does
    * the heavy lifting, and it is DEGREE orientation (lower (degree,
    * id) endpoint → higher): each triangle materializes as exactly ONE
    * wedge rooted at its minimum-rank corner, closed by a semi join
    * probing the third oriented edge — no triple counting, no post-hoc
    * division. Degree orientation is what makes the wedge join survive
    * power-law graphs: a hub of degree d has out-degree O(√m) after
    * orientation (all its edges to lower-degree neighbors point AWAY
    * from them), so the wedge fan-out is Σ out-deg² ≤ O(m^1.5) instead
    * of the Σ deg² blow-up an id-oriented join pays when a single hub
    * materializes O(d²) wedges. The [[TriangleMaxDeg]] stoplist bounds
    * the residual worst case. The closing probe is a semi join, so
    * nothing wider than (lo, p, q) ever crosses a shuffle.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    trianglesOf(edges(Tables.documents(spark, dir)))

  /** The count over an arbitrary `(src, dst)` edge frame (exposed so
    * property tests can drive random graphs through the production
    * plan); self-loops and duplicate/reversed edges canonicalize away.
    * `maxDeg` is the hub stoplist (degrees measured in the full
    * canonical graph, BEFORE any edge is dropped, so the cut is a pure
    * per-edge predicate and two capped components never re-merge).
    */
  /** Canonical undirected edges with both endpoint degrees attached and
    * the [[TriangleMaxDeg]] hub stoplist applied — the shared front end
    * of [[trianglesOf]] and [[commonNeighborsOf]]. The edge set is
    * referenced multiple times downstream (degree build + attach joins
    * + wedge sides); without materialization each reference re-derives
    * the whole upstream chain (no exchange subtree repeats exactly, so
    * ReuseExchange never fires). localCheckpoint once — the
    * connectedGroups posture: at scale you materialize the edge list,
    * then count.
    */
  private def cappedUndirected(e: DataFrame, maxDeg: Int): DataFrame = {
    val und = e.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint()
    // Undirected degree of every endpoint — one row per node, built by
    // the same shuffle key (node id) the two attach joins below reuse.
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .filter(col("da") <= maxDeg && col("db") <= maxDeg)
  }

  def trianglesOf(e: DataFrame, maxDeg: Int = TriangleMaxDeg): DataFrame = {
    val withDeg = cappedUndirected(e, maxDeg)
    // Orient lower (degree, id) → higher; carry the head's rank so the
    // wedge pair below can canonicalize without another degree join.
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("lo"),
      when(aFirst, col("b")).otherwise(col("a")).as("hi"),
      when(aFirst, col("db")).otherwise(col("da")).as("hid"))
      .localCheckpoint()
    // Each triangle's minimum-rank corner roots exactly one wedge: the
    // pair of its out-neighbors, ordered by (degree, id) rank so the
    // closing edge is oriented p → q by construction.
    val wedges = oriented.select(col("lo"), col("hi").as("p"), col("hid").as("pd"))
      .join(oriented.select(col("lo"), col("hi").as("q"), col("hid").as("qd")),
        Seq("lo"))
      .filter(col("pd") < col("qd") ||
        (col("pd") === col("qd") && col("p") < col("q")))
      .select("p", "q")
    wedges.join(oriented.select(col("lo").as("p"), col("hi").as("q")),
        Seq("p", "q"), "left_semi")
      .agg(count(lit(1)).as("triangles"))
  }

  /** Pairs reported by [[commonNeighbors]]. */
  val CnTopK = 15

  /** Link prediction by common-neighbor counting — the classic
    * first-order recommender/link-prediction baseline: for every
    * UNCONNECTED node pair, how many neighbors they share, top
    * [[CnTopK]] pairs. Unlike triangle counting (where rooting each
    * wedge at its min-rank corner suffices), common-neighbor counting
    * needs EVERY wedge regardless of center rank, so the fan-out per
    * center is degree² — which is exactly why the [[TriangleMaxDeg]]
    * hub stoplist applies here too: a capped center contributes at most
    * cap²/2 pairs (the `BandedPairs` cap discipline on graphs), and the
    * celebrity hub whose wedges would dominate — and mean nothing for
    * link prediction — is dropped, with the same constant mirrored in
    * the oracle.
    *
    * Shape: one canonical-edge materialization shared with the triangle
    * query, a degree-bounded adjacency self-join on the center key, one
    * pair-count aggregation, an anti-join removing already-connected
    * pairs, TakeOrderedAndProject head.
    */
  def commonNeighbors(spark: SparkSession, dir: String): DataFrame =
    commonNeighborsOf(edges(Tables.documents(spark, dir)), TriangleMaxDeg, CnTopK)

  def commonNeighborsOf(e: DataFrame, maxDeg: Int, k: Int): DataFrame = {
    val kept = cappedUndirected(e, maxDeg).select("a", "b").localCheckpoint()
    val adj = kept.select(col("a").as("u"), col("b").as("v"))
      .unionAll(kept.select(col("b").as("u"), col("a").as("v")))
    val wedgePairs = adj
      .join(adj.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
    wedgePairs.groupBy("v", "w").agg(count(lit(1)).as("common"))
      .join(kept.select(col("a").as("v"), col("b").as("w")), Seq("v", "w"), "left_anti")
      .select(col("v").as("a"), col("w").as("b"), col("common"))
      .orderBy(desc("common"), asc("a"), asc("b"))
      .limit(k)
  }

  /** BFS seed node for [[bfs]]. */
  val BfsSeed = 0L

  /** Max hop distance explored by [[bfs]] (one join round per hop). */
  val BfsHops = 4

  /** Hop distance from [[BfsSeed]] over the directed planted graph —
    * the crawl-frontier workload (how deep does a crawl reach in k
    * rounds, and how many pages per depth). One row per node reachable
    * within [[BfsHops]] hops: (id, dist), dist minimal by construction.
    */
  def bfs(spark: SparkSession, dir: String): DataFrame =
    bfsOf(edges(Tables.documents(spark, dir)), BfsSeed, BfsHops)
      .orderBy(asc("dist"), asc("id"))

  /** Frontier BFS over an arbitrary `(src, dst)` edge frame (exposed
    * for property tests). Per round the plan joins the edge list with
    * the LAST round's frontier only — never the full visited set — so
    * round cost is O(edges touching the frontier): expand (equi-join on
    * `src`), dedup targets (`distinct`), subtract already-visited
    * (anti join), tag the survivors with the round number. The fresh
    * set localCheckpoints each round (the [[DedupOps.neardupGroups]]
    * posture): the visited accumulator is referenced by every later
    * anti join AND the final union, and materializing the per-round
    * increment keeps those re-reads O(1) instead of replaying the whole
    * join chain; lineage depth stays O(1) per round. Minimality of
    * `dist` is structural — a node joins the visited set the FIRST
    * round a frontier edge reaches it and the anti join bars re-entry.
    * At 100 TB the visited set is the only state that grows; it carries
    * two longs per node, shuffled on the same `id` key every round.
    */
  def bfsOf(e: DataFrame, seed: Long, hops: Int): DataFrame = {
    require(hops >= 0)
    val spark = e.sparkSession
    var dist = spark.range(1)
      .select(lit(seed).as("id"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist.select("id")
    for (h <- 1 to hops) {
      val fresh = e.join(frontier, e("src") === frontier("id"))
        .select(e("dst").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .select(col("id"), lit(h.toLong).as("dist"))
        .localCheckpoint()
      dist = dist.unionAll(fresh)
      frontier = fresh.select("id")
    }
    dist
  }

  /** Weight modulus for [[weightedEdges]]: weights land in
    * 1..[[WeightMod]].
    */
  val WeightMod = 9L

  /** Relaxation rounds for [[sssp]] — exact shortest costs over paths
    * of ≤ this many edges (the bounded-round Bellman-Ford contract).
    */
  val SsspRounds = 4

  /** The planted edge list with a deterministic integer WEIGHT per
    * edge: same target derivation as [[edges]], weight = salted
    * portable hash folded onto 1..[[WeightMod]] — identically in the
    * oracle, so the whole iterative relaxation is integer-exact
    * cross-engine. One projection, one explode of (dst, w) structs.
    */
  private def weightedEdges(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("cnt"))
    val pairs = (0 until OutDeg).map { j =>
      struct(
        pmod(DedupOps.portable64(
          concat(lit("pr:"), col("doc_id").cast("string"), lit(":"), lit(j.toString))),
          col("cnt")).as("dst"),
        (pmod(DedupOps.portable64(
          concat(lit("w:"), col("doc_id").cast("string"), lit(":"), lit(j.toString))),
          lit(WeightMod)) + lit(1L)).as("w"))
    }
    docs.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"), explode(array(pairs: _*)).as("e"))
      .select(col("src"), col("e.dst").as("dst"), col("e.w").as("w"))
  }

  /** Single-source shortest paths, [[SsspRounds]] Bellman-Ford
    * relaxation rounds from [[BfsSeed]] over the weighted planted
    * graph: minimal total edge weight over paths of ≤ R edges — the
    * cost-aware sibling of [[bfs]] (whose hop distance is the uniform-
    * weight special case). Result: (id, cost) for every node reached.
    */
  def sssp(spark: SparkSession, dir: String): DataFrame =
    ssspOf(weightedEdges(Tables.documents(spark, dir)), BfsSeed, SsspRounds)
      .orderBy(asc("cost"), asc("id"))

  /** One relaxation round = one equi-join of the edge list with the
    * CURRENT tentative-cost frame on `src` plus a `min` re-aggregation
    * on `id` — O(edges incident to reached nodes) per round, no
    * all-pairs, shuffles keyed on node id throughout. The cost frame
    * localCheckpoints each round (the [[bfsOf]] discipline): it is
    * both join input and union arm next round, and materializing it
    * keeps lineage depth O(1) per round instead of O(rounds) at the
    * end. Unlike BFS, a node's cost can IMPROVE in a later round
    * (a longer-hop but cheaper path), which is why the whole frame
    * re-aggregates instead of anti-joining out already-seen nodes.
    */
  def ssspOf(e: DataFrame, seed: Long, rounds: Int): DataFrame = {
    require(rounds >= 0)
    val spark = e.sparkSession
    var dist = spark.range(1)
      .select(lit(seed).as("id"), lit(0L).as("cost"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = e.join(dist, e("src") === dist("id"))
        .select(e("dst").as("id"), (dist("cost") + e("w")).as("cost"))
      dist = dist.unionAll(relaxed)
        .groupBy("id").agg(min("cost").as("cost"))
        .localCheckpoint()
    }
    dist
  }

  /** The same reachability computation through the SQL surface's
    * `WITH RECURSIVE` (Spark 4's recursive CTE — the ResolveWithCTE
    * analyzer rule turns the self-reference into an iterative union):
    * anchor = the seed at dist 0, recursive member = one edge
    * expansion bounded by [[BfsHops]], outer query = `min(dist)` per
    * node (UNION ALL enumerates paths; the group-by restores BFS
    * minimality). Same rows as `graph_bfs`, arrived at declaratively —
    * and the oracle is the IDENTICAL recursive statement in DuckDB, so
    * the gate pins cross-engine recursive-CTE semantics, not just the
    * result. Scale note: path enumeration under UNION ALL grows with
    * path COUNT, not node count — the right shape for bounded-depth
    * reachability on sparse graphs; for deep or dense expansion the
    * frontier loop [[bfsOf]] (anti-join dedup per round) is the
    * registered scale path.
    */
  def bfsRecursive(spark: SparkSession, dir: String): DataFrame =
    bfsRecursiveOf(edges(Tables.documents(spark, dir)), BfsSeed, BfsHops)

  /** The recursive-CTE reachability statement over an arbitrary
    * `(src, dst)` edge frame (exposed for the property spec, which
    * pins it ≡ [[bfsOf]]'s frontier loop on random graphs).
    */
  def bfsRecursiveOf(e: DataFrame, seed: Long, hops: Int): DataFrame = {
    require(hops >= 0)
    val spark = e.sparkSession
    e.createOrReplaceTempView("edges_rec")
    spark.sql(
      s"""WITH RECURSIVE reach AS (
         |  SELECT CAST($seed AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
         |  UNION ALL
         |  SELECT e.dst AS id, r.dist + 1 AS dist
         |  FROM reach r JOIN edges_rec e ON e.src = r.id
         |  WHERE r.dist < $hops
         |)
         |SELECT id, CAST(min(dist) AS BIGINT) AS dist
         |FROM reach GROUP BY id ORDER BY dist, id""".stripMargin)
  }

  /** Registered convergence-loop PageRank: [[pagerankLoop]] over the
    * planted graph with `tol = 0` and `maxIters =` [[Iters]], which
    * provably runs exactly [[Iters]] rounds (the only checkpoint probe
    * fires AT the final round, after the iteration bound has already
    * been reached) — so it shares `graph_pagerank`'s unrolled oracle
    * and the LOOP's plan, checkpoint cadence, and cost become part of
    * the bench/gate audit trail instead of being reachable only from
    * tests. The property spec additionally pins loop ≡ unrolled on
    * random graphs for arbitrary round counts.
    */
  def pagerankConv(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    pagerankLoop(docs.select(col("doc_id").as("id")), edges(docs),
        maxIters = Iters, tol = 0L)
      .orderBy(desc("rank"), asc("id")).limit(TopK)
  }

  /** [[kcore]]'s k and the oracle's unrolled round budget: Spark
    * iterates the pruning to its FIXPOINT and `require`s convergence
    * within [[KCoreRounds]] (loud if a fixture ever needs more), while
    * the oracle unrolls exactly [[KCoreRounds]] rounds — sound because
    * the alive set only shrinks, so rounds past convergence are
    * no-ops and both engines land on the same fixpoint.
    */
  val KCoreK = 4
  val KCoreRounds = 8

  /** K-CORE decomposition — the density/subgraph-mining class next to
    * the path (BFS/SSSP), centrality (PageRank), and motif (triangles/
    * common-neighbors) families: repeatedly delete every node whose
    * degree in the SURVIVING subgraph is below k until nothing
    * changes; what remains is the maximal subgraph of minimum degree
    * ≥ k (the classic community-core / nucleus peel). Per round the
    * plan is two semi-joins of the undirected edge list against the
    * alive set and one partial-aggregated degree count — O(edges) per
    * round, never all-pairs — with the alive frame localCheckpoint'd
    * per round (the CC-loop lineage discipline) and only a count
    * scalar on the driver. Convergence detection is count equality:
    * the next set is a subset by construction, so equal size ⇒ equal
    * set. Output: core size, the [[TopK]] members by final in-core
    * degree (ties to lowest id).
    */
  def kcore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    kcoreOf(docs.select(col("doc_id").as("id")), edges(docs), KCoreK, KCoreRounds)
  }

  /** The peel over arbitrary `nodes(id)` / `edges(src, dst)` frames
    * (exposed for the spec, which plants a triangle with a pendant
    * path). Edges to ids OUTSIDE `nodes` drop in the first round's
    * semi-join, mirroring the oracle's a0 join.
    */
  def kcoreOf(nodes: DataFrame, e: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    val und = e.select(col("src"), col("dst"))
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    def survivors(alive: DataFrame): DataFrame = und
      .join(alive.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(alive.select(col("id").as("dst")), Seq("dst"), "left_semi")
    var alive = nodes.select("id").localCheckpoint()
    var n = alive.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = survivors(alive)
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("id"))
        .localCheckpoint()
      val m = next.count()
      converged = m == n
      n = m
      alive = next
      rounds += 1
    }
    require(converged || n == 0L,
      s"k-core did not converge within $maxRounds rounds (still $n alive) — " +
        "raise KCoreRounds (and the oracle's unrolled budget moves with it)")
    val coreSize = n
    survivors(alive)
      .groupBy("src").agg(count(lit(1)).as("deg"))
      .select(lit(coreSize).as("core_size"), col("src").as("id"),
        col("deg").as("core_deg"))
      .orderBy(desc("core_deg"), asc("id")).limit(TopK)
  }

  /** Synchronous label-propagation rounds. Four rounds settle the
    * planted graph's dense cores; the oracle unrolls the same count,
    * so raising it moves both sides together. LPA may oscillate on
    * bipartite-ish structures — the BOUNDED synchronous form with
    * deterministic ties is the well-defined computation both engines
    * run, which is exactly what the value gate needs (production runs
    * more rounds or switches to async sweeps; the per-round plan is
    * unchanged).
    */
  val LpaRounds = 4

  /** LABEL-PROPAGATION community detection — the modularity-style
    * clustering lens the family lacked next to connected components
    * (`neardup_groups`) and the k-core peel: every node starts as its
    * own label; each synchronous round reassigns every node the most
    * frequent label among its neighbors, ties to the SMALLEST label
    * (the determinism that makes the iteration oracle-able), isolated
    * nodes keeping their own. Per round the plan is one O(edges) join
    * of the undirected edge list with the current labels, a partial-
    * aggregated (node, label) count, and one argmax per node via a
    * single struct-max aggregate — no window, no all-pairs — with the
    * label frame localCheckpoint'd per round (the CC/k-core lineage
    * discipline); the driver sees only the loop counter. Output: the
    * [[TopK]] communities by size (ties to lowest label) plus the
    * global community count as a broadcast scalar.
    */
  def lpa(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    lpaOf(docs.select(col("doc_id").as("id")), edges(docs), LpaRounds)
  }

  /** The propagation over arbitrary `nodes(id)` / `edges(src, dst)`
    * frames (exposed for the spec and the random-graph property, which
    * pin it against a sequential fold of the same recurrence). Labels
    * must be non-negative: the argmax rides one `max(struct(count,
    * -label))` aggregate — lexicographic struct order gives max count
    * then min label in a single map-side-combinable pass.
    */
  def lpaOf(nodes: DataFrame, e: DataFrame, rounds: Int): DataFrame = {
    val und = e.select(col("src"), col("dst"))
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val best = und
        .join(labels.select(col("id").as("dst"), col("lbl")), "dst")
        .groupBy("src", "lbl").agg(count(lit(1)).as("c"))
        .groupBy("src")
        .agg(max(struct(col("c"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("src").as("id"), (-col("m.neg")).as("new_lbl"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint()
    }
    val comms = labels.groupBy("lbl")
      .agg(count(lit(1)).as("n_members"), min("id").as("min_id"))
    comms.crossJoin(
        broadcast(comms.agg(count(lit(1)).as("n_communities"))))
      .select(col("n_communities"), col("lbl").as("label"),
        col("n_members"), col("min_id"))
      .orderBy(desc("n_members"), asc("label")).limit(TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_lpa" -> (lpa _),
    "graph_kcore" -> (kcore _),
    "graph_pagerank" -> (pagerank _),
    "graph_pagerank_conv" -> (pagerankConv _),
    "graph_triangles" -> (triangles _),
    "graph_common_neighbors" -> (commonNeighbors _),
    "graph_bfs" -> (bfs _),
    "sql_recursive" -> (bfsRecursive _),
    "graph_sssp" -> (sssp _),
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

  /** Weighted planted edges in portable SQL — the [[duckEdges]]
    * derivation plus the per-(src, j) weight hash.
    */
  private val duckWeightedEdges: String =
    (0 until OutDeg).map { j =>
      s"""SELECT doc_id AS src,
         |  CAST(concat('0x', substr(md5('pr:' || CAST(doc_id AS VARCHAR) || ':$j'), 1, 15)) AS BIGINT)
         |    % (SELECT count(*) FROM documents) AS dst,
         |  CAST(concat('0x', substr(md5('w:' || CAST(doc_id AS VARCHAR) || ':$j'), 1, 15)) AS BIGINT)
         |    % $WeightMod + 1 AS w
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Unrolled Bellman-Ford rounds: d_k = min over (d_{k-1} ∪ one
    * relaxation of d_{k-1}). Each round's frame is referenced twice
    * (union arm + join input), so every CTE is MATERIALIZED — DuckDB
    * would otherwise inline the reference chain exponentially.
    */
  private def duckSssp: String = {
    val rounds = (1 to SsspRounds).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT id, CAST(min(cost) AS BIGINT) AS cost FROM (
         |    SELECT id, cost FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, p.cost + e.w AS cost
         |    FROM d${k - 1} p JOIN e ON e.src = p.id) u
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |$duckWeightedEdges),
       |d0 AS (SELECT CAST($BfsSeed AS BIGINT) AS id, CAST(0 AS BIGINT) AS cost),
       |$rounds
       |SELECT id, cost FROM d$SsspRounds ORDER BY cost, id""".stripMargin
  }

  private def duckIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT d.doc_id AS id,
       |    ${Scale * (100 - Damp) / 100} + (COALESCE(SUM($prev.rank // $OutDeg), 0) * $Damp) // 100 AS rank
       |  FROM documents d
       |  LEFT JOIN e ON e.dst = d.doc_id
       |  LEFT JOIN $prev ON $prev.id = e.src
       |  GROUP BY d.doc_id)""".stripMargin

  /** Cumulative k-hop reach sets as unrolled CTEs: r_k = r_{k-1} ∪
    * out-neighbors(r_{k-1}); dist falls out as the first k whose set
    * holds the node. Membership order makes minimality explicit — the
    * same structural argument the frontier loop's anti join makes.
    */
  private val duckBfs: String = {
    val steps = (1 to BfsHops).map { k =>
      s"""r$k AS (
         |  SELECT DISTINCT id FROM (
         |    SELECT id FROM r${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS id FROM e JOIN r${k - 1} p ON e.src = p.id) u)"""
        .stripMargin
    }.mkString(",\n")
    val dist = (0 until BfsHops).map { k =>
      s"WHEN id IN (SELECT id FROM r$k) THEN $k"
    }.mkString("\n    ")
    s"""WITH e AS (
       |$duckEdges),
       |r0 AS (SELECT CAST($BfsSeed AS BIGINT) AS id),
       |$steps
       |SELECT id, CAST(CASE
       |    $dist
       |    ELSE $BfsHops END AS BIGINT) AS dist
       |FROM r$BfsHops ORDER BY dist, id""".stripMargin
  }

  /** [[kcore]]'s unrolled twin: the same planted edges symmetrized and
    * deduped, then [[KCoreRounds]] peel rounds — each round's degree
    * count joins the PREVIOUS alive set on both endpoints (exactly the
    * two semi-joins) and keeps ids with deg ≥ [[KCoreK]]. Every alive
    * CTE is MATERIALIZED (referenced twice per round — the exponential-
    * inlining rule); rounds past the fixpoint are no-ops, so the fixed
    * unroll equals Spark's converged loop.
    */
  private def duckKcore: String = {
    val rounds = (1 to KCoreRounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT u.src AS id, CAST(count(*) AS BIGINT) AS deg
         |  FROM und u
         |  JOIN a${i - 1} x ON u.src = x.id
         |  JOIN a${i - 1} y ON u.dst = y.id
         |  GROUP BY u.src),
         |a$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= $KCoreK)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |$duckEdges),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0) t
       |  WHERE src <> dst),
       |a0 AS MATERIALIZED (SELECT doc_id AS id FROM documents),
       |$rounds,
       |degf AS (
       |  SELECT u.src AS id, CAST(count(*) AS BIGINT) AS deg
       |  FROM und u
       |  JOIN a$KCoreRounds x ON u.src = x.id
       |  JOIN a$KCoreRounds y ON u.dst = y.id
       |  GROUP BY u.src)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM a$KCoreRounds) AS core_size,
       |  id, deg AS core_deg
       |FROM degf
       |ORDER BY core_deg DESC, id LIMIT $TopK""".stripMargin
  }

  /** Unrolled-round LPA twin: per round the same (node, label)
    * neighbor count, the same argmax-by-(count, min-label) — expressed
    * as a window max + min(label) filter, which is value-identical to
    * the Spark side's struct-max — and a LEFT join keeping isolated
    * nodes' labels. Every round CTE is MATERIALIZED (multi-referenced
    * CTEs inline exponentially otherwise).
    */
  private def duckLpa: String = {
    val rounds = (1 to LpaRounds).map { i =>
      s"""n$i AS MATERIALIZED (
         |  SELECT u.src AS id, l.lbl, CAST(count(*) AS BIGINT) AS c
         |  FROM und u JOIN l${i - 1} l ON u.dst = l.id
         |  GROUP BY u.src, l.lbl),
         |b$i AS MATERIALIZED (
         |  SELECT id, min(lbl) AS lbl FROM (
         |    SELECT id, lbl, c, max(c) OVER (PARTITION BY id) AS mc
         |    FROM n$i) t
         |  WHERE c = mc GROUP BY id),
         |l$i AS MATERIALIZED (
         |  SELECT a.id, coalesce(b.lbl, a.lbl) AS lbl
         |  FROM l${i - 1} a LEFT JOIN b$i b ON a.id = b.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |$duckEdges),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0) t
       |  WHERE src <> dst),
       |l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl FROM documents),
       |$rounds,
       |comms AS (
       |  SELECT lbl AS label, CAST(count(*) AS BIGINT) AS n_members,
       |    min(id) AS min_id
       |  FROM l$LpaRounds GROUP BY lbl),
       |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_communities FROM comms)
       |SELECT nc.n_communities, comms.label, comms.n_members, comms.min_id
       |FROM comms, nc
       |ORDER BY n_members DESC, label LIMIT $TopK""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "graph_lpa" -> duckLpa,
    "graph_kcore" -> duckKcore,
    "graph_bfs" -> duckBfs,
    "graph_sssp" -> duckSssp,
    // The SAME recursive statement both engines run — only the edge
    // CTE differs (planted-hash derivation in portable SQL).
    "sql_recursive" ->
      s"""WITH RECURSIVE e AS MATERIALIZED (
         |$duckEdges),
         |reach AS (
         |  SELECT CAST($BfsSeed AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
         |  UNION ALL
         |  SELECT e.dst AS id, r.dist + 1 AS dist
         |  FROM reach r JOIN e ON e.src = r.id
         |  WHERE r.dist < $BfsHops)
         |SELECT id, CAST(min(dist) AS BIGINT) AS dist
         |FROM reach GROUP BY id ORDER BY dist, id""".stripMargin,
    // Orientation is count-preserving, so the oracle keeps the simple
    // id-oriented wedge join; only the TriangleMaxDeg hub stoplist must
    // mirror (same constant, degrees measured before the cut).
    "graph_triangles" ->
      s"""WITH e AS (
          |$duckEdges),
          |und AS (
          |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |  FROM e WHERE src <> dst),
          |deg AS (
          |  SELECT v, count(*) AS d FROM (
          |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) u
          |  GROUP BY v),
          |kept AS (
          |  SELECT a, b FROM und
          |  JOIN deg da ON da.v = und.a
          |  JOIN deg db ON db.v = und.b
          |  WHERE da.d <= $TriangleMaxDeg AND db.d <= $TriangleMaxDeg)
          |SELECT count(*) AS triangles
          |FROM kept x
          |JOIN kept y ON y.a = x.b
          |JOIN kept z ON z.a = x.a AND z.b = y.b""".stripMargin,
    // Same capped edge CTEs as graph_triangles; the adjacency self-join
    // on the center with v < w enumerates each unordered neighbor pair
    // once per shared neighbor — count-identical to the Spark plan.
    "graph_common_neighbors" ->
      s"""WITH e AS (
          |$duckEdges),
          |und AS (
          |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |  FROM e WHERE src <> dst),
          |deg AS (
          |  SELECT v, count(*) AS d FROM (
          |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) u
          |  GROUP BY v),
          |kept AS (
          |  SELECT a, b FROM und
          |  JOIN deg da ON da.v = und.a
          |  JOIN deg db ON db.v = und.b
          |  WHERE da.d <= $TriangleMaxDeg AND db.d <= $TriangleMaxDeg),
          |adj AS (
          |  SELECT a AS u, b AS v FROM kept
          |  UNION ALL SELECT b AS u, a AS v FROM kept),
          |cn AS (
          |  SELECT x.v AS a, y.v AS b, count(*) AS common
          |  FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v
          |  GROUP BY x.v, y.v)
          |SELECT a, b, common FROM cn
          |WHERE NOT EXISTS (SELECT 1 FROM kept WHERE kept.a = cn.a AND kept.b = cn.b)
          |ORDER BY common DESC, a, b LIMIT $CnTopK""".stripMargin,
    "graph_pagerank" -> duckPagerankSql,
    // The convergence loop at tol=0 / maxIters=Iters runs exactly the
    // unrolled rounds — one oracle, two plans under the gate.
    "graph_pagerank_conv" -> duckPagerankSql,
  )

  private lazy val duckPagerankSql: String =
    s"""WITH e AS (
       |$duckEdges),
       |r0 AS (SELECT doc_id AS id, CAST($Scale AS BIGINT) AS rank FROM documents),
       |""".stripMargin +
      (1 to Iters).map(i => duckIter(s"r${i - 1}", s"r$i")).mkString(",\n") + "\n" +
      // CAST back: DuckDB's SUM widens to HUGEINT inside duckIter and
      // the widening propagates to the final projection; Spark's rank
      // is BIGINT, and the driver's value hash is type-sensitive.
      s"""SELECT id, CAST(rank AS BIGINT) AS rank FROM r$Iters
         |ORDER BY rank DESC, id LIMIT $TopK""".stripMargin
}
