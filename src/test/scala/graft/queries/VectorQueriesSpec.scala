package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.VectorOps

class VectorQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("batch knn: bounded aggregator reproduces the window-rank top-k per query") {
    import org.apache.spark.sql.expressions.Window
    val got = VectorQueries.knnBatch(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).distinct.length === VectorQueries.KnnQueries)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length === VectorQueries.KnnK, s"query $qid row count")
      val sims = rows.sortBy(_._2).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"query $qid sims must be non-increasing in rank")
    }
    // The window-rank formulation over the same scores must agree
    // exactly (TopKAgg's (sim desc, vec_id asc) order is its twin).
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < VectorQueries.KnnQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    val ref = e.filter(col("vec_id") >= VectorQueries.KnnQueries)
      .crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .filter(col("sim").isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= VectorQueries.KnnK)
      .select("qid", "rank", "vec_id", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got.toSet === ref)
  }

  test("ivf MoR: tombstoned vectors never surface; the pre-delete index time-travels") {
    val got = VectorQueries.topKIvfMor(spark, dir)
      .select("vec_id").as[Long].collect().toSeq
    assert(got.forall(v =>
      v % VectorQueries.IvfMorMod != VectorQueries.IvfMorRem),
      "a deleted vector surfaced from the MoR index")
    // The registered query just built the table; generation 1 must
    // still serve the FULL pre-delete index (the audit view), and the
    // tombstoned view must be a strict subset when deletes exist.
    val table = graft.Scratch.dir("ivf_mor_table")
    val g1 = graft.sources.SnapshotTable.readAs(spark, table, 1L).count()
    val g2 = graft.sources.SnapshotTable
      .readMor(spark, table, 2L, "vec_id").count()
    val deleted = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % VectorQueries.IvfMorMod === VectorQueries.IvfMorRem)
      .count()
    assert(g1 - g2 === deleted,
      "readMor must hide exactly the tombstoned vectors; gen 1 keeps them all")
  }

  test("ivf: probes at most IvfProbe cells and scores are true cosines") {
    val got = VectorQueries.topKIvf(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(got.length === 10)
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "results must be sorted by similarity descending")
    assert(got.map(_._2).distinct.length <= VectorQueries.IvfProbe,
      "results may only come from the probed cells")

    // IVF trades recall for scan volume but never falsifies a score:
    // every returned sim must equal the directly-computed cosine.
    val direct = {
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.crossJoin(q)
        .select(col("vec_id"), VectorOps.cosine(col("v"), col("qv")).as("sim"))
        .as[(Long, Double)].collect().toMap
    }
    got.foreach { case (id, _, sim) =>
      assert(sim === direct(id), s"vec $id: ivf sim must be the true cosine")
    }
  }

  test("trained ivf: probing every cell recovers the exact brute-force top-10") {
    // Cells partition the corpus, so with probe = k the two-level scan
    // degenerates to a full scan and must agree with brute force exactly
    // — for ANY centroid set, trained or not. This pins the trained
    // variant's correctness without needing reproducible centers.
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val cents = VectorQueries.trainedCents(spark, dir)
    assert(cents.count() === VectorQueries.IvfCentroids.toLong)
    val full = VectorQueries
      .topKIvfWith(e, cents, VectorQueries.IvfCentroids)
      .select(col("vec_id"), col("sim"))
      .as[(Long, Double)].collect().toSeq
    val brute = VectorQueries.topK(spark, dir)
      .as[(Long, Double)].collect().toSeq
    assert(full === brute)
  }

  test("trained ivf with partial probe returns true cosines from probed cells") {
    val got = VectorQueries.topKIvfTrained(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(got.length === 10)
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last))
    assert(got.map(_._2).distinct.length <= VectorQueries.IvfProbe)
  }

  test("ivf assignment is exhaustive: every vector lands in exactly one cell") {
    // The -2 null-cosine sentinel guarantees even degenerate vectors get
    // a deterministic cell, so the index covers the whole corpus.
    val n = Tables.embeddings(spark, dir).count()
    val cells = VectorQueries.ivfAssignment(spark, dir)
      .as[(Long, Long)].collect()
    assert(cells.length.toLong === n, "one assignment row per corpus vector")
    assert(cells.map(_._1).distinct.length.toLong === n, "no vector assigned twice")
    assert(cells.forall(c => c._2 >= 1 && c._2 <= VectorQueries.IvfCentroids))
  }

  test("sq8: rescoring every candidate reproduces the brute-force top-10") {
    // The approx ranking only SELECTS candidates; scores in the final
    // ranking are always true cosines — so with rescore = corpus size
    // the compression path must agree with brute force exactly, for any
    // codebook.
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val n = e.count().toInt
    val all = VectorQueries.topKSq8With(e, n)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val brute = VectorQueries.topK(spark, dir)
      .as[(Long, Double)].collect().toSeq
    assert(all === brute)
  }

  test("sq8: the default rescore depth keeps high recall on the fixture") {
    val got = VectorQueries.topKSq8(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val brute = VectorQueries.topK(spark, dir)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert((got & brute).size >= 8,
      s"SQ8 with rescore=${VectorQueries.Sq8Rescore} should recover most of the true top-10")
  }

  test("pq: rescoring every candidate reproduces the brute-force top-10") {
    // The ADC ranking only SELECTS candidates; the final ranking is
    // always true cosines — so rescore = corpus size must agree with
    // brute force exactly, for ANY sub-codebook.
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val n = e.count().toInt
    val all = VectorQueries.topKPqWith(e, n)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val brute = VectorQueries.topK(spark, dir)
      .as[(Long, Double)].collect().toSeq
    assert(all === brute)
  }

  test("pq: every vector gets one code per subspace, all within [1, PqK]") {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val codes = VectorQueries.pqCodes(e).collect()
    assert(codes.length.toLong === n)
    codes.foreach { r =>
      (1 to VectorQueries.PqM).foreach { i =>
        val c = r.getLong(i)
        assert(c >= 1 && c <= VectorQueries.PqK, s"code $c out of range in $r")
      }
    }
  }

  test("ivfpq: probing all cells and rescoring all candidates reproduces brute force") {
    // Cells partition the corpus and ADC only SELECTS candidates, so the
    // degenerate configuration must agree with brute force exactly —
    // for ANY centroid set and ANY sub-codebook.
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val n = e.count().toInt
    val all = VectorQueries.topKIvfPqWith(e, VectorQueries.IvfCentroids, n)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val brute = VectorQueries.topK(spark, dir)
      .as[(Long, Double)].collect().toSeq
    assert(all === brute)
  }

  test("ivfpq: default config returns true cosines from at most IvfProbe cells") {
    val got = VectorQueries.topKIvfPq(spark, dir)
      .as[(Long, Long, Double, Long)].collect()
    assert(got.length === 10)
    assert(got.map(_._2).distinct.length <= VectorQueries.IvfProbe)
    // scores are true cosines: spot-check monotone ordering
    assert(got.map(_._3).toSeq === got.map(_._3).sortBy(-(_: Double)).toSeq)
  }

  test("pq: the default rescore depth keeps high recall on the fixture") {
    val got = VectorQueries.topKPq(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val brute = VectorQueries.topK(spark, dir)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert((got & brute).size >= 8,
      s"PQ with rescore=${VectorQueries.PqRescore} should recover most of the true top-10")
  }

  test("semantic decontam surfaces a planted train-test leak, blocked by cell") {
    // Train vec 1 IS test vec 2 (same cell): a perfect leak, sim = 1.
    // Train vec 3 sits in a DIFFERENT cell than its test twin 4, so the
    // cell blocking (the documented recall trade) must NOT pair them.
    // Zero-norm test vec 5 must never produce a null-sim row.
    val w = Seq(
      (1L, Seq(1.0, 0.0, 2.0), "train", 7L),
      (2L, Seq(1.0, 0.0, 2.0), "test", 7L),
      (3L, Seq(0.0, 5.0, 0.0), "train", 8L),
      (4L, Seq(0.0, 5.0, 0.0), "test", 9L),
      (5L, Seq(0.0, 0.0, 0.0), "test", 7L),
      (6L, Seq(2.0, 0.0, -1.0), "train", 7L))
      .toDF("vec_id", "v", "split", "cell")
      .withColumn("n", VectorOps.norm(col("v")))
    val got = VectorQueries.semLeakPairsOf(w)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.head._1 === 1L && got.head._2 === 2L && got.head._3 === 7L
      && math.abs(got.head._4 - 1.0) < 1e-12,
      s"planted dup must lead with sim ~ 1: ${got.toSeq}")
    assert(!got.exists(r => r._1 == 3L || r._2 == 4L),
      "cross-cell twin must be blocked out")
    assert(!got.exists(r => r._2 == 5L), "zero-norm vectors never pair")
    // Only train x test within a cell: (1,2), (6,2) possible here.
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 2L), (6L, 2L)))
    assert(got.map(_._4).toSeq === got.map(_._4).sortBy(-(_: Double)).toSeq)
  }

  test("sample_decontam_emb on the corpus: bounded, ordered, split-correct") {
    val rows = VectorQueries.decontamEmbedding(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= VectorQueries.SemLeakTopK)
    assert(rows.map(_._4).toSeq === rows.map(_._4).sortBy(-(_: Double)).toSeq)
    // Every reported id really is in the split its column claims.
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100
    }
    assert(rows.forall(r => bucket(r._1) < graft.queries.SampleOps.TrainPct))
    assert(rows.forall(r => bucket(r._2) >=
      graft.queries.SampleOps.TrainPct + graft.queries.SampleOps.ValidPct))
  }

  test("hybrid RRF fusion is consistent with its channels") {
    val rows = VectorQueries.hybrid(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= VectorQueries.HybridTopK)
    def rrf(r: Long) = if (r == 0L) 0L else 1000000L / (VectorQueries.HybridRrfC + r)
    rows.foreach { case (id, l, v, f) =>
      assert(id !== 0L, "the query document never retrieves itself")
      assert(l >= 0L && l <= VectorQueries.HybridPoolK)
      assert(v >= 0L && v <= VectorQueries.HybridPoolK)
      assert(l > 0L || v > 0L, "a fused row came from at least one channel")
      assert(f === rrf(l) + rrf(v), "fused score is exactly the integer RRF sum")
    }
    // The head is sorted by (fused desc, doc_id).
    val key = rows.map { case (id, _, _, f) => (-f, id) }
    assert(key.sameElements(key.sorted))
    // Channel consistency: the vector channel's rank-1 doc is the
    // brute-force cosine top-1.
    val bruteTop = VectorQueries.topK(spark, dir)
      .select("vec_id").as[Long].head()
    rows.find(_._3 == 1L).foreach { case (id, _, _, _) => assert(id === bruteTop) }
  }

  test("range search returns exactly the vectors above the radius, consistent with top-k") {
    val range = VectorQueries.rangeSearch(spark, dir)
      .as[(Long, Double)].collect()
    range.foreach { case (id, sim) =>
      assert(id != 0L && sim >= VectorQueries.RangeTau)
    }
    val key = range.map { case (id, sim) => (-sim, id) }
    assert(key.sameElements(key.sorted))
    // Every top-k hit above tau is in the range result with the same sim.
    val topk = VectorQueries.topK(spark, dir).as[(Long, Double)].collect()
      .filter(_._2 >= VectorQueries.RangeTau).toSet
    assert(topk.subsetOf(range.toSet))
  }

  test("retrieval pipeline: MMR permutation of the hybrid-style fused head") {
    val rows = VectorQueries.retrievalPipeline(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= VectorQueries.HybridTopK)
    // Ranks are the contiguous selection order; docs are distinct.
    assert(rows.map(_._1) === (1L to rows.size.toLong))
    assert(rows.map(_._2).distinct.size === rows.size)
    rows.foreach { case (_, doc, chunkIdx, hits, fused, rel, mmr) =>
      assert(doc != 0L, "the query document never retrieves itself")
      assert(fused > 0L, "every surfaced doc scored in some channel")
      // chunk −1 ⇔ zero lexical hits (vector-only docs).
      assert((chunkIdx == -1L) === (hits == 0L))
      assert(rel >= -1.0 && rel <= 1.0)
      // The λ=0.5 blend can never exceed pure relevance.
      assert(mmr <= rel + 1e-12)
    }
    // Seed = the most relevant pool member, reported with mmr == rel.
    assert(rows.head._6 === rows.head._7)
    assert(rows.head._6 === rows.map(_._6).max)
  }

  test("recall audit equals directly-computed intersections") {
    val audit = VectorQueries.recallAudit(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(audit.keySet === VectorQueries.RecallMethods.toSet)
    audit.values.foreach(h => assert(h >= 0L && h <= 10L))
    val truth = VectorQueries.topK(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select("vec_id").as[Long].collect().count(truth).toLong
    assert(audit("simsearch_sq8") === hits(VectorQueries.topKSq8(spark, dir)))
    assert(audit("simsearch_ivf") === hits(VectorQueries.topKIvf(spark, dir)))
  }

  test("filtered search honors the predicate and pushes it to the scan") {
    val df = VectorQueries.filteredSearch(spark, dir)
    val rows = df.as[(Long, Int, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (id, label, _) =>
      assert(id != 0L && label === VectorQueries.FilterLabel)
    }
    // The label predicate reaches the parquet scan (pre-vector-math
    // pruning — the filtered-ANN posture), visible as a pushed filter.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      s"label predicate must push into the scan:\n$plan")
    // Consistency with the unfiltered baseline: any top-k hit carrying
    // the filter label must appear here with the same similarity.
    val base = VectorQueries.topK(spark, dir).as[(Long, Double)].collect().toMap
    rows.foreach { case (id, _, sim) =>
      base.get(id).foreach(s => assert(s === sim))
    }
  }

  test("mmr re-ranking diversifies the pool with monotone greedy scores") {
    val rows = VectorQueries.mmr(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length === VectorQueries.MmrK)
    assert(rows.map(_._2).distinct.length === rows.length, "no repeats")
    val topIds = VectorQueries.topK(spark, dir).select("vec_id")
      .as[Long].collect()
    assert(rows.head._2 === topIds.head, "rank 1 is the pure-relevance top-1")
    assert(rows.head._3 === rows.head._4, "the seed's mmr is its relevance")
    // Greedy maximization over a shrinking candidate set with a growing
    // penalty term: scores are monotone non-increasing.
    val scores = rows.drop(1).map(_._4)
    assert(scores.sameElements(scores.sorted.reverse),
      s"greedy scores must not increase: ${scores.mkString(", ")}")
    // The diversification must actually bite on this corpus: the MMR
    // order differs from the pure top-k order.
    assert(!rows.map(_._2).sameElements(topIds.take(rows.length)))
  }

  test("k-center picks are distinct and the covering radius tightens monotonically") {
    val rows = VectorQueries.kCenter(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(rows.length === VectorQueries.KCenterRounds + 1)
    assert(rows.map(_._2).distinct.length === rows.length, "no vector chosen twice")
    assert(rows.head === ((0L, 0L, -2.0)), "the seed opens the sequence")
    // Greedy k-center: as the chosen set grows, the farthest remaining
    // point can only get nearer — far_sim is non-decreasing over ranks.
    val sims = rows.drop(1).map(_._3)
    assert(sims.sameElements(sims.sorted),
      s"covering radius must tighten monotonically: ${sims.mkString(", ")}")
  }

  test("incremental centroid merge equals the full rebuild exactly") {
    // Integer micro-unit sums are associative, so persisted history +
    // batch merge must reproduce the full-corpus build bit-for-bit —
    // the exact equivalence the shared oracle gates.
    val full = VectorQueries.centroids(spark, dir)
      .as[(Int, Long, Long, Long)].collect().toSet
    val incr = VectorQueries.centroidsIncremental(spark, dir)
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(incr === full)
  }
}
