package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps

/** Similarity search over the `embeddings` table (SURVEY.md §2.4):
  * brute-force cosine top-k as the correctness baseline, a bucketed
  * (IVF/LSH-style) variant as the scale path, and embedding-cosine
  * near-dup pairs.
  *
  * Scale posture: the query vector joins as a broadcast single-row
  * relation (never a driver-side collect of the corpus); the bucketed
  * variant prunes the scan to one bucket — the 1/2^bits fraction that
  * can contain sign-compatible neighbors — before scoring; near-dup
  * scoring is blocked by (sign-bucket quantizer, label), never
  * all-pairs across the corpus, and the cell size is tunable via
  * SignBits independent of corpus growth.
  *
  * Parity: embeddings are float32 in parquet; both engines cast to
  * DOUBLE before any arithmetic, and [[VectorOps]] folds in index order,
  * so cosine values are bit-identical and safe to compare and sort on.
  */
object VectorQueries {

  /** The embeddings table with the vector cast to array<double>. */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  private val QueryVecId = 0

  /** 2^SignBits buckets; 4 bits ≈ corpus/16 per bucket — at larger corpora
    * raise it so buckets stay O(corpus / desired-candidates).
    */
  val SignBits = 4

  /** Brute-force cosine top-10 against the query vector (vec_id 0),
    * broadcast to every scorer task.
    */
  def topK(spark: SparkSession, dir: String): DataFrame =
    topKOf(emb(spark, dir))

  /** [[topK]] over an explicit embeddings frame — the `*Of` core the
    * recall audit threads its ONE materialized base scan through.
    */
  private[queries] def topKOf(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Sign bucket over the first `bits` dimensions — a fixed-hyperplane
    * LSH / IVF-style coarse quantizer (deterministic, no trained
    * centroids needed for the harness).
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Bucketed ANN: score only vectors in the query's sign bucket.
    * Recall is partial by construction (that is the LSH trade); the
    * bucket is pruned before any vector math runs.
    */
  def topKBucketed(spark: SparkSession, dir: String): DataFrame =
    topKBucketedOf(emb(spark, dir))

  /** [[topKBucketed]] over an explicit embeddings frame. */
  private[queries] def topKBucketedOf(base: DataFrame): DataFrame = {
    val e = base.withColumn("bucket", signBucket(col("v"), SignBits))
    val q = e.filter(col("vec_id") === QueryVecId)
      .select(col("v").as("qv"), col("bucket").as("qbucket"))
    e.join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= QueryVecId)
      .select(col("vec_id"), col("bucket"), VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** IVF cell count / probed cells per query. 8 cells at harness scale;
    * production sizes this so each cell holds O(corpus / centroids)
    * vectors and raises probe count for recall.
    */
  val IvfCentroids = 8
  val IvfProbe = 2

  /** IVF-style ANN: assign every vector to its nearest centroid cell
    * (the inverted-file index build), then score ONLY the cells nearest
    * the query — the classic two-level ANN shape where scanned volume is
    * probe/centroids of the corpus, independent of top-k.
    *
    * The centroid set here is deterministic (vectors 1..IvfCentroids
    * standing in for an offline k-means artifact) so the whole pipeline
    * — assignment, probe selection, scoring — carries an exact DuckDB
    * oracle; production would broadcast trained centroids the same way.
    * Assignment ties break to the lowest centroid id on both engines
    * (`max_by` over (sim, -cid) ≡ ORDER BY sim DESC, cid), and null
    * cosines (zero-norm vectors) rank as -2 so even degenerate vectors
    * land in a deterministic cell. At scale the assignment is the stored
    * index (built once, reused per query), not recomputed per query.
    */
  /** Per-vector centroid similarities (the -2 sentinel keeps null
    * cosines orderable so every vector is assignable). `cents` is any
    * (cid, cv) frame — deterministic picks or trained centers; it is
    * broadcast either way, exactly how production ships an offline
    * k-means artifact to the scorer tasks.
    */
  private def ivfSims(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        coalesce(VectorOps.cosine(col("v"), col("cv")), lit(-2.0)).as("sim"),
        col("cid"))

  /** The fixed centroid set: vectors 1..IvfCentroids standing in for an
    * offline k-means artifact, which keeps the whole pipeline exactly
    * reproducible in the DuckDB oracle.
    */
  private def fixedCents(e: DataFrame): DataFrame =
    e.filter(col("vec_id").between(1, IvfCentroids))
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** Cell assignment over a per-(vector, centroid) similarity frame —
    * THE definition of the index's assignment semantics (max_by over
    * (sim, −cid): ties to the lowest centroid id, mirroring the
    * row_number twin in the oracle's cells CTE). The ONE copy every
    * IVF path and the cell-quality audit share, so a tie-break tweak
    * cannot desynchronize them.
    */
  private def cellsOf(sims: DataFrame): DataFrame =
    sims.groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("sim"), (-col("cid")).as("tb"))).as("cell"))

  /** The inverted-file index: every vector → its nearest centroid cell. */
  private[queries] def ivfAssignment(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    cellsOf(ivfSims(e, fixedCents(e)))
  }

  /** Two-level ANN over an arbitrary centroid frame: build the inverted
    * file, pick the `probe` cells nearest the query, score only those.
    */
  private[queries] def topKIvfWith(e: DataFrame, cents: DataFrame, probe: Int): DataFrame = {
    val sims = ivfSims(e, cents)
    val cells = cellsOf(sims)
    val probed = sims.filter(col("vec_id") === QueryVecId)
      .orderBy(desc("sim"), asc("cid")).limit(probe)
      .select(col("cid").as("cell"))
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    e.join(cells, "vec_id")
      .join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"), VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  def topKIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    topKIvfWith(e, fixedCents(e), IvfProbe)
  }

  /** IVF against a PERSISTED inverted file — the vector leg of the
    * persisted-index trilogy (`neardup_minhash_incr` for signatures,
    * `text_search_index` for postings): the per-vector cell assignment
    * is written ONCE as a parquet artifact PARTITIONED BY CELL, and
    * query time reads only the probed cells — the directory layout
    * itself enforces the probe/centroids scan fraction (the probe is a
    * broadcast join on the partition column, so Spark's dynamic
    * partition pruning skips the unprobed cells' files entirely;
    * a daily batch assigns only itself against the broadcast centroids
    * and appends its cells). The query's probe-cell selection touches
    * one vector × [[IvfCentroids]] rows. Scoring, tie-breaks, and the
    * final head are [[topKIvfWith]]'s exactly, so this twin shares
    * `simsearch_ivf`'s oracle — index-persist + probe ≡ direct
    * computation, gated as an exact value match.
    */
  def topKIvfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cents = fixedCents(e)
    val sims = ivfSims(e, cents)
    val out = graft.Scratch.dir("ivfindex")
    cellsOf(sims)
      .join(e, "vec_id")
      .select("cell", "vec_id", "v")
      .write.mode("overwrite").partitionBy("cell").parquet(out)
    val idx = spark.read.parquet(out)
    val probed = sims.filter(col("vec_id") === QueryVecId)
      .orderBy(desc("sim"), asc("cid")).limit(IvfProbe)
      .select(col("cid").as("cell"))
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    idx.join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      // cast: the partition column comes back int-inferred from the
      // directory names; the oracle's cell is BIGINT like the cid it
      // derives from.
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Delete slice for [[topKIvfMor]]: vectors with
    * `vec_id % IvfMorMod == IvfMorRem` are tombstoned (the remainder
    * avoids [[QueryVecId]]).
    */
  val IvfMorMod = 17
  val IvfMorRem = 5

  /** ANN index maintenance WITH DELETES — the operation every vector
    * store needs when documents are retracted (GDPR erasure, license
    * takedowns) and the index cannot be rebuilt per delete: the
    * cell-keyed inverted file lives as a [[graft.sources.SnapshotTable]]
    * generation, and a delete lands as ONE merge-on-read tombstone
    * commit ([[graft.sources.SnapshotTable.commitDeletes]]) — O(keys),
    * no index rewrite. Queries probe through `readMor`, so tombstoned
    * vectors are anti-joined out of the candidate scan and can never
    * be returned; generation 1 still time-travels to the pre-delete
    * index (the audit view), and a periodic materialization
    * (`commit(readMor(...))`) purges when tombstones accumulate — the
    * documented MoR lifecycle applied to the ANN index. Scoring and
    * the head are the shared IVF path; the oracle is the IVF oracle
    * with the delete predicate excluded relationally.
    */
  def topKIvfMor(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cents = fixedCents(e)
    val sims = ivfSims(e, cents)
    val table = {
      val p = graft.Scratch.dir("ivf_mor_table")
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      p
    }
    graft.sources.SnapshotTable.commit(
      cellsOf(sims).join(e, "vec_id").select("cell", "vec_id", "v"), table, 1L)
    graft.sources.SnapshotTable.commitDeletes(
      e.filter(col("vec_id") % IvfMorMod === IvfMorRem).select("vec_id"),
      table, 2L, carryFrom = 1L)
    val idx = graft.sources.SnapshotTable.readMor(spark, table, 2L, "vec_id")
    val probed = sims.filter(col("vec_id") === QueryVecId)
      .orderBy(desc("sim"), asc("cid")).limit(IvfProbe)
      .select(col("cid").as("cell"))
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    idx.join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Lloyd update rounds in [[trainedCents]] — fixed so the oracle can
    * unroll exactly this many assignment/update CTE pairs.
    */
  val IvfLloydRounds = 3

  /** K-means-trained centroids (the real IVF index build) as
    * DETERMINISTIC Lloyd iterations the DuckDB oracle unrolls exactly
    * — the same conversion `graph_lpa`/`graph_sssp` made for their
    * loops, applied to the one training step that was a black box:
    * init is the fixed-centroid recipe (vectors 1..k), each of
    * [[IvfLloydRounds]] rounds assigns every vector to its nearest
    * centroid (the shared [[cellsOf]] argmax, ties to the lowest cid)
    * and recomputes each cell's mean in FIXED-POINT: components floor
    * to micros once up front, per-(cell, dim) sums run over BIGINTs —
    * order-independent, so shuffle/aggregation order cannot perturb
    * the result — and the mean decodes through the identical IEEE
    * (sum / n / 1e6) double tree on both engines. An emptied cell
    * keeps its previous centroid, so k is stable. At scale this runs
    * offline exactly like the MLlib variant it replaces: the artifact
    * is k × dim doubles regardless of corpus size, each round is one
    * broadcast-crossJoin assignment plus one (cell, dim)-keyed partial
    * aggregation, and the tiny centroid frame localCheckpoints per
    * round so the lineage stays flat.
    */
  private[queries] def trainedCents(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val eq = e.select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"),
        floor(col("x") * lit(1000000.0)).cast("long").as("xi"))
    def update(prev: DataFrame): DataFrame = {
      val refreshed = eq
        .join(cellsOf(ivfSims(e, prev)), "vec_id")
        .groupBy(col("cell"), col("pos"))
        .agg(sum("xi").as("s"), count(lit(1)).as("n"))
        .select(col("cell"),
          struct(col("pos"),
            (col("s").cast("double") / col("n").cast("double") /
              lit(1000000.0)).as("cx")).as("pc"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(col("pc"))),
          s => s.getField("cx")).as("cv"))
        .select(col("cell").as("cid"), col("cv"))
      refreshed.unionByName(
        prev.join(refreshed.select("cid"), Seq("cid"), "left_anti"))
    }
    var cents = fixedCents(e)
    for (_ <- 1 to IvfLloydRounds)
      cents = update(cents).localCheckpoint()
    cents
  }

  /** Trained-IVF ANN: [[trainedCents]]' deterministic Lloyd centers
    * feeding the shared two-level probe/score path — value-gated
    * end-to-end (the oracle re-derives the training loop itself); the
    * spec's probe-all-cells ≡ brute-force property additionally pins
    * that the path is exact for ANY centroid set, trained or not.
    */
  def topKIvfTrained(spark: SparkSession, dir: String): DataFrame =
    topKIvfWith(emb(spark, dir), trainedCents(spark, dir), IvfProbe)

  /** Candidates the SQ8 path rescores exactly ([[topKSq8]]). */
  val Sq8Rescore = 30

  /** Per-dimension [min,max] codebook as one broadcastable row of two
    * dims-length arrays — the entire SQ8 "model" artifact, independent
    * of corpus size (like the IVF centroid set).
    */
  private def sq8Codebook(e: DataFrame): DataFrame =
    e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          s => s.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx")).as("mxs"))

  /** 8-bit codes for a vector column under the broadcast codebook
    * (`mns`/`mxs` in scope): code_d = floor((x−mn)·255/(mx−mn)), 0 for
    * degenerate dimensions. Shared with the spec's range assertion.
    */
  private[queries] def sq8Encode(v: Column): Column =
    transform(v, (x, i) => {
      val mn = element_at(col("mns"), i + 1)
      val mx = element_at(col("mxs"), i + 1)
      when(mx > mn, floor((x - mn) * lit(255.0) / (mx - mn))).otherwise(lit(0L))
    })

  /** Midpoint decode of [[sq8Encode]] codes: mn + (c+0.5)·(mx−mn)/255. */
  private[queries] def sq8Decode(codes: Column): Column =
    transform(codes, (c, i) => {
      val mn = element_at(col("mns"), i + 1)
      val mx = element_at(col("mxs"), i + 1)
      mn + (c + lit(0.5)) * (mx - mn) / lit(255.0)
    })

  /** Scalar-quantized (SQ8) ANN with exact rescoring — the embedding
    * COMPRESSION path: each component stores as an 8-bit code (4× less
    * than float32; at 100 TB the candidate scan reads the codes table,
    * and only survivors fetch their raw floats), candidates rank by
    * cosine against the query over midpoint-decoded codes (asymmetric
    * distance), and the top [[Sq8Rescore]] re-rank exactly. Every float
    * op is the same fixed IEEE expression tree on both engines, so the
    * whole pipeline — codebook, encode, decode, both rankings — carries
    * an exact DuckDB oracle; the spec additionally pins that rescoring
    * every candidate reproduces brute-force top-k for ANY codebook.
    */
  def topKSq8(spark: SparkSession, dir: String): DataFrame =
    topKSq8With(emb(spark, dir), Sq8Rescore)

  /** [[topKSq8]] with an explicit rescore depth (the spec sets it to the
    * corpus size to pin rescore-all ≡ brute-force).
    */
  private[queries] def topKSq8With(e: DataFrame, rescore: Int): DataFrame = {
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    val cand = e.filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(sq8Codebook(e)))
      .withColumn("codes", sq8Encode(col("v")))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("v"), col("qv"),
        VectorOps.cosine(sq8Decode(col("codes")), col("qv")).as("approx"))
      .orderBy(desc("approx"), asc("vec_id"))
      .limit(rescore)
    cand.select(col("vec_id"),
        VectorOps.cosine(col("v"), col("qv")).as("sim"),
        floor(col("approx") * lit(1000000.0)).cast("long").as("approx_ppm"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Product-quantization geometry: [[PqM]] subspaces of [[PqW]] dims
    * (64-dim embeddings), [[PqK]] sub-centroids per subspace, and the
    * exact-rescore depth. Like the IVF constants, these generate the
    * oracle SQL too.
    */
  val PqM = 8
  val PqW = 8
  val PqK = 16
  val PqRescore = 50

  /** Subspace m of a vector (1-based slice, width [[PqW]]). */
  private def sub(v: Column, m: Int): Column = slice(v, m * PqW + 1, PqW)

  /** Squared L2 via three native dot products — ‖a‖² − 2a·b + ‖b‖², the
    * exact IEEE tree the oracle mirrors (`pqL2Sql`).
    */
  private def l2sq(a: Column, b: Column): Column =
    (VectorOps.dot(a, a) - lit(2.0) * VectorOps.dot(a, b)) + VectorOps.dot(b, b)

  /** Unit-normalize a vector (zero-norm vectors pass through, matching
    * cosine's null there). PQ encodes in NORMALIZED space: for unit
    * vectors ‖q−x‖² = 2−2·cos(q,x), so the sub-L2 ADC ranking tracks the
    * cosine objective the rescore uses — on raw vectors the two metrics
    * disagree and candidate selection degrades to noise.
    */
  private def unit(v: Column): Column = {
    val n = VectorOps.norm(v)
    when(n > 0, transform(v, x => x / n)).otherwise(v)
  }

  /** Deterministic PQ sub-codebooks: the subspace slices of (normalized)
    * vectors 1..[[PqK]] stand in for per-subspace k-means artifacts (the
    * same move as [[fixedCents]]), which keeps encode, ADC, and rescore
    * all exactly reproducible in SQL. (cid, cv) rows, broadcast
    * everywhere.
    */
  private def pqCents(e: DataFrame): DataFrame =
    e.filter(col("vec_id").between(1, PqK))
      .select(col("vec_id").as("cid"), unit(col("v")).as("cv"))

  /** Per-(vector, centroid) sub-distances d0..d{M-1} in normalized
    * space, one row per pair. `frame` may be a pruned candidate set, but
    * `cents` must always be the FULL corpus' codebook — codes are only
    * comparable across queries when every vector encodes against the
    * same artifact.
    */
  private def pqSubDistsWith(frame: DataFrame, cents: DataFrame): DataFrame =
    // Normalize BEFORE the centroid cross join (mirroring the oracle's
    // `nv` CTE): projected after it, the norm+divisions would re-run
    // once per (vector, centroid) pair instead of once per vector.
    frame.select(col("vec_id"), unit(col("v")).as("vn"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id") +: col("cid") +:
        (0 until PqM).map(m => l2sq(sub(col("vn"), m), sub(col("cv"), m)).as(s"d$m")): _*)

  private def pqSubDists(e: DataFrame): DataFrame = pqSubDistsWith(e, pqCents(e))

  /** PQ-code aggregation over any per-(vector, centroid) sub-distance
    * frame (min_by over (distance, cid) per subspace).
    */
  private def pqCodesFrom(sd: DataFrame): DataFrame =
    sd.groupBy("vec_id")
      .agg(
        min_by(col("cid"), struct(col("d0"), col("cid"))).as("c0"),
        (1 until PqM).map(m =>
          min_by(col("cid"), struct(col(s"d$m"), col("cid"))).as(s"c$m")): _*)

  /** PQ codes per vector: for each subspace, the nearest sub-centroid id
    * (ties to the lowest cid — min_by over (distance, cid), the same
    * deterministic tie-break as the IVF assignment). M small integers
    * per vector — the 100 TB index artifact is M bytes/vector vs 4·dims
    * for raw float32 (16× smaller here), and this one aggregate builds
    * it in a single pass over the corpus×K cross join.
    */
  private[queries] def pqCodes(e: DataFrame): DataFrame =
    pqCodesFrom(pqSubDists(e))

  /** Product-quantized ANN with asymmetric distance + exact rescore —
    * the memory-side scale path next to [[topKSq8]]'s: candidates rank
    * by the ADC table lookup (the query's [[PqM]]×[[PqK]] sub-distance
    * table, a broadcast artifact computed once per query; per-vector
    * cost is M lookups on the M-byte code, the raw vector is never
    * touched), and only the top [[PqRescore]] fetch their floats for
    * exact cosine re-ranking. The four-term ADC sum is left-associated
    * on both engines, so the whole pipeline — codebook, encode, ADC,
    * both rankings — carries an exact DuckDB value oracle; the spec
    * additionally pins rescore-all ≡ brute-force (true for ANY codebook)
    * and the code range.
    */
  def topKPq(spark: SparkSession, dir: String): DataFrame =
    topKPqWith(emb(spark, dir), PqRescore)

  /** (vec_id, adist) for a candidate frame: encode the candidates
    * against the full-corpus codebook and sum the query's per-subspace
    * table lookups (K rows per subspace, broadcast) in fixed left-to-
    * right order.
    */
  /** ADC over an explicit code frame: join each vector's M codes to the
    * query's per-subspace distance table (K rows per subspace,
    * broadcast) and sum in fixed left-to-right order. Split out of
    * [[pqAdist]] so the persisted-index query ([[topKPqIndexed]]) scores
    * codes READ BACK from parquet through the identical expression tree.
    */
  private def pqAdistOf(codes: DataFrame, qsd: DataFrame): DataFrame = {
    // The query's M×K sub-distance table is a per-query CONSTANT-size
    // artifact (8×16 doubles here — the codebook/centroid precedent):
    // collect it once and inline each subspace's lookup as a literal
    // map, so the ADC scan is pure codegen'd expression work with ZERO
    // joins. The previous shape chained M broadcast joins — M broadcast
    // exchanges (and their driver jobs) per query for what is a 128-
    // value table lookup. The summation stays the same left-associated
    // `reduce(_ + _)` over the same doubles (map round-trip is exact),
    // so the shared simsearch_pq/ivfpq oracles are untouched.
    val rows = qsd.select(col("cid") +: (0 until PqM).map(m => col(s"d$m")): _*)
      .collect()
    // Degenerate query (no query vector → empty table): the join shape
    // produced an empty result; mirror it instead of building map()
    // (whose VOID type would fail analysis).
    if (rows.isEmpty)
      return codes.select(col("vec_id"), lit(null).cast("double").as("adist"))
        .filter(lit(false))
    val lookups = (0 until PqM).map { m =>
      map(rows.flatMap(r => Seq(lit(r.getLong(0)), lit(r.getDouble(m + 1)))): _*)
    }
    codes
      // try_element_at (not element_at): ANSI mode throws on a missing
      // map key; a code absent from the table (a stale persisted code
      // index after a codebook change) must DROP like the old inner
      // join dropped it, not kill the query — nulls propagate through
      // the sum and the filter removes them.
      .withColumn("adist",
        (0 until PqM).map(m => try_element_at(lookups(m), col(s"c$m"))).reduce(_ + _))
      .filter(col("adist").isNotNull)
      .select("vec_id", "adist")
  }

  private def pqAdist(e: DataFrame, candidates: DataFrame): DataFrame = {
    val cb = pqCents(e)
    pqAdistOf(pqCodesFrom(pqSubDistsWith(candidates, cb)),
      pqSubDistsWith(e.filter(col("vec_id") === QueryVecId), cb))
  }

  /** [[topKPq]] with an explicit rescore depth (the spec sets it to the
    * corpus size to pin rescore-all ≡ brute-force).
    */
  private[queries] def topKPqWith(e: DataFrame, rescore: Int): DataFrame =
    pqRescoreTail(e,
      pqAdist(e, e.filter(col("vec_id") =!= QueryVecId).select("vec_id", "v"))
        .orderBy(asc("adist"), asc("vec_id")).limit(rescore))

  /** The exact-rescore tail shared by the direct ([[topKPqWith]]) and
    * persisted-index ([[topKPqIndexed]]) PQ paths — ONE implementation
    * because the two registered twins share `simsearch_pq`'s oracle, so
    * any tweak to the rescore depth, tie-break, or adist_micro scaling
    * must hit both or the shared-oracle gate breaks.
    */
  private def pqRescoreTail(e: DataFrame, cand: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    e.join(cand, "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorOps.cosine(col("v"), col("qv")).as("sim"),
        floor(col("adist") * lit(1000000.0)).cast("long").as("adist_micro"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** PQ against a PERSISTED code index — completing the incremental
    * matrix for compressed vectors ([[topKIvfIndexed]]'s contract on
    * the compression axis): the sub-codebooks and every vector's
    * M-byte code persist ONCE as the index artifact (codes are M small
    * ints per vector — no raw floats beyond the [[PqK]] codebook rows),
    * and query time encodes only ITSELF against the read-back codebook,
    * ADC-scores the persisted codes, and fetches raw floats for the
    * top [[PqRescore]] survivors only — the cost profile a daily batch
    * keeps as history grows (encode the batch, append its codes).
    * Codebook doubles and code ids round-trip parquet exactly and the
    * ADC sum is the same left-associated tree, so this shares
    * `simsearch_pq`'s oracle: index-persist + probe ≡ direct
    * computation, gated as an exact value match.
    */
  def topKPqIndexed(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val out = graft.Scratch.dir("pqindex")
    pqCents(e).write.mode("overwrite").parquet(s"$out/codebook")
    pqCodesFrom(pqSubDistsWith(
        e.filter(col("vec_id") =!= QueryVecId).select("vec_id", "v"), pqCents(e)))
      .write.mode("overwrite").parquet(s"$out/codes")
    val cb = spark.read.parquet(s"$out/codebook")
    val codes = spark.read.parquet(s"$out/codes")
    val qsd = pqSubDistsWith(e.filter(col("vec_id") === QueryVecId), cb)
    pqRescoreTail(e, pqAdistOf(codes, qsd)
      .orderBy(asc("adist"), asc("vec_id")).limit(PqRescore))
  }

  /** IVF ∘ PQ — the standard production ANN layout: the inverted file
    * prunes the corpus to the probed cells (scanned volume =
    * probe/centroids, the IVF axis), then PQ's ADC ranks ONLY those
    * candidates from their M-byte codes (the compression axis), and the
    * top [[PqRescore]] survivors rescore exactly. Both index artifacts —
    * cell assignment and codes — are per-vector and built offline at
    * scale; the per-query cost is the probed cells' code rows plus
    * [[PqRescore]] raw-float fetches. Deterministic centroids and
    * sub-codebooks keep the whole composition exactly value-oracled;
    * the spec pins probe-all + rescore-all ≡ brute force (cells
    * partition the corpus and ADC only selects candidates, so the
    * degenerate configuration must agree exactly for ANY artifacts).
    */
  def topKIvfPq(spark: SparkSession, dir: String): DataFrame =
    topKIvfPqWith(emb(spark, dir), IvfProbe, PqRescore)

  /** [[topKIvfPq]] with explicit probe width and rescore depth. */
  private[queries] def topKIvfPqWith(e: DataFrame, probe: Int, rescore: Int): DataFrame = {
    val sims = ivfSims(e, fixedCents(e))
    val cells = cellsOf(sims)
    val probed = sims.filter(col("vec_id") === QueryVecId)
      .orderBy(desc("sim"), asc("cid")).limit(probe)
      .select(col("cid").as("cell"))
    val cand = e.join(cells, "vec_id")
      .join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= QueryVecId)
    val ranked = pqAdist(e, cand.select("vec_id", "v"))
      .orderBy(asc("adist"), asc("vec_id")).limit(rescore)
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    e.join(cells, "vec_id")
      .join(ranked, "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        VectorOps.cosine(col("v"), col("qv")).as("sim"),
        floor(col("adist") * lit(1000000.0)).cast("long").as("adist_micro"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Embedding-cosine near-dup: top-20 most similar pairs within each
    * (sign-bucket, label) block. The coarse quantizer ([[signBucket]],
    * the same expression the bucketed ANN uses) is the primary blocking
    * key: label-only blocks grow linearly with the corpus, so pairs
    * within them grow quadratically — the quantizer splits each label
    * into 2^SignBits cells, and raising SignBits keeps cells (hence
    * pair counts) bounded as the corpus scales. True near-dups are
    * sign-compatible on the leading dimensions by construction, so the
    * block boundary loses only non-candidates.
    */
  def nearDup(spark: SparkSession, dir: String): DataFrame = {
    // Norms are per-vector: compute them once BEFORE the pair join
    // instead of letting cosine() re-derive both inside every pair
    // (3 dot products per pair -> 1). Same doubles, same oracle.
    val e = emb(spark, dir)
      .withColumn("n", VectorOps.norm(col("v")))
      .withColumn("bucket", signBucket(col("v"), SignBits))
    val a = e.select(col("vec_id").as("a"), col("label"), col("bucket"),
      col("v").as("va"), col("n").as("na"))
    val b = e.select(col("vec_id").as("b"), col("label").as("label_b"),
      col("bucket").as("bucket_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("bucket") === col("bucket_b") && col("label") === col("label_b")
        && col("a") < col("b"))
      .select(col("a"), col("b"), col("label"),
        when(col("na") > 0 && col("nb") > 0,
          VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .as("sim"))
      .orderBy(desc("sim"), asc("a"), asc("b"))
      .limit(20)
  }

  /** Incremental embedding near-dup — [[graft.queries.DedupOps]]'
    * `minhashIncremental` contract for the raw-vector modality,
    * completing the incremental matrix across every near-dup family:
    * the history (train split) persists ONCE as the index artifact,
    * PARTITIONED BY the sign-bucket blocking key (vectors +
    * precomputed norms — for embeddings the vectors ARE the index,
    * exactly what an ANN store keeps), and the incoming batch computes
    * only its own buckets and norms, then joins the persisted index on
    * (bucket, label) — the standard shuffle-on-key join, so per-batch
    * pair volume tracks batch × block size, never history². The
    * bucket-partitioned layout additionally makes per-block index
    * maintenance file-local (appending a block touches one directory)
    * and lets a SELECTIVE batch — one touching few buckets, the daily
    * norm — prune unprobed history files by broadcasting its bucket
    * set, the `simsearch_ivf_incr` move; the registered query's batch
    * spans most buckets, so its plan is the plain co-partitioned join.
    * Doubles round-trip parquet
    * exactly, so the whole chain keeps an exact value oracle. Output:
    * top-20 (new_vec, old_vec) cosine pairs — the verify-stage input a
    * daily crawl would confirm before appending its own vectors to the
    * index.
    */
  def nearDupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
      .withColumn("n", VectorOps.norm(col("v")))
      .withColumn("bucket", signBucket(col("v"), SignBits))
      .withColumn("split", SampleOps.splitOf(SampleOps.bucketOf(col("vec_id"))))
    val out = graft.Scratch.dir("embindex")
    e.filter(col("split") === "train")
      .select("bucket", "label", "vec_id", "v", "n")
      .write.mode("overwrite").partitionBy("bucket").parquet(out)
    // cast: the partition column comes back int-inferred from the
    // directory names; the batch side's bucket is BIGINT.
    val idx = spark.read.parquet(out)
      .select(col("bucket").cast("long").as("bucket"), col("label"),
        col("vec_id").as("old_vec"), col("v").as("vh"), col("n").as("nh"))
    e.filter(col("split") =!= "train")
      .select(col("bucket"), col("label"), col("vec_id").as("new_vec"),
        col("v").as("vb"), col("n").as("nb"))
      .join(idx, Seq("bucket", "label"))
      .select(col("new_vec"), col("old_vec"), col("label"),
        when(col("nb") > 0 && col("nh") > 0,
          VectorOps.dot(col("vb"), col("vh")) / (col("nb") * col("nh"))).as("sim"))
      .orderBy(desc("sim"), asc("new_vec"), asc("old_vec"))
      .limit(20)
  }

  /** Pairs reported by [[decontamEmbedding]]. */
  val SemLeakTopK = 20

  /** Embedding-level (semantic) train←test decontamination — the audit
    * the n-gram `sample_decontam` cannot perform: a paraphrased or
    * re-tokenized test document shares no trigrams with its train-side
    * twin but still sits next to it in embedding space. Every vector
    * gets the SAME content-keyed split the corpus uses
    * ([[SampleOps.bucketOf]] over its id) and the SAME inverted-file
    * cell assignment the ANN family builds ([[ivfAssignment]]);
    * candidate pairs are train×test WITHIN a cell only — the blocked,
    * bounded expansion (Σ over cells of |train|·|test|, the IVF recall
    * trade [[topKBucketed]] documents) instead of the full cross join —
    * and the report is the top-[[SemLeakTopK]] most-similar cross-split
    * pairs a release gate reviews before training. Norms are
    * precomputed per vector (the [[nearDup]] move: 1 dot product per
    * pair, not 3), cosines are the shared [[VectorOps]] doubles, so
    * the oracle is exact. At 100 TB the cell assignment is the stored
    * IVF index and the split rides the stored corpus buckets — this
    * query is one blocked join over two artifacts that already exist.
    */
  def decontamEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val sp = emb(spark, dir)
      .withColumn("n", VectorOps.norm(col("v")))
      .withColumn("bucket", SampleOps.bucketOf(col("vec_id")))
      .withColumn("split", SampleOps.splitOf(col("bucket")))
    semLeakPairsOf(sp.join(ivfAssignment(spark, dir), Seq("vec_id")))
  }

  /** [[decontamEmbedding]]'s pairing over an arbitrary
    * `(vec_id, v, n, split, cell)` frame (exposed so tests can plant
    * known leaks without the corpus).
    */
  private[queries] def semLeakPairsOf(w: DataFrame): DataFrame = {
    val tr = w.filter(col("split") === "train")
      .select(col("vec_id").as("train_vec"), col("cell"),
        col("v").as("tv"), col("n").as("tn"))
    val te = w.filter(col("split") === "test")
      .select(col("vec_id").as("test_vec"), col("cell"),
        col("v").as("xv"), col("n").as("xn"))
    tr.join(te, Seq("cell"))
      .select(col("train_vec"), col("test_vec"), col("cell"),
        when(col("tn") > 0 && col("xn") > 0,
          VectorOps.dot(col("tv"), col("xv")) / (col("tn") * col("xn")))
          .as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(desc("sim"), asc("train_vec"), asc("test_vec"))
      .limit(SemLeakTopK)
  }

  /** Per-label centroid accumulation — the offline index-build /
    * class-prototype shape: posexplode to (label, dimension, component),
    * then one shuffle keyed by (label, pos). Shuffle volume is
    * rows × dims regardless of vector count per label, and the per-group
    * state is two longs — the layout a 100 TB corpus needs (a
    * collect_list-of-vectors formulation would hold whole labels in one
    * task's memory).
    *
    * Components are surfaced as exact micro-unit sums (floor(x·1e6) per
    * element, summed as BIGINT): double summation is order-sensitive and
    * partitioned execution has no order, while the quantize-then-integer
    * route is deterministic on any engine — same trick as the text ppm
    * metrics. The mean is sum_micro/cnt on the consumer side.
    */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    centroidSums(emb(spark, dir)).orderBy("label", "pos")

  /** The (label, dimension) micro-sum aggregation stage — ONE
    * implementation shared by the full build ([[centroids]]) and the
    * incremental merge ([[centroidsIncremental]]) so the two registered
    * twins (and their common oracle) cannot desynchronize.
    */
  private def centroidSums(df: DataFrame): DataFrame =
    df.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        floor(col("x") * lit(1000000.0)).as("micro"))
      .groupBy("label", "pos")
      .agg(sum(col("micro")).as("sum_micro"), count(lit(1)).as("cnt"))

  /** Incremental centroid maintenance — the mini-batch update of the
    * class-prototype index: the HISTORY corpus's per-(label, dimension)
    * micro-sums and counts are the persisted artifact (exactly what
    * [[centroids]] emits — sums, not means, BECAUSE sums merge); the
    * incoming batch aggregates only itself and the merge is one
    * addition per (label, pos) cell. Integer micro-unit sums are
    * associative, so persisted-history + batch is EXACTLY the full
    * rebuild — this query shares [[centroids]]' oracle, making
    * index-persist + merge ≡ direct a gated exact equivalence (the
    * `simsearch_ivf_incr` contract applied to the centroid artifact).
    * The split buckets stand in for the two corpora as everywhere else.
    *
    * Scale shape: history is never re-scanned (labels × dims rows read
    * back, corpus-independent); batch-side cost tracks the batch; the
    * merge is a join-free union + one aggregation over two
    * constant-size inputs.
    */
  def centroidsIncremental(spark: SparkSession, dir: String): DataFrame = {
    val s = emb(spark, dir)
      .withColumn("split", SampleOps.splitOf(SampleOps.bucketOf(col("vec_id"))))
    val out = graft.Scratch.dir("centroidindex")
    centroidSums(s.filter(col("split") === "train"))
      .write.mode("overwrite").parquet(out)
    centroidSums(s.filter(col("split") =!= "train"))
      .unionByName(spark.read.parquet(out))
      .groupBy("label", "pos")
      .agg(sum("sum_micro").as("sum_micro"), sum("cnt").as("cnt"))
      .orderBy("label", "pos")
  }

  /** Components [[embedPca]] reports (mirrored in its oracle). */
  val PcaTopK = 4

  /** PCA over the embedding cloud — the dense-linear-algebra pass an
    * embedding pipeline runs before whitening, dimensionality
    * reduction, or index tuning (how much variance do the leading
    * directions carry?). Two stages with very different scales, split
    * accordingly:
    *
    *  1. '''Corpus-sized''': ONE scan accumulating the first/second
    *     moment sums in floor-micro integer units via the native
    *     [[graft.functions.GramSumsAgg]] `TypedImperativeAggregate` —
    *     d + d² longs mutated IN PLACE in one flat buffer (zero
    *     per-row allocation) with map-side partial merge, nothing
    *     row-proportional past the exchange, and integer sums are
    *     order-insensitive so the numbers are bit-identical to
    *     DuckDB's recompute (and to the typed [[graft.functions
    *     .GramSums]] streaming twin — GramSumsSpec pins it).
    *  2. '''KB-sized''': the d×d covariance assembled from those
    *     integers (C = S2u/(1e6·n) − m·mᵀ, m = S1u/(1e6·n)) is
    *     eigendecomposed on the DRIVER by deterministic cyclic Jacobi
    *     ([[graft.operators.Jacobi]]) — the matrix never grows with
    *     the corpus, so driver-side is the right side.
    *
    * Value gate (the r16 sketch-band technique): eigenvalues have no
    * SQL twin, so the row binds (a) the EXACT integer aggregates the
    * oracle recomputes — n, the Gram trace, the mean-magnitude sum —
    * and (b) booleans holding the spectral CONTRACT: per-component
    * eigen residual ‖C·v − λ·v‖∞ inside tolerance, orthonormality
    * against all previous components, descending eigenvalue order, and
    * top-k explained variance bounded by the trace with λ_k above the
    * PSD noise floor. A wrong aggregation breaks the exact columns; a
    * wrong decomposition breaks a boolean.
    */
  def embedPca(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.embeddings(spark, dir).select(col("embedding"))
    // Emptiness-safe dim probe: a bare head() on an empty table would
    // throw NoSuchElementException before the diagnostic require below.
    val firstDim = raw.select(size(col("embedding"))).limit(1).collect()
    require(firstDim.nonEmpty, "embed_pca needs a non-empty embeddings table")
    val d = firstDim.head.getInt(0)
    require(d >= PcaTopK,
      s"embed_pca reports $PcaTopK components but the embeddings carry " +
        s"only dim $d - reduce PcaTopK or use a wider embedding column")
    val g = raw
      .select(graft.functions.GramSumsAgg(col("embedding"), d).as("g"))
      .head().getStruct(0)
    val n = g.getLong(0)
    val s1 = g.getSeq[Long](1)
    val s2 = g.getSeq[Long](2)
    require(n > 0, "embed_pca needs a non-empty embeddings table")

    val mean = Array.tabulate(d)(i => s1(i).toDouble / (1e6 * n))
    val cov = Array.tabulate(d, d)((i, j) =>
      s2(i * d + j).toDouble / (1e6 * n) - mean(i) * mean(j))
    val (evals, evecs) = graft.operators.Jacobi.eigh(cov)

    val trace = (0 until d).map(i => cov(i)(i)).sum
    val scale = math.max(1.0, cov.map(_.map(math.abs).max).max)
    def residOf(c: Int): Double = {
      val v = evecs(c); val l = evals(c)
      (0 until d).map(i =>
        math.abs((0 until d).map(j => cov(i)(j) * v(j)).sum - l * v(i))).max
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.lazyZip(b).map(_ * _).sum
    val gramTraceUnits = (0 until d).map(i => s2(i * d + i)).sum
    val meanAbsUnits = s1.map(math.abs).sum
    val explainedOk = evals.take(PcaTopK).sum <= trace + 1e-9 * scale &&
      evals(PcaTopK - 1) >= -1e-9 * scale
    val rows = (0 until PcaTopK).map { c =>
      val orthoOk = math.abs(dot(evecs(c), evecs(c)) - 1.0) <= 1e-9 &&
        (0 until c).forall(p => math.abs(dot(evecs(c), evecs(p))) <= 1e-9)
      (c.toLong, n, gramTraceUnits, meanAbsUnits,
        residOf(c) <= 1e-8 * scale, orthoOk,
        c == PcaTopK - 1 || evals(c) >= evals(c + 1), explainedOk)
    }
    rows.toDF("component", "n_vecs", "gram_trace_units", "mean_abs_units",
      "eigen_resid_ok", "ortho_ok", "order_ok", "explained_ok")
      .orderBy("component")
  }

  /** STREAMING moment accumulation — [[embedPca]]'s corpus-sized stage
    * executed as a real incremental streaming query, putting TWO
    * so-far-ungated surfaces under the value gate at once:
    *
    *  1. the built-in FILE streaming source with `maxFilesPerTrigger`
    *     admission control (every other stream drill tails the
    *     snapshot connector) — the staged embedding files arrive one
    *     per micro-batch;
    *  2. a CUSTOM typed `Aggregator`'s buffer living in the streaming
    *     state store across micro-batches (the gated streaming classes
    *     so far are built-in operators and flatMapGroupsWithState; a
    *     user aggregation's partial-merge contract in streaming is its
    *     own class).
    *
    * The oracle is one exact row: n and the floor-micro Gram-trace /
    * mean-magnitude sums recomputed by DuckDB over the raw table.
    * Integer associativity is precisely what makes the incremental
    * per-batch merges bit-identical to the one-shot batch fold — the
    * same argument `stream_hourly` makes for decimal sums, here for
    * d+d² longs of user-defined state.
    */
  def streamMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // freshDirs, not bare Scratch.dir: a same-JVM rerun (the bench
    // times every query at least twice) would otherwise resume run
    // 1's complete-mode state from the stale checkpoint and silently
    // DOUBLE the sums against newly-staged (uuid-named) files.
    val Seq(staging, ckpt) = graft.streaming.StreamDrill.freshDirs(spark,
      "stream_moments_staging", "stream_moments_ckpt")
    val raw = Tables.embeddings(spark, dir).select(col("embedding"))
    val firstDim = raw.select(size(col("embedding"))).limit(1).collect()
    require(firstDim.nonEmpty, "stream_moments needs a non-empty embeddings table")
    val d = firstDim.head.getInt(0)
    raw.repartition(3).write.mode("overwrite").parquet(staging)

    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "embedding ARRAY<FLOAT>"))
      .option("maxFilesPerTrigger", 1)
      .parquet(staging)
      .as[Seq[Float]]
    val agg = new graft.functions.GramSums(d)
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val last = new java.util.concurrent.atomic.AtomicReference[
      graft.functions.GramBuf](null)
    val q = src.groupByKey(_ => 0).agg(agg.toColumn)
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[(Int, graft.functions.GramBuf)],
            _: Long) =>
          val rows = b.collect()
          if (rows.nonEmpty) { last.set(rows.head._2); batches.incrementAndGet() }
          ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    require(batches.get() >= 2L,
      s"stream_moments must cover >= 2 micro-batches (saw ${batches.get()}) " +
        "or the cross-batch state-merge claim is vacuous")
    val buf = last.get()
    require(buf != null && buf.n > 0, "stream_moments saw no data")
    Seq((buf.n,
      (0 until d).map(i => buf.s2(i * d + i)).sum,
      buf.s1.map(math.abs).sum))
      .toDF("n_vecs", "gram_trace_units", "mean_abs_units")
  }

  /** Label predicate for [[filteredSearch]]. */
  val FilterLabel = 1

  /** Filtered vector search — the production retrieval mode plain ANN
    * benchmarks ignore: top-k under a METADATA predicate ("nearest
    * passages from source X / label L"). The predicate applies BEFORE
    * any vector math (Catalyst pushes it into the scan — at scale the
    * label is a partition/cluster column of the stored index, so the
    * filter prunes files, the same mechanism `simsearch_ivf_incr`
    * proves for cell pruning), which sidesteps filtered-ANN's classic
    * failure mode: post-filtering a top-k list until too few survivors
    * remain. Scoring is the brute baseline over the filtered subset;
    * composing the same predicate into the IVF path is the documented
    * scale route.
    */
  def filteredSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= QueryVecId && col("label") === FilterLabel)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Similarity floor for [[rangeSearch]]. */
  val RangeTau = 0.28

  /** Radius (threshold) search — the retrieval mode top-k cannot
    * express: ALL vectors within a similarity radius of the query,
    * however many there are. Top-k answers "the 10 nearest"; range
    * answers "everything closer than τ" — the primitive behind
    * duplicate-radius sweeps and recall-controlled candidate
    * generation. One scan, broadcast query row, map-side predicate —
    * the filter prunes before any ordering, so the only ordered data is
    * the survivors. At scale the same τ-predicate composes with the IVF
    * cell pruning (`simsearch_ivf`'s scan fraction) unchanged.
    */
  def rangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .filter(col("sim") >= RangeTau)
      .orderBy(desc("sim"), asc("vec_id"))
  }

  /** [[mmr]] knobs: candidate-pool depth, selections, and the λ = 0.5
    * relevance/diversity trade (0.5 is a power of two, so the blend's
    * double arithmetic is identical on every IEEE engine).
    */
  val MmrPool = 25
  val MmrK = 10

  /** Maximal-marginal-relevance re-ranking — the diversification pass a
    * RAG retriever runs on its candidate pool so the k returned
    * passages aren't k near-copies of the best one: greedily pick the
    * candidate maximizing λ·relevance − (1−λ)·max-similarity-to-
    * already-selected. The corpus-scale work (scoring the pool, the
    * pool's pairwise similarities) is distributed; the greedy loop runs
    * over the COLLECTED constant-size pool (25 rels + ≤ 25² sims — a
    * model-artifact-sized value, the codebook/centroid precedent), which
    * is exactly how production re-rankers operate. Fully deterministic:
    * total (score desc, id) order each round, exact-λ arithmetic, and
    * the oracle unrolls the greedy rounds into generated CTEs.
    */
  def mmr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    val pool = e.filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), VectorOps.cosine(col("v"), col("qv")).as("rel"))
      .filter(col("rel").isNotNull)
      .orderBy(desc("rel"), asc("vec_id"))
      .limit(MmrPool)
      .localCheckpoint()
    val pv = pool.join(e.select(col("vec_id"), col("v")), Seq("vec_id"))
    val rels = pool.as[(Long, Double)].collect()
    val sims = pv.as("x").crossJoin(pv.as("y"))
      .filter(col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        VectorOps.cosine(col("x.v"), col("y.v")).as("s"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    // Greedy: seed with the most relevant, then λ-blend each round.
    val first = rels.minBy { case (id, r) => (-r, id) }
    var selected = Vector((1L, first._1, first._2, first._2))
    while (selected.length < math.min(MmrK, rels.length)) {
      val chosen = selected.map(_._2).toSet
      val pick = rels.iterator.filterNot(c => chosen(c._1)).map { case (id, r) =>
        val near = chosen.iterator.map(s => sims((id, s))).max
        (id, r, 0.5 * r - 0.5 * near)
      }.minBy { case (id, _, m) => (-m, id) }
      selected = selected :+ ((selected.length + 1L, pick._1, pick._2, pick._3))
    }
    selected.toDF("rank", "vec_id", "rel", "mmr").orderBy("rank")
  }

  /** Points selected by [[kCenter]] beyond the seed. */
  val KCenterRounds = 6

  /** Greedy k-center (farthest-point) coreset selection — the
    * diversity-sampling pass a data-curation pipeline runs to pick a
    * maximally-spread subset of an embedded corpus (dedup keeps the
    * corpus non-redundant; THIS keeps a SAMPLE representative): start
    * from the seed vector, then [[KCenterRounds]] times pick the vector
    * whose nearest already-chosen center is farthest away (here:
    * smallest maximum cosine, ties to the lowest id — a total order,
    * so the greedy sequence is fully deterministic). The classic
    * 2-approximation to the k-center objective.
    *
    * Scale shape: each round is ONE corpus scan scoring against the
    * broadcast chosen set (≤ k rows — a model-artifact-sized
    * broadcast), a partial-aggregated per-vector max, and a
    * TakeOrderedAndProject argmin; driver traffic is one row per round
    * (the `pagerankLoop` probe posture). Zero-norm vectors coalesce to
    * similarity 1.0 (nearest possible), so degenerate rows are never
    * selected as "far". The oracle unrolls the rounds into generated
    * CTEs — the BPE/pagerank technique.
    *
    * Output: selection order, the chosen vector, and its max similarity
    * to the previously-chosen set (the covering-radius trace; the seed
    * reports the −2.0 sentinel).
    */
  def kCenter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).localCheckpoint()
    var chosen = Seq((0L, QueryVecId.toLong, -2.0))
    for (round <- 1 to KCenterRounds) {
      val chosenDf = chosen.map(_._2).toDF("cid")
        .join(e.select(col("vec_id").as("cid"), col("v").as("cv")), Seq("cid"))
      val pick = e
        .filter(!col("vec_id").isin(chosen.map(_._2): _*))
        .crossJoin(broadcast(chosenDf))
        .select(col("vec_id"),
          coalesce(VectorOps.cosine(col("v"), col("cv")), lit(1.0)).as("sim"))
        .groupBy("vec_id")
        .agg(max(col("sim")).as("near"))
        .orderBy(asc("near"), asc("vec_id"))
        .limit(1)
        .as[(Long, Double)]
        .collect()
        .head
      chosen = chosen :+ ((round.toLong, pick._1, pick._2))
    }
    chosen.toDF("rank", "vec_id", "far_sim").orderBy("rank")
  }

  /** Index variants audited by [[recallAudit]]: ONE structure carries
    * both the registry name (which must hold an exact oracle in the
    * base map — the composed audit oracle dereferences it) and the
    * query function, so the Spark audit and the oracle composition
    * cannot fall out of sync by a one-sided edit.
    */
  private val RecallAudited: Seq[(String, DataFrame => DataFrame)] =
    Seq("simsearch_bucketed" -> ((e: DataFrame) => topKBucketedOf(e)),
      "simsearch_ivf" -> ((e: DataFrame) => topKIvfWith(e, fixedCents(e), IvfProbe)),
      "simsearch_sq8" -> ((e: DataFrame) => topKSq8With(e, Sq8Rescore)),
      "simsearch_pq" -> ((e: DataFrame) => topKPqWith(e, PqRescore)),
      "simsearch_ivfpq" -> ((e: DataFrame) => topKIvfPqWith(e, IvfProbe, PqRescore)))

  val RecallMethods: Seq[String] = RecallAudited.map(_._1)

  /** ANN recall self-audit — the measure-don't-guess number every index
    * deployment tracks: recall@10 of each approximate variant against
    * the brute-force ground truth, as an exact intersection count. The
    * per-method top-10s and the truth set are all deterministic
    * registered queries, so the audit is itself exactly value-oracled —
    * and its oracle is COMPOSED from the methods' own oracle strings,
    * so the audit can never disagree with the per-method gates about
    * what each method returns. At scale this is the recurring job that
    * decides probe widths and rescore depths from a sampled query log.
    *
    * The embeddings base is materialized ONCE (`localCheckpoint`) and
    * threaded through every member's `*Of`/`*With` core, so the truth
    * pass and the five audited methods stop re-reading and re-casting
    * the same corpus six times — the audited semantics are untouched
    * (each core is the registered query's own body over the shared
    * frame, and this audit's oracle still embeds the members' oracle
    * strings verbatim).
    */
  def recallAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).localCheckpoint()
    // The truth set is semi-joined against EVERY audited method: without
    // materialization the brute-force pipeline would be planned (and
    // run) once per member. Ten rows — driver-scale.
    val truth = topKOf(e).select("vec_id").localCheckpoint()
    RecallAudited.map { case (name, fn) =>
      fn(e).select("vec_id")
        .join(truth, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits_at_10"))
        .select(lit(name).as("method"), col("hits_at_10"))
    }.reduce(_ unionByName _).orderBy("method")
  }

  /** [[hybrid]] constants: how many of the query document's terms the
    * lexical channel keeps (the most SELECTIVE ones — lowest doc
    * frequency — the standard query-term-selection pruning that bounds
    * per-query work no matter how long the query document is), the
    * per-channel candidate pool depth, the standard RRF dampening
    * constant (k = 60 from the original reciprocal-rank-fusion
    * formulation), and the fused head size.
    */
  val HybridQTerms = 8
  val HybridPoolK = 50
  val HybridRrfC = 60
  val HybridTopK = 10

  /** Hybrid retrieval — the fusion shape every production RAG/search
    * stack runs: a LEXICAL channel (documents sharing the query
    * document's rare terms, scored by the same integer tf·idf as
    * `text_search_rank`) and a VECTOR channel (cosine to the query
    * document's embedding) each produce a ranked candidate pool, and
    * reciprocal-rank fusion combines them —
    * fused = Σ 10⁶ div ([[HybridRrfC]] + rank) — so a document strong
    * in either channel surfaces even when the other channel misses it
    * entirely (synonyms defeat the lexical side; rare proper nouns
    * defeat the embedding side). Integer RRF keeps the fusion
    * value-oracled; a rank of 0 in the output marks "absent from that
    * channel's pool".
    *
    * Scale shape: the query document's term set reduces to the
    * [[HybridQTerms]] most selective terms (df computed by one
    * wordcount-class aggregation, the 8-row result broadcast), so the
    * scoring side is a bounded-factor semi-join of the corpus against
    * 8 terms followed by wordcount-class shuffles — rows flow through
    * aggregations, no posting LIST ever materializes; both channel
    * pools are TakeOrderedAndProject heads ranked only AFTER the cut
    * (the row_number window runs over [[HybridPoolK]] rows, never the
    * corpus); the fusion is a full-outer join of two 50-row relations.
    */
  def hybrid(spark: SparkSession, dir: String): DataFrame = {
    val qid = QueryVecId.toLong
    // Vector channel.
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === qid).select(col("v").as("qv"))
    val vr = e.filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"), VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(desc("sim"), asc("doc_id"))
      .limit(HybridPoolK)
      .withColumn("vrank", row_number().over(Window.orderBy(desc("sim"), asc("doc_id"))))
      .select("doc_id", "vrank")
    // Lexical channel: tokens bound to an attribute before the explode
    // (the shared HOF perf contract); explode_outer + isNotNull keeps
    // InferFiltersFromGenerate from re-inlining the token tree.
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull)
    val qTerms = tok.filter(col("doc_id") === qid).select("w").distinct()
    val qsel = tok.join(broadcast(qTerms), "w")
      .groupBy("w")
      .agg(count_distinct(col("doc_id")).as("df"))
      .orderBy(asc("df"), asc("w"))
      .limit(HybridQTerms)
    val lr = tok.filter(col("doc_id") =!= qid)
      .join(broadcast(qsel), "w")
      .groupBy("doc_id", "w", "df").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(sum(expr("tf * (1000000 div df)")).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(HybridPoolK)
      .withColumn("lrank", row_number().over(Window.orderBy(desc("score"), asc("doc_id"))))
      .select("doc_id", "lrank")
    lr.join(vr, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lrank").cast("long"), lit(0L)).as("lex_rank"),
        coalesce(col("vrank").cast("long"), lit(0L)).as("vec_rank"),
        (coalesce(expr(s"1000000 div ($HybridRrfC + lrank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($HybridRrfC + vrank)"), lit(0L))).as("fused"))
      .orderBy(desc("fused"), asc("doc_id"))
      .limit(HybridTopK)
  }

  /** The composed RAG retrieval pipeline — `pipeline_corpus` /
    * `pipeline_media`'s contract for the retrieval stack, in ONE Spark
    * DAG with every constant shared with the standalone queries:
    *
    *  1. '''embed-join''': the retrievable corpus is documents ∩
    *     embeddings (doc_id = vec_id) — exactly the subset a vector
    *     index can serve.
    *  2. '''hybrid channels''': the lexical channel ([[HybridQTerms]]
    *     rarest query-document terms, integer tf·idf) and the vector
    *     channel (cosine), each a [[HybridPoolK]]-deep
    *     TakeOrderedAndProject pool — [[hybrid]]'s exact shapes over
    *     the embedded corpus.
    *  3. '''RRF fusion''' ([[HybridRrfC]]) → the [[HybridTopK]] head.
    *  4. '''chunk provenance''': for each fused document, the
    *     best-matching non-overlapping [[TextOps.ChunkTokens]]-token
    *     chunk (most selected-term hits, ties to the earliest chunk) —
    *     the passage a RAG prompt would actually stuff; documents
    *     surfaced by the vector channel alone may have zero lexical
    *     hits and report chunk −1.
    *  5. '''MMR re-rank''' of the fused head by embedding cosine
    *     (λ = 0.5, [[mmr]]'s exact greedy: total (score, id) order,
    *     power-of-two λ) — the diversification pass before the prompt.
    *
    * Scale shape: stages 1–4 are the members' own bounded plans (no
    * posting lists, broadcast 8-term selection, pools cut BEFORE any
    * window rank, the chunk stage touches only the 10 fused documents);
    * stage 5's greedy runs over the COLLECTED ≤ [[HybridTopK]]-row pool
    * (≤ 90 pairwise sims) — the model-artifact-sized driver loop the
    * standalone [[mmr]] already documents. The oracle rebuilds every
    * stage from the same constants, with the MMR rounds unrolled into
    * generated CTEs.
    */
  def retrievalPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qid = QueryVecId.toLong
    val e = emb(spark, dir)
    val ev = e.select(col("vec_id").as("doc_id"), col("v"))
    val corpus = Tables.documents(spark, dir).join(ev, Seq("doc_id"))
    val q = e.filter(col("vec_id") === qid).select(col("v").as("qv"))
    // Vector channel (hybrid's, over the embedded corpus).
    val vr = corpus.filter(col("doc_id") =!= qid)
      .crossJoin(broadcast(q))
      .select(col("doc_id"), VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(desc("sim"), asc("doc_id"))
      .limit(HybridPoolK)
      .withColumn("vrank", row_number().over(Window.orderBy(desc("sim"), asc("doc_id"))))
      .select("doc_id", "vrank")
    // Lexical channel (hybrid's shape and guards — see hybrid's doc for
    // the explode_outer/binding contract). The per-(doc, term) tf frame
    // is the ONE corpus tokenization every lexical stage consumes
    // (query terms, df selection, scoring) — materialized once; the
    // r12 shape re-planned the tokenize+explode subtree per consumer.
    // Posting-list length IS the term's df (one row per (doc, term)),
    // so no second corpus pass for df either.
    val tf = corpus
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val qTerms = tf.filter(col("doc_id") === qid).select("w")
    // The 8-row term selection feeds BOTH the lexical scorer and the
    // chunk-provenance stage; materialize it once.
    val qsel = tf.join(broadcast(qTerms), "w")
      .groupBy("w")
      .agg(count(lit(1)).as("df"))
      .orderBy(asc("df"), asc("w"))
      .limit(HybridQTerms)
      .localCheckpoint()
    val lr = tf.filter(col("doc_id") =!= qid)
      .join(broadcast(qsel.select("w", "df")), "w")
      .groupBy("doc_id")
      .agg(sum(expr("tf * (1000000 div df)")).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(HybridPoolK)
      .withColumn("lrank", row_number().over(Window.orderBy(desc("score"), asc("doc_id"))))
      .select("doc_id", "lrank")
    // RRF fusion → the head every later stage consumes (materialized:
    // three references).
    val fh = lr.join(vr, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(expr(s"1000000 div ($HybridRrfC + lrank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($HybridRrfC + vrank)"), lit(0L))).as("fused"))
      .orderBy(desc("fused"), asc("doc_id"))
      .limit(HybridTopK)
      .localCheckpoint()
    // Chunk provenance over the 10 fused docs only.
    val bestChunk = corpus.join(broadcast(fh.select("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "w")))
      .select(col("doc_id"),
        expr(s"pos div ${TextOps.ChunkTokens}").cast("long").as("chunk_idx"), col("w"))
      .join(broadcast(qsel.select("w")), "w")
      .groupBy("doc_id", "chunk_idx").agg(count(lit(1)).as("chunk_hits"))
      .groupBy("doc_id")
      .agg(max_by(struct(col("chunk_idx"), col("chunk_hits")),
        struct(col("chunk_hits"), (-col("chunk_idx")).as("tb"))).as("bc"))
      .select(col("doc_id"), col("bc.chunk_idx").as("chunk_idx"),
        col("bc.chunk_hits").as("chunk_hits"))
    // MMR pool: fused head + cosine relevance (zero-norm rows drop, as
    // in mmr); pairwise sims over ≤ HybridTopK rows.
    val pool = fh.join(ev, "doc_id")
      .crossJoin(broadcast(q))
      .select(col("doc_id"), col("fused"), VectorOps.cosine(col("v"), col("qv")).as("rel"))
      .filter(col("rel").isNotNull)
      .localCheckpoint()
    val pv = pool.select("doc_id", "rel").join(ev, Seq("doc_id"))
    val rels = pool.select("doc_id", "rel").as[(Long, Double)].collect()
    val sims = pv.as("x").crossJoin(pv.as("y"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        VectorOps.cosine(col("x.v"), col("y.v")).as("s"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val ranked =
      if (rels.isEmpty) Seq.empty[(Long, Long, Double, Double)]
      else {
        val first = rels.minBy { case (id, r) => (-r, id) }
        var selected = Vector((1L, first._1, first._2, first._2))
        while (selected.length < math.min(HybridTopK, rels.length)) {
          val chosen = selected.map(_._2).toSet
          val pick = rels.iterator.filterNot(c => chosen(c._1)).map { case (id, r) =>
            val near = chosen.iterator.map(s => sims((id, s))).max
            (id, r, 0.5 * r - 0.5 * near)
          }.minBy { case (id, _, m) => (-m, id) }
          selected = selected :+ ((selected.length + 1L, pick._1, pick._2, pick._3))
        }
        selected
      }
    ranked.toDF("rank", "doc_id", "rel", "mmr")
      .join(fh, "doc_id")
      .join(bestChunk, Seq("doc_id"), "left")
      .select(col("rank"), col("doc_id"),
        coalesce(col("chunk_idx"), lit(-1L)).as("chunk_idx"),
        coalesce(col("chunk_hits"), lit(0L)).as("chunk_hits"),
        col("fused"), col("rel"), col("mmr"))
      .orderBy("rank")
  }

  /** IVF index-quality audit — the third leg of the evaluation family
    * next to the recall self-audits (`simsearch_recall` measures
    * retrieval, `neardup_lsh_recall` candidate generation; THIS
    * measures the index structure itself): per cell, the occupancy
    * (balance — probe cost variance and the worst cell's scan volume
    * at query time) and the coherence of its members (floor-micros
    * cosine of each vector to its own centroid — min/mean-via-sum/max;
    * the -2 sentinel keeps zero-norm vectors countable). A lopsided
    * occupancy column says re-train the centroids; a low-coherence
    * cell says raise the probe width. One corpus×centroids scan and
    * one |cells|-row aggregate; exact value oracle over the shared
    * cells CTE.
    */
  def cellQuality(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val sims = ivfSims(e, fixedCents(e))
    val cells = cellsOf(sims).withColumnRenamed("vec_id", "cvid")
    sims.join(cells, col("vec_id") === col("cvid") && col("cid") === col("cell"))
      .select(col("cell"), floor(col("sim") * lit(1000000.0)).cast("long").as("sm"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vec"), sum("sm").as("sim_micro_sum"),
        min("sm").as("min_sim_micro"), max("sm").as("max_sim_micro"))
      .orderBy("cell")
  }

  /** Query-batch size and neighbors per query for [[knnBatch]]. */
  val KnnQueries = 5
  val KnnK = 5

  /** Batch k-NN: top-[[KnnK]] cosine neighbors for EVERY query of a
    * batch at once — the retrieval shape an embedding-dedup or RAG
    * indexing job runs over millions of queries, vs the single-query
    * baselines above. The query batch broadcasts like any model
    * artifact; one corpus scan scores each row against the whole batch
    * in-task; and the per-query top-k rides the bounded
    * [[graft.functions.TopKAgg]] aggregator — each partition forwards
    * ≤ k rows per query, so the shuffle carries
    * O(queries × k × partitions) rows where a window-rank formulation
    * would sort a corpus-sized partition per query. Null cosines
    * (zero-norm vectors) are skipped on both sides.
    */
  def knnBatch(spark: SparkSession, dir: String): DataFrame = {
    val topk = graft.functions.TopKAgg.asUdaf(KnnK)
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < KnnQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val agg = e.filter(col("vec_id") >= KnnQueries)
      .crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .groupBy("qid")
      .agg(topk(col("sim"), col("vec_id")).as("top"))
    graft.functions.TopKAgg.exploded(agg, "top", Seq("qid"))
      .select(col("qid"), col("rank"),
        col("key").as("vec_id"), col("score").as("sim"))
      .orderBy("qid", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "simsearch_knn_batch" -> (knnBatch _),
    "simsearch_hybrid" -> (hybrid _),
    "pipeline_retrieval" -> (retrievalPipeline _),
    "simsearch_cells" -> (cellQuality _),
    "sample_kcenter" -> (kCenter _),
    "simsearch_range" -> (rangeSearch _),
    "simsearch_filtered" -> (filteredSearch _),
    "simsearch_mmr" -> (mmr _),
    "simsearch_recall" -> (recallAudit _),
    "embed_centroids" -> (centroids _),
    "embed_centroids_incr" -> (centroidsIncremental _),
    "embed_pca" -> (embedPca _),
    "stream_moments" -> (streamMoments _),
    "simsearch_topk" -> (topK _),
    "simsearch_bucketed" -> (topKBucketed _),
    "simsearch_ivf" -> (topKIvf _),
    "simsearch_ivf_incr" -> (topKIvfIndexed _),
    "simsearch_ivf_mor" -> (topKIvfMor _),
    "simsearch_ivf_trained" -> (topKIvfTrained _),
    "simsearch_sq8" -> (topKSq8 _),
    "simsearch_pq" -> (topKPq _),
    "simsearch_pq_incr" -> (topKPqIndexed _),
    "simsearch_ivfpq" -> (topKIvfPq _),
    "neardup_embedding" -> (nearDup _),
    "neardup_embedding_incr" -> (nearDupIncremental _),
    "sample_decontam_emb" -> (decontamEmbedding _),
  )

  private val CastEmb = "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"

  /** Shared by `simsearch_ivf` and `simsearch_ivf_incr`: the persisted-
    * index path stores and re-reads the same assignment, so one oracle
    * pins both — and pins their equivalence.
    */
  /** Shared CTE chain `e, cents, sims, cells` — the inverted-file
    * assignment every IVF-family oracle (and the embedding decontam)
    * rides, generated once so the cell definition cannot drift.
    */
  private lazy val duckCellsCtes: String =
    s"""e AS ($CastEmb),
       |cents AS (SELECT vec_id AS cid, v AS cv FROM e
       |          WHERE vec_id BETWEEN 1 AND $IvfCentroids),
       |sims AS (
       |  SELECT e.vec_id, c.cid,
       |    coalesce(${VectorOps.cosineSql("e.v", "c.cv")}, -2.0) AS sim
       |  FROM e CROSS JOIN cents c),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
       |    FROM sims) t WHERE rn = 1)""".stripMargin

  private lazy val duckIvfSql: String =
    s"""WITH $duckCellsCtes,
       |probe AS (SELECT cid AS cell FROM sims WHERE vec_id = $QueryVecId
       |          ORDER BY sim DESC, cid LIMIT $IvfProbe),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
       |SELECT x.vec_id, cells.cell, ${VectorOps.cosineSql("x.v", "qv")} AS sim
       |FROM e x
       |JOIN cells ON x.vec_id = cells.vec_id
       |JOIN probe ON cells.cell = probe.cell
       |CROSS JOIN q
       |WHERE x.vec_id <> $QueryVecId
       |ORDER BY sim DESC, x.vec_id LIMIT 10""".stripMargin

  /** The trained-IVF oracle: [[trainedCents]]' Lloyd loop UNROLLED as
    * [[IvfLloydRounds]] materialized CTE pairs (assign `a{r}` from
    * sims `s{r}`, update `c{r+1}`), exactly the `graph_lpa` recipe.
    * Fixed-point micros (floored BIGINTs) make the per-cell sums
    * order-independent, and the mean decodes through the identical
    * IEEE `sum / n / 1e6` tree, so the centers — and therefore the
    * final probe/score head — hash-match exactly. Emptied cells carry
    * their previous centroid, mirroring the Spark union.
    */
  private lazy val duckIvfTrainedSql: String = {
    def simsCte(c: String): String =
      s"""SELECT e.vec_id, c.cid,
         |    coalesce(${VectorOps.cosineSql("e.v", "c.cv")}, -2.0) AS sim
         |  FROM e CROSS JOIN $c c""".stripMargin
    def assignCte(s: String): String =
      s"""SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
         |  FROM $s) t WHERE rn = 1""".stripMargin
    val rounds = (0 until IvfLloydRounds).map { r =>
      s"""s$r AS MATERIALIZED (
         |  ${simsCte(s"c$r")}),
         |a$r AS MATERIALIZED (
         |  ${assignCte(s"s$r")}),
         |u$r AS MATERIALIZED (
         |  SELECT cell AS cid, list(cx ORDER BY pos) AS cv FROM (
         |    SELECT a.cell, q.pos,
         |      CAST(sum(q.xi) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0 AS cx
         |    FROM eq q JOIN a$r a ON q.vec_id = a.vec_id
         |    GROUP BY a.cell, q.pos) GROUP BY cell),
         |c${r + 1} AS MATERIALIZED (
         |  SELECT * FROM u$r
         |  UNION ALL
         |  SELECT cid, cv FROM c$r WHERE cid NOT IN (SELECT cid FROM u$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($CastEmb),
       |eq AS MATERIALIZED (
       |  SELECT vec_id, unnest(range(1, len(v) + 1)) AS pos,
       |    CAST(floor(unnest(v) * 1000000.0) AS BIGINT) AS xi FROM e),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
       |       WHERE vec_id BETWEEN 1 AND $IvfCentroids),
       |$rounds,
       |fs AS MATERIALIZED (
       |  ${simsCte(s"c$IvfLloydRounds")}),
       |fcells AS (
       |  ${assignCte("fs")}),
       |probe AS (SELECT cid AS cell FROM fs WHERE vec_id = $QueryVecId
       |          ORDER BY sim DESC, cid LIMIT $IvfProbe),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
       |SELECT x.vec_id, fcells.cell, ${VectorOps.cosineSql("x.v", "qv")} AS sim
       |FROM e x
       |JOIN fcells ON x.vec_id = fcells.vec_id
       |JOIN probe ON fcells.cell = probe.cell
       |CROSS JOIN q
       |WHERE x.vec_id <> $QueryVecId
       |ORDER BY sim DESC, x.vec_id LIMIT 10""".stripMargin
  }

  /** The IVF oracle with the MoR delete slice excluded relationally —
    * tombstoned vectors must never be candidates.
    */
  private lazy val duckIvfMorSql: String =
    s"""WITH $duckCellsCtes,
       |probe AS (SELECT cid AS cell FROM sims WHERE vec_id = $QueryVecId
       |          ORDER BY sim DESC, cid LIMIT $IvfProbe),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
       |SELECT x.vec_id, cells.cell, ${VectorOps.cosineSql("x.v", "qv")} AS sim
       |FROM e x
       |JOIN cells ON x.vec_id = cells.vec_id
       |JOIN probe ON cells.cell = probe.cell
       |CROSS JOIN q
       |WHERE x.vec_id <> $QueryVecId
       |  AND x.vec_id % $IvfMorMod <> $IvfMorRem
       |ORDER BY sim DESC, x.vec_id LIMIT 10""".stripMargin

  /** DuckDB twin of [[signBucket]] (generated from the same SignBits). */
  private def bucketSql(v: String): String =
    (0 until SignBits)
      .map(i => s"(CASE WHEN $v[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")

  /** DuckDB twin of [[sub]] (1-based inclusive slice). */
  private def pqSubSql(v: String, m: Int): String =
    s"($v)[${m * PqW + 1}:${(m + 1) * PqW}]"

  /** DuckDB twin of [[unit]]: same guard, same per-element division by
    * the identical norm value.
    */
  private def unitSql(v: String): String = {
    val n = s"sqrt(${VectorOps.dotSql(v, v)})"
    s"CASE WHEN $n > 0 THEN list_transform($v, x -> x / $n) ELSE $v END"
  }

  /** Shared PQ oracle fragments (generated from PqM/PqW/PqK). */
  private def pqDCases(vn: String, cv: String): String =
    (0 until PqM).map(m =>
      s"WHEN $m THEN ${pqL2Sql(pqSubSql(vn, m), pqSubSql(cv, m))}").mkString(" ")
  private val pqAdistSumSql: String =
    (0 until PqM).map(m => s"max(CASE WHEN m = $m THEN d END)")
      .reduce((a, b) => s"($a + $b)")
  private val pqMmSql: String = s"SELECT unnest([${(0 until PqM).mkString(", ")}]) AS m"

  /** DuckDB twin of [[l2sq]] — the identical IEEE tree. */
  private def pqL2Sql(a: String, b: String): String =
    s"((${VectorOps.dotSql(a, a)}) - 2.0 * (${VectorOps.dotSql(a, b)})) + (${VectorOps.dotSql(b, b)})"

  // Long-form twin of the wide Spark plan: the per-subspace CASE picks
  // the same l2sq tree, row_number's (d, cid) order is min_by's
  // (d, cid) struct min, and the ADC sum is left-associated on both
  // sides. All geometry constants interpolate from PqM/PqW/PqK. Shared
  // by simsearch_pq and its persisted-index twin simsearch_pq_incr
  // (codes/codebook round-trip parquet exactly, so index + probe must
  // equal the direct computation value-for-value).
  private lazy val duckPqSql: String =
    s"""WITH e AS ($CastEmb),
         |cents AS (SELECT vec_id AS cid, ${unitSql("v")} AS cv FROM e
         |          WHERE vec_id BETWEEN 1 AND $PqK),
         |nv AS (SELECT vec_id, ${unitSql("v")} AS vn FROM e),
         |mm AS ($pqMmSql),
         |sd AS (
         |  SELECT nv.vec_id, c.cid, mm.m, CASE mm.m ${pqDCases("nv.vn", "c.cv")} END AS d
         |  FROM nv CROSS JOIN cents c CROSS JOIN mm),
         |codes AS (
         |  SELECT vec_id, m, cid AS code FROM (
         |    SELECT vec_id, m, cid,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
         |    FROM sd) t WHERE rn = 1),
         |qd AS (SELECT m, cid, d FROM sd WHERE vec_id = $QueryVecId),
         |joined AS (
         |  SELECT codes.vec_id, codes.m, qd.d
         |  FROM codes JOIN qd ON codes.m = qd.m AND codes.code = qd.cid),
         |adist AS (
         |  SELECT vec_id, $pqAdistSumSql AS adist FROM joined GROUP BY vec_id),
         |cand AS (SELECT vec_id, adist FROM adist WHERE vec_id <> $QueryVecId
         |         ORDER BY adist, vec_id LIMIT $PqRescore),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
         |SELECT x.vec_id, ${VectorOps.cosineSql("x.v", "qv")} AS sim,
         |  CAST(floor(cand.adist * 1000000.0) AS BIGINT) AS adist_micro
         |FROM e x JOIN cand ON x.vec_id = cand.vec_id CROSS JOIN q
         |ORDER BY sim DESC, x.vec_id LIMIT 10""".stripMargin

  /** DuckDB twin of [[mmr]]: pool + pairwise sims as CTEs, then the
    * greedy rounds unrolled — each round's argmax over the remaining
    * pool with the λ-blend rendered from the same constants.
    */
  private val duckMmrSql: String = {
    val rounds = (2 to MmrK).map { i =>
      s"""cand$i AS (
         |  SELECT p.vec_id, p.rel, 0.5 * p.rel - 0.5 * max(ps.s) AS mmr
         |  FROM pool p
         |  JOIN ps ON ps.a = p.vec_id
         |  JOIN acc${i - 1} s ON ps.b = s.vec_id
         |  WHERE p.vec_id NOT IN (SELECT vec_id FROM acc${i - 1})
         |  GROUP BY p.vec_id, p.rel),
         |sel$i AS (
         |  SELECT CAST($i AS BIGINT) AS rank, vec_id, rel, mmr
         |  FROM cand$i ORDER BY mmr DESC, vec_id LIMIT 1),
         |acc$i AS MATERIALIZED (SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($CastEmb),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId),
       |pool AS MATERIALIZED (
       |  SELECT vec_id, ${VectorOps.cosineSql("v", "qv")} AS rel
       |  FROM e CROSS JOIN q
       |  WHERE vec_id <> $QueryVecId
       |    AND ${VectorOps.cosineSql("v", "qv")} IS NOT NULL
       |  ORDER BY rel DESC, vec_id LIMIT $MmrPool),
       |pv AS (SELECT pool.vec_id, pool.rel, e.v FROM pool JOIN e USING (vec_id)),
       |ps AS MATERIALIZED (
       |  SELECT x.vec_id AS a, y.vec_id AS b, ${VectorOps.cosineSql("x.v", "y.v")} AS s
       |  FROM pv x JOIN pv y ON x.vec_id <> y.vec_id),
       |acc1 AS (
       |  SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel, rel AS mmr
       |  FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
       |$rounds
       |SELECT rank, vec_id, rel, mmr FROM acc$MmrK ORDER BY rank""".stripMargin
  }

  /** DuckDB twin of [[retrievalPipeline]]: embed-join corpus, hybrid's
    * channel/fusion CTEs restricted to it, the chunk-provenance argmax
    * as a deterministic window rank, and the MMR rounds unrolled over
    * the fused pool (the [[duckMmrSql]] generator technique — acc CTEs
    * MATERIALIZED, rounds from the same constants). Every limit,
    * dampening constant, chunk width, and tie-break renders from the
    * Scala values the Spark stages use.
    */
  private val duckRetrievalSql: String = {
    val rounds = (2 to HybridTopK).map { i =>
      s"""cand$i AS (
         |  SELECT p.doc_id, p.rel, 0.5 * p.rel - 0.5 * max(ps.s) AS mmr
         |  FROM pool p
         |  JOIN ps ON ps.a = p.doc_id
         |  JOIN acc${i - 1} s ON ps.b = s.doc_id
         |  WHERE p.doc_id NOT IN (SELECT doc_id FROM acc${i - 1})
         |  GROUP BY p.doc_id, p.rel),
         |sel$i AS (
         |  SELECT CAST($i AS BIGINT) AS rank, doc_id, rel, mmr
         |  FROM cand$i ORDER BY mmr DESC, doc_id LIMIT 1),
         |acc$i AS MATERIALIZED (SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($CastEmb),
       |c AS MATERIALIZED (
       |  SELECT d.doc_id, d.text, e.v FROM documents d
       |  JOIN e ON d.doc_id = e.vec_id),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId),
       |vs AS (
       |  SELECT doc_id, ${VectorOps.cosineSql("v", "qv")} AS sim
       |  FROM c CROSS JOIN q WHERE doc_id <> $QueryVecId),
       |vr AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS vrank
       |  FROM vs WHERE sim IS NOT NULL),
       |tok AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |  FROM c),
       |qt AS (SELECT DISTINCT w FROM tok WHERE doc_id = $QueryVecId),
       |qsel AS MATERIALIZED (
       |  SELECT tok.w, count(DISTINCT tok.doc_id) AS df
       |  FROM tok JOIN qt USING (w) GROUP BY tok.w
       |  ORDER BY df, w LIMIT $HybridQTerms),
       |tf AS (
       |  SELECT doc_id, tok.w, qsel.df, count(*) AS tf
       |  FROM tok JOIN qsel ON tok.w = qsel.w
       |  WHERE doc_id <> $QueryVecId GROUP BY doc_id, tok.w, qsel.df),
       |lex AS (
       |  SELECT doc_id, CAST(sum(tf * (1000000 // df)) AS BIGINT) AS score
       |  FROM tf GROUP BY doc_id),
       |lr AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lrank
       |  FROM lex),
       |fh AS MATERIALIZED (
       |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    CAST(coalesce(1000000 // ($HybridRrfC + lrank), 0)
       |      + coalesce(1000000 // ($HybridRrfC + vrank), 0) AS BIGINT) AS fused
       |  FROM (SELECT * FROM lr WHERE lrank <= $HybridPoolK) l
       |  FULL OUTER JOIN (SELECT * FROM vr WHERE vrank <= $HybridPoolK) v
       |    ON l.doc_id = v.doc_id
       |  ORDER BY fused DESC, doc_id LIMIT $HybridTopK),
       |ptok AS (
       |  SELECT c.doc_id, i - 1 AS pos, tk[i] AS w FROM (
       |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |    FROM c JOIN fh USING (doc_id)) c,
       |    LATERAL unnest(range(1, len(tk) + 1)) t(i)),
       |ch AS (
       |  SELECT p.doc_id, p.pos // ${TextOps.ChunkTokens} AS chunk_idx,
       |         count(*) AS chunk_hits
       |  FROM ptok p JOIN qsel ON p.w = qsel.w
       |  GROUP BY p.doc_id, p.pos // ${TextOps.ChunkTokens}),
       |bsel AS (
       |  SELECT doc_id, chunk_idx, chunk_hits FROM (
       |    SELECT doc_id, chunk_idx, chunk_hits,
       |      row_number() OVER (PARTITION BY doc_id
       |                         ORDER BY chunk_hits DESC, chunk_idx) AS rn
       |    FROM ch) WHERE rn = 1),
       |pool AS MATERIALIZED (
       |  SELECT fh.doc_id, fh.fused, ${VectorOps.cosineSql("c.v", "qv")} AS rel
       |  FROM fh JOIN c USING (doc_id) CROSS JOIN q
       |  WHERE ${VectorOps.cosineSql("c.v", "qv")} IS NOT NULL),
       |pv AS (SELECT pool.doc_id, pool.rel, c.v FROM pool JOIN c USING (doc_id)),
       |ps AS MATERIALIZED (
       |  SELECT x.doc_id AS a, y.doc_id AS b, ${VectorOps.cosineSql("x.v", "y.v")} AS s
       |  FROM pv x JOIN pv y ON x.doc_id <> y.doc_id),
       |acc1 AS (
       |  SELECT CAST(1 AS BIGINT) AS rank, doc_id, rel, rel AS mmr
       |  FROM pool ORDER BY rel DESC, doc_id LIMIT 1),
       |$rounds
       |SELECT a.rank, a.doc_id,
       |  CAST(coalesce(b.chunk_idx, -1) AS BIGINT) AS chunk_idx,
       |  CAST(coalesce(b.chunk_hits, 0) AS BIGINT) AS chunk_hits,
       |  pool.fused, a.rel, a.mmr
       |FROM acc$HybridTopK a
       |JOIN pool USING (doc_id)
       |LEFT JOIN bsel b USING (doc_id)
       |ORDER BY a.rank""".stripMargin
  }

  /** DuckDB twin of [[kCenter]]: the greedy rounds unrolled into
    * generated CTEs (chosen-set join, per-vector max similarity, the
    * total-order argmin, cumulative union) — each round rendered from
    * the same constants and the shared cosine tree.
    */
  private val duckKCenterSql: String = {
    val rounds = (1 to KCenterRounds).map { i =>
      s"""cset$i AS (SELECT e.vec_id, e.v AS cv FROM e JOIN ch${i - 1} USING (vec_id)),
         |cand$i AS (
         |  SELECT x.vec_id, max(coalesce(${VectorOps.cosineSql("x.v", "c.cv")}, 1.0)) AS near
         |  FROM e x, cset$i c
         |  WHERE x.vec_id NOT IN (SELECT vec_id FROM ch${i - 1})
         |  GROUP BY x.vec_id),
         |pick$i AS (
         |  SELECT CAST($i AS BIGINT) AS rank, vec_id, near AS far_sim
         |  FROM cand$i ORDER BY near, vec_id LIMIT 1),
         |ch$i AS MATERIALIZED (SELECT * FROM ch${i - 1} UNION ALL SELECT * FROM pick$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($CastEmb),
       |ch0 AS (SELECT CAST(0 AS BIGINT) AS rank,
       |        CAST($QueryVecId AS BIGINT) AS vec_id, -2.0 AS far_sim),
       |$rounds
       |SELECT rank, vec_id, far_sim FROM ch$KCenterRounds ORDER BY rank""".stripMargin
  }

  // float→double is exact, x*1e6 is one IEEE-defined multiply, floor
  // and BIGINT sums are integer-exact — no engine can disagree. sum()
  // widens to HUGEINT in DuckDB; cast back to Spark's BIGINT. Shared by
  // the full build and the incremental merge (see the map entries).
  private val CentroidsSql: String =
    s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |x AS (SELECT label, unnest(v) AS xv,
       |        unnest(range(1, len(v) + 1)) AS i FROM e)
       |SELECT label, i - 1 AS pos,
       |  CAST(sum(CAST(floor(xv * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micro,
       |  count(*) AS cnt
       |FROM x GROUP BY label, i ORDER BY label, pos""".stripMargin

  private val baseOracle: Map[String, String] = Map(
    "sample_kcenter" -> duckKCenterSql,
    "simsearch_mmr" -> duckMmrSql,
    "pipeline_retrieval" -> duckRetrievalSql,
    "simsearch_range" ->
      s"""WITH e AS ($CastEmb),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
         |SELECT vec_id, ${VectorOps.cosineSql("v", "qv")} AS sim
         |FROM e CROSS JOIN q
         |WHERE vec_id <> $QueryVecId
         |  AND ${VectorOps.cosineSql("v", "qv")} >= $RangeTau
         |ORDER BY sim DESC, vec_id""".stripMargin,
    "simsearch_filtered" ->
      s"""WITH e AS ($CastEmb),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
         |SELECT vec_id, label, ${VectorOps.cosineSql("v", "qv")} AS sim
         |FROM e CROSS JOIN q
         |WHERE vec_id <> $QueryVecId AND label = $FilterLabel
         |  AND ${VectorOps.cosineSql("v", "qv")} IS NOT NULL
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    // Both channel pools are rank-filtered AFTER a fully tie-broken
    // order (≡ Spark's limit-then-rank); RRF arithmetic is all-integer.
    "simsearch_hybrid" ->
      s"""WITH e AS ($CastEmb),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId),
         |vs AS (
         |  SELECT vec_id AS doc_id, ${VectorOps.cosineSql("v", "qv")} AS sim
         |  FROM e CROSS JOIN q WHERE vec_id <> $QueryVecId),
         |vr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS vrank
         |  FROM vs WHERE sim IS NOT NULL),
         |tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
         |  FROM documents),
         |qt AS (SELECT DISTINCT w FROM tok WHERE doc_id = $QueryVecId),
         |qsel AS (
         |  SELECT tok.w, count(DISTINCT tok.doc_id) AS df
         |  FROM tok JOIN qt USING (w) GROUP BY tok.w
         |  ORDER BY df, w LIMIT $HybridQTerms),
         |tf AS (
         |  SELECT doc_id, tok.w, qsel.df, count(*) AS tf
         |  FROM tok JOIN qsel ON tok.w = qsel.w
         |  WHERE doc_id <> $QueryVecId GROUP BY doc_id, tok.w, qsel.df),
         |lex AS (
         |  SELECT doc_id, CAST(sum(tf * (1000000 // df)) AS BIGINT) AS score
         |  FROM tf GROUP BY doc_id),
         |lr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lrank
         |  FROM lex),
         |f AS (
         |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.lrank, v.vrank
         |  FROM (SELECT * FROM lr WHERE lrank <= $HybridPoolK) l
         |  FULL OUTER JOIN (SELECT * FROM vr WHERE vrank <= $HybridPoolK) v
         |    ON l.doc_id = v.doc_id)
         |SELECT doc_id,
         |  CAST(coalesce(lrank, 0) AS BIGINT) AS lex_rank,
         |  CAST(coalesce(vrank, 0) AS BIGINT) AS vec_rank,
         |  CAST(coalesce(1000000 // ($HybridRrfC + lrank), 0)
         |    + coalesce(1000000 // ($HybridRrfC + vrank), 0) AS BIGINT) AS fused
         |FROM f ORDER BY fused DESC, doc_id LIMIT $HybridTopK""".stripMargin,
    "simsearch_pq" -> duckPqSql,
    "simsearch_pq_incr" -> duckPqSql,
    // The IVF half is simsearch_ivf's CTE chain verbatim; the PQ half is
    // simsearch_pq's with its sub-distance table restricted to the
    // probed candidates (plus the query row for the ADC lookups).
    "simsearch_ivfpq" ->
      s"""WITH e AS ($CastEmb),
         |icents AS (SELECT vec_id AS cid, v AS cv FROM e
         |           WHERE vec_id BETWEEN 1 AND $IvfCentroids),
         |isims AS (
         |  SELECT e.vec_id, c.cid,
         |    coalesce(${VectorOps.cosineSql("e.v", "c.cv")}, -2.0) AS sim
         |  FROM e CROSS JOIN icents c),
         |cells AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
         |    FROM isims) t WHERE rn = 1),
         |probe AS (SELECT cid AS cell FROM isims WHERE vec_id = $QueryVecId
         |          ORDER BY sim DESC, cid LIMIT $IvfProbe),
         |cand0 AS (
         |  SELECT e.vec_id, e.v FROM e
         |  JOIN cells ON e.vec_id = cells.vec_id
         |  JOIN probe ON cells.cell = probe.cell
         |  WHERE e.vec_id <> $QueryVecId),
         |pcents AS (SELECT vec_id AS cid, ${unitSql("v")} AS cv FROM e
         |           WHERE vec_id BETWEEN 1 AND $PqK),
         |nv AS (SELECT vec_id, ${unitSql("v")} AS vn FROM cand0
         |       UNION ALL
         |       SELECT vec_id, ${unitSql("v")} AS vn FROM e WHERE vec_id = $QueryVecId),
         |mm AS ($pqMmSql),
         |sd AS (
         |  SELECT nv.vec_id, c.cid, mm.m, CASE mm.m ${pqDCases("nv.vn", "c.cv")} END AS d
         |  FROM nv CROSS JOIN pcents c CROSS JOIN mm),
         |codes AS (
         |  SELECT vec_id, m, cid AS code FROM (
         |    SELECT vec_id, m, cid,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
         |    FROM sd WHERE vec_id <> $QueryVecId) t WHERE rn = 1),
         |qd AS (SELECT m, cid, d FROM sd WHERE vec_id = $QueryVecId),
         |joined AS (
         |  SELECT codes.vec_id, codes.m, qd.d
         |  FROM codes JOIN qd ON codes.m = qd.m AND codes.code = qd.cid),
         |adist AS (
         |  SELECT vec_id, $pqAdistSumSql AS adist FROM joined GROUP BY vec_id),
         |cand AS (SELECT vec_id, adist FROM adist
         |         ORDER BY adist, vec_id LIMIT $PqRescore),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
         |SELECT x.vec_id, cells.cell, ${VectorOps.cosineSql("x.v", "qv")} AS sim,
         |  CAST(floor(cand.adist * 1000000.0) AS BIGINT) AS adist_micro
         |FROM e x
         |JOIN cells ON x.vec_id = cells.vec_id
         |JOIN cand ON x.vec_id = cand.vec_id
         |CROSS JOIN q
         |ORDER BY sim DESC, x.vec_id LIMIT 10""".stripMargin,
    // float→double is exact, x*1e6 is one IEEE-defined multiply, floor
    // and BIGINT sums are integer-exact — no engine can disagree. sum()
    // widens to HUGEINT in DuckDB; cast back to Spark's BIGINT.
    "embed_centroids" -> CentroidsSql,
    // PCA twin: the exact integer moment aggregates recomputed over
    // the same floor-micro quantization (dim-agnostic via len(v)), the
    // spectral booleans as the contract the Spark side must hold.
    "embed_pca" ->
      s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |x AS (SELECT v, unnest(range(1, len(v)+1)) AS i FROM e),
         |s1 AS (SELECT i, CAST(sum(CAST(floor(v[i] * 1000000.0) AS BIGINT)) AS BIGINT) AS s
         |       FROM x GROUP BY i),
         |tr AS (SELECT CAST(sum(CAST(floor(v[i] * v[i] * 1000000.0) AS BIGINT)) AS BIGINT) AS gtu
         |       FROM x),
         |ma AS (SELECT CAST(sum(abs(s)) AS BIGINT) AS mau FROM s1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM e)
         |SELECT CAST(c.component AS BIGINT) AS component, n.nv AS n_vecs,
         |  tr.gtu AS gram_trace_units, ma.mau AS mean_abs_units,
         |  TRUE AS eigen_resid_ok, TRUE AS ortho_ok,
         |  TRUE AS order_ok, TRUE AS explained_ok
         |FROM (SELECT unnest(range(0, $PcaTopK)) AS component) c, n, tr, ma
         |ORDER BY component""".stripMargin,
    // Streaming twin: ONE exact row — the same integer moment
    // aggregates, so incremental state-merge ≡ one-shot fold ≡ DuckDB
    // is a full value gate with no band booleans at all.
    "stream_moments" ->
      s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |x AS (SELECT v, unnest(range(1, len(v)+1)) AS i FROM e),
         |s1 AS (SELECT i, CAST(sum(CAST(floor(v[i] * 1000000.0) AS BIGINT)) AS BIGINT) AS s
         |       FROM x GROUP BY i)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_vecs,
         |  (SELECT CAST(sum(CAST(floor(v[i] * v[i] * 1000000.0) AS BIGINT)) AS BIGINT)
         |   FROM x) AS gram_trace_units,
         |  (SELECT CAST(sum(abs(s)) AS BIGINT) FROM s1) AS mean_abs_units""".stripMargin,
    // SAME SQL as embed_centroids: integer micro-sums are associative,
    // so persisted-history + batch-merge must equal the full rebuild
    // exactly — the equivalence IS the gate.
    "embed_centroids_incr" -> CentroidsSql,
    // The bounded aggregator's (sim desc, vec_id asc) order is exactly
    // the row_number twin; null sims are excluded on both sides.
    "simsearch_knn_batch" ->
      s"""WITH e AS ($CastEmb),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $KnnQueries),
         |s AS (
         |  SELECT q.qid, e.vec_id, ${VectorOps.cosineSql("e.v", "q.qv")} AS sim
         |  FROM e CROSS JOIN q WHERE e.vec_id >= $KnnQueries),
         |r AS (
         |  SELECT qid, vec_id, sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
         |  FROM s WHERE sim IS NOT NULL)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, sim
         |FROM r WHERE rank <= $KnnK ORDER BY qid, rank""".stripMargin,
    "simsearch_topk" ->
      s"""WITH e AS ($CastEmb),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
         |SELECT vec_id, ${VectorOps.cosineSql("v", "qv")} AS sim
         |FROM e, q WHERE vec_id <> $QueryVecId
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "simsearch_bucketed" ->
      s"""WITH e AS (
         |  SELECT vec_id, v, ${bucketSql("v")} AS bucket
         |  FROM ($CastEmb) t),
         |q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = $QueryVecId)
         |SELECT vec_id, bucket, ${VectorOps.cosineSql("v", "qv")} AS sim
         |FROM e JOIN q ON bucket = qbucket
         |WHERE vec_id <> $QueryVecId
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    // Mirrors topKIvf exactly: same deterministic centroids, the
    // row_number twin of max_by's (sim, -cid) tie-break, same -2
    // null-cosine sentinel.
    "simsearch_ivf" -> duckIvfSql,
    // Cell-quality audit over the SAME cells CTE as simsearch_ivf: the
    // member-to-own-centroid similarity is already a `sims` row, so
    // the twin is one join + one aggregate — audit and index cannot
    // disagree about what a cell is.
    "simsearch_cells" ->
      s"""WITH $duckCellsCtes
         |SELECT cells.cell, CAST(count(*) AS BIGINT) AS n_vec,
         |  CAST(sum(CAST(floor(sims.sim * 1000000.0) AS BIGINT)) AS BIGINT) AS sim_micro_sum,
         |  CAST(min(CAST(floor(sims.sim * 1000000.0) AS BIGINT)) AS BIGINT) AS min_sim_micro,
         |  CAST(max(CAST(floor(sims.sim * 1000000.0) AS BIGINT)) AS BIGINT) AS max_sim_micro
         |FROM cells JOIN sims
         |  ON sims.vec_id = cells.vec_id AND sims.cid = cells.cell
         |GROUP BY cells.cell ORDER BY cells.cell""".stripMargin,
    // The persisted-index twin reads the same assignment back from the
    // cell-partitioned artifact and scores identically, so its oracle
    // IS the direct-computation oracle — the equivalence the twin
    // exists to gate.
    "simsearch_ivf_incr" -> duckIvfSql,
    "simsearch_ivf_mor" -> duckIvfMorSql,
    // Mirrors topKIvfTrained: the deterministic Lloyd loop unrolled,
    // then the standard probe/score head over the trained centers.
    "simsearch_ivf_trained" -> duckIvfTrainedSql,
    // Same codebook (per-dim min/max), same encode/decode expression
    // trees, same two-stage ranking as topKSq8.
    "simsearch_sq8" ->
      s"""WITH e AS ($CastEmb),
         |x AS (SELECT unnest(v) AS xv, unnest(range(1, len(v) + 1)) AS i FROM e),
         |d AS (SELECT i, min(xv) AS mn, max(xv) AS mx FROM x GROUP BY i),
         |mm AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM d),
         |enc AS (
         |  SELECT vec_id, v,
         |    list_transform(range(1, len(v) + 1),
         |      i -> CASE WHEN mxs[i] > mns[i]
         |           THEN floor((v[i] - mns[i]) * 255.0 / (mxs[i] - mns[i]))
         |           ELSE 0.0 END) AS codes,
         |    mns, mxs
         |  FROM e CROSS JOIN mm),
         |dec AS (
         |  SELECT vec_id, v,
         |    list_transform(range(1, len(codes) + 1),
         |      i -> mns[i] + (codes[i] + 0.5) * (mxs[i] - mns[i]) / 255.0) AS dv
         |  FROM enc),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId),
         |cand AS (
         |  SELECT vec_id, v, qv, ${VectorOps.cosineSql("dv", "qv")} AS approx
         |  FROM dec, q WHERE vec_id <> $QueryVecId
         |  ORDER BY approx DESC, vec_id LIMIT $Sq8Rescore)
         |SELECT vec_id, ${VectorOps.cosineSql("v", "qv")} AS sim,
         |  CAST(floor(approx * 1000000.0) AS BIGINT) AS approx_ppm
         |FROM cand ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "neardup_embedding" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, v, ${bucketSql("v")} AS bucket
         |  FROM ($CastEmb) t)
         |SELECT x.vec_id AS a, y.vec_id AS b, x.label AS label,
         |  ${VectorOps.cosineSql("x.v", "y.v")} AS sim
         |FROM e x JOIN e y
         |  ON x.bucket = y.bucket AND x.label = y.label AND x.vec_id < y.vec_id
         |ORDER BY sim DESC, a, b LIMIT 20""".stripMargin,
    // The incremental twin: same block keys and the nearDup
    // precomputed-norm cosine, with the content-keyed split CASE
    // (generated from SampleOps' constants) standing in for
    // history/batch exactly as every *_incr oracle does.
    "neardup_embedding_incr" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, v, ${bucketSql("v")} AS bucket,
         |         sqrt(${VectorOps.dotSql("v", "v")}) AS n,
         |         ${SampleOps.duckSplitCase(SampleOps.duckBucket("vec_id"))} AS split
         |  FROM ($CastEmb) t)
         |SELECT b.vec_id AS new_vec, h.vec_id AS old_vec, b.label AS label,
         |  CASE WHEN b.n > 0 AND h.n > 0
         |       THEN (${VectorOps.dotSql("b.v", "h.v")}) / (b.n * h.n) END AS sim
         |FROM e b JOIN e h
         |  ON b.bucket = h.bucket AND b.label = h.label
         |WHERE b.split <> 'train' AND h.split = 'train'
         |ORDER BY sim DESC, new_vec, old_vec LIMIT 20""".stripMargin,
    // Split CASE and hash bucket generated from SampleOps' constants;
    // cells from the shared IVF CTE chain; cosine via precomputed norms
    // exactly as the Spark side (the nearDup 1-dot-per-pair shape).
    "sample_decontam_emb" ->
      s"""WITH $duckCellsCtes,
         |en AS (
         |  SELECT vec_id, v, sqrt(${VectorOps.dotSql("v", "v")}) AS n,
         |         ${SampleOps.duckBucket("vec_id")} AS bucket
         |  FROM e),
         |sp AS (
         |  SELECT vec_id, v, n, ${SampleOps.duckSplitCase("bucket")} AS split
         |  FROM en),
         |tr AS (SELECT s.vec_id AS train_vec, c.cell, s.v, s.n
         |       FROM sp s JOIN cells c USING (vec_id) WHERE s.split = 'train'),
         |te AS (SELECT s.vec_id AS test_vec, c.cell, s.v AS xv, s.n AS xn
         |       FROM sp s JOIN cells c USING (vec_id) WHERE s.split = 'test'),
         |pairs AS (
         |  SELECT train_vec, test_vec, tr.cell AS cell,
         |    CASE WHEN tr.n > 0 AND te.xn > 0
         |         THEN ${VectorOps.dotSql("tr.v", "te.xv")} / (tr.n * te.xn) END AS sim
         |  FROM tr JOIN te ON tr.cell = te.cell)
         |SELECT train_vec, test_vec, cell, sim FROM pairs
         |WHERE sim IS NOT NULL
         |ORDER BY sim DESC, train_vec, test_vec LIMIT $SemLeakTopK""".stripMargin,
  )

  /** DuckDB twin of [[recallAudit]], COMPOSED from the audited methods'
    * own oracle strings (each embedded as a WITH-bearing subquery) — the
    * audit and the per-method gates literally share one SQL definition
    * per method, so they cannot drift.
    */
  private val duckRecallSql: String = {
    def ids(name: String): String =
      s"SELECT vec_id FROM (\n${baseOracle(name)}\n) t"
    val methods = RecallMethods.map { name =>
      s"""SELECT '$name' AS method, CAST(count(*) AS BIGINT) AS hits_at_10
         |FROM (${ids(name)}) m
         |JOIN (${ids("simsearch_topk")}) truth USING (vec_id)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT method, hits_at_10 FROM (
       |$methods) u ORDER BY method""".stripMargin
  }

  val oracle: Map[String, String] =
    baseOracle + ("simsearch_recall" -> duckRecallSql)
}
