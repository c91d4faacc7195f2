package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.queries.DedupOps

/** Streaming near-duplicate ingest — the crawl-loop form of
  * [[graft.queries.DedupOps.minhashIncremental]]: documents arrive as a
  * stream, and each micro-batch (a) computes ONLY its own MinHash band
  * buckets, (b) probes the PERSISTED band-bucket index for cross-batch
  * candidates, and (c) appends its buckets to the index — so by the
  * next batch, this batch's documents are probe-able history. Cost per
  * batch scales with the batch plus a bucket-keyed join against the
  * index, never with corpus history; the index rows are (doc_id, band,
  * bucket) — signatures, never text — exactly the artifact the batch
  * query maintains, so a nightly batch job and this stream can share
  * one index.
  *
  * Exactly-once posture: both sinks partition by `batch_id` and
  * overwrite dynamically (the [[EventStream.writeBatch]] recipe), so a
  * replayed batch lands byte-identically instead of duplicating, and
  * the probe filters the index to `batch_id` STRICTLY BELOW the current
  * batch — a replay never sees the half-written rows of its own failed
  * attempt, and candidates are stable under restart (drilled in
  * DocStreamSpec).
  */
object DocStream {

  case class Doc(doc_id: Long, text: String)

  /** Band/row layout shared with the batch incremental query
    * ([[DedupOps.minhashIncremental]]) so stream and batch agree on
    * what a candidate is.
    */
  val NBands = 4
  val RowsPerBand = 4

  /** `batch_id` used when seeding the index from a batch (historical)
    * corpus: strictly below every stream batch id, so batch 0 already
    * probes it.
    */
  val SeedBatchId = -1L

  /** Chunk-index format version, stamped on every persisted row and
    * asserted at probe time: the chunk-hash definition is a CONSTANT
    * CONTRACT between writer and reader (changing the fold moduli
    * changes every hash), and without the stamp an index written under
    * old constants would silently match nothing — every passage
    * reported fresh — instead of failing loudly. Bump when the chunk
    * hash definition changes (2 = coprime-moduli fold pair).
    */
  val ChunkIndexFormat = 2L

  /** Write a historical corpus's band buckets as the index seed —
    * the one-off backfill a deployment runs before switching the
    * stream on. Deliberately a PLAIN overwrite (no dynamic partition
    * mode): a seed is a full reset of the artifact, so any stale
    * batch partitions from a previous stream run are dropped too —
    * under dynamic overwrite only the seed partition would be
    * replaced, and a restarted stream (fresh checkpoint, batch ids
    * back at 0) would read the old run's leftover batches as phantom
    * history.
    */
  def seedIndex(docs: DataFrame, indexDir: String): Unit =
    seedIndexFromBands(
      DedupOps.minhashBands(docs, NBands, RowsPerBand), indexDir)

  /** [[seedIndex]] from an already-computed (doc_id, band, bucket)
    * frame — the deployment that maintains a persisted signature/band
    * table (the batch incremental query's artifact) seeds from it
    * directly instead of re-hashing the corpus text.
    */
  def seedIndexFromBands(bands: DataFrame, indexDir: String): Unit = {
    // Explicit whole-directory delete first: the seed is a FULL reset
    // (stale batch partitions from a previous run must go), which the
    // per-batch-directory write below deliberately does not do.
    deleteDir(bands.sparkSession, indexDir)
    EventStream.writeBatch(bands.select("doc_id", "band", "bucket"),
      SeedBatchId, indexDir)
  }

  private def deleteDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** One micro-batch step: probe history, emit candidates, append the
    * batch's buckets. Public so the spec (and a batch backfill) can
    * drive the exact production step without a streaming query around
    * it.
    */
  def probeAndAppend(batch: DataFrame, batchId: Long,
      indexDir: String, candDir: String): Unit = {
    val spark = batch.sparkSession
    // persist/unpersist (not localCheckpoint): two consumers below
    // should hash the batch once, but a stream runs this every batch —
    // an un-released checkpoint RDD per batch would accumulate in the
    // block manager for the life of the query.
    val bands = DedupOps.minhashBands(batch, NBands, RowsPerBand).persist()
    try {
      val history = spark.read.parquet(indexDir)
        .filter(col("batch_id") < batchId)
        .select("doc_id", "band", "bucket")
      EventStream.writeBatch(DedupOps.probeIndex(history, bands),
        batchId, candDir)
      EventStream.writeBatch(bands.select("doc_id", "band", "bucket"),
        batchId, indexDir)
    } finally bands.unpersist(blocking = false)
  }

  /** The streaming query: arriving (doc_id, text) micro-batches run
    * [[probeAndAppend]] against the shared index. Start after
    * [[seedIndex]] (or against an empty directory with an explicit
    * schema-bearing seed).
    */
  def neardupIngest(docs: Dataset[Doc], indexDir: String, candDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    docs.toDF().writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], id: Long) =>
        probeAndAppend(batch.toDF(), id, indexDir, candDir))

  // ---- Chunk-level (CDC) ingest: the same loop one level below the
  // document. The index artifact is (doc_id, chunk_hash) instances from
  // [[DedupOps.cdcChunkHashes]] — the BATCH path's chunk derivation,
  // verbatim — so a nightly dedup_cdc-style job and this stream share
  // one chunk index, pinning batch/stream interchangeability at the
  // chunk level exactly as [[seedIndex]]/[[probeAndAppend]] pin it at
  // the band-bucket level (drilled in DocStreamSpec).

  /** Seed the chunk index from a historical corpus via the batch
    * chunker — the backfill a deployment runs before switching the
    * chunk-level stream on. History ships (doc_id, chunk_hash) only,
    * never text. Plain overwrite for the same full-reset reason as
    * [[seedIndex]]: stale stream partitions from a previous run must
    * not survive a re-seed as phantom history.
    */
  /** Highest batch_id whose fmt stamps this process has already
    * validated, per chunk-index directory: the per-trigger contract
    * check scans only partitions above this watermark (partition
    * pruning on batch_id). Process-local by design — a restart or a
    * re-seed re-validates the full index once, which is how a writer
    * HANDOFF (old version stopped, new version started) gets caught.
    * The watermark assumes one live writer per index directory (see
    * the contract note in [[chunkProbeAndAppend]]).
    */
  private val fmtValidated =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Test hook: forget validation watermarks so a spec can exercise the
    * full-index check again within one JVM.
    */
  private[streaming] def resetFmtValidation(): Unit = fmtValidated.clear()

  def seedChunkIndex(docs: DataFrame, indexDir: String): Unit =
    seedChunkIndexFromInstances(
      DedupOps.cdcChunkHashes(docs)
        .select(col("doc_id"), explode(col("hs")).as("h")), indexDir)

  /** [[seedChunkIndex]] from an already-computed (doc_id, h)
    * chunk-instance frame — the deployment that maintains a persisted
    * chunk index (the batch dedup_cdc artifact) seeds from it directly
    * instead of re-chunking the corpus text. The fmt stamp applies
    * here, so the caller's frame must carry CURRENT-format hashes
    * (true by construction when it comes from the same
    * [[DedupOps.cdcChunkHashes]] derivation).
    */
  def seedChunkIndexFromInstances(inst: DataFrame, indexDir: String): Unit = {
    // A re-seed rewrites the directory, so any prior validation
    // watermark is stale — forget it, or the seed partition (below the
    // old watermark) would escape the next contract check.
    fmtValidated.remove(indexDir)
    // Full reset (see seedIndexFromBands): delete, then write the seed
    // as its own batch partition directory.
    deleteDir(inst.sparkSession, indexDir)
    EventStream.writeBatch(
      inst.select("doc_id", "h").withColumn("fmt", lit(ChunkIndexFormat)),
      SeedBatchId, indexDir)
  }

  /** One chunk-level micro-batch step — the streaming form of
    * [[DedupOps.cdcIncremental]]: chunk the batch once, probe the
    * history chunk index (strictly-below batch_id, so a replay never
    * sees its own failed attempt), report per-document fresh-passage
    * ppm, and append the batch's chunks so the next batch probes them
    * as history. Both sinks partition by `batch_id` with dynamic
    * overwrite — the replay-idempotent recipe the band-bucket loop
    * uses.
    */
  def chunkProbeAndAppend(batch: DataFrame, batchId: Long,
      indexDir: String, reportDir: String): Unit = {
    val spark = batch.sparkSession
    val inst = DedupOps.cdcChunkHashes(batch)
      .select(col("doc_id"), explode(col("hs")).as("h")).persist()
    try {
      val idx = spark.read.parquet(indexDir)
      // Writer/reader contract check: an index written under a
      // different chunk-hash definition would silently match nothing —
      // fail loudly and demand a re-seed instead. Schema presence is
      // free; the value check verifies the fmt RANGE, not a single
      // sampled row — a one-row sample passes on an index holding
      // MIXED formats (a re-seed that failed before deleting, or a
      // leftover partition from a previous writer version), leaving
      // some partitions silently matching nothing. The range scan is
      // INCREMENTAL: batch_id is the partition column, so filtering
      // above the per-process validation watermark prunes to
      // partitions this process has not yet checked — steady-state
      // cost is O(new partitions) per trigger, never a full fmt-column
      // decode of the growing index on every micro-batch. The
      // watermark makes the check's coverage PER PROCESS LIFETIME:
      // everything present when this process first touches the index,
      // plus everything appended above the watermark after that. A
      // SECOND writer appending below the watermark while this one
      // runs is outside the contract — one live writer per index
      // directory, the same single-writer rule the probe's
      // strictly-below-batch_id semantics and Structured Streaming's
      // own sink/checkpoint model already assume; writer handoffs go
      // through restart (or re-seed), both of which re-validate in
      // full. Drilled in DocStreamSpec.
      require(idx.columns.contains("fmt"),
        s"chunk index at $indexDir predates format stamping — re-seed the index")
      val watermark = fmtValidated.get(indexDir)
      val toCheck =
        if (watermark == null) idx else idx.filter(col("batch_id") > watermark.longValue())
      val fmtRange = toCheck.agg(min("fmt"), max("fmt")).head()
      require(fmtRange.isNullAt(0) ||
          (fmtRange.getLong(0) == ChunkIndexFormat &&
            fmtRange.getLong(1) == ChunkIndexFormat),
        s"chunk index at $indexDir holds formats in " +
          s"[${fmtRange.get(0)}, ${fmtRange.get(1)}], expected only " +
          s"$ChunkIndexFormat — re-seed the index")
      // Everything strictly below this batch is now validated; our own
      // partition (written below with the current stamp) gets covered
      // by the NEXT trigger's delta check, and a replay of this batch
      // id stays above the watermark and re-validates itself.
      fmtValidated.merge(indexDir, java.lang.Long.valueOf(batchId - 1),
        (a, b) => if (a.longValue() >= b.longValue()) a else b)
      val history = idx
        .filter(col("batch_id") < batchId)
        .select("h").distinct()
      EventStream.writeBatch(
        inst.join(history.withColumn("seen", lit(1)), Seq("h"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("seen").isNull, 1L).otherwise(0L)).as("fresh_chunks"))
          .select(col("doc_id"), col("n_chunks"), col("fresh_chunks"),
            expr("(fresh_chunks * 1000000) div n_chunks").as("fresh_ppm")),
        batchId, reportDir)
      EventStream.writeBatch(inst.withColumn("fmt", lit(ChunkIndexFormat)),
        batchId, indexDir)
    } finally inst.unpersist(blocking = false)
  }

  /** The chunk-level streaming query: arriving (doc_id, text)
    * micro-batches run [[chunkProbeAndAppend]] against the shared
    * chunk index. Start after [[seedChunkIndex]].
    */
  def chunkIngest(docs: Dataset[Doc], indexDir: String, reportDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    docs.toDF().writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], id: Long) =>
        chunkProbeAndAppend(batch.toDF(), id, indexDir, reportDir))

  // ---- Streaming trending words: the Misra-Gries summary as LIVE
  // stream state — the streaming twin of `text_heavyhitters_incr`
  // (there, history is a persisted parquet summary merged per batch;
  // here, the same O(k) summary lives in the state store and every
  // micro-batch folds into it via the identical mergeable-summaries
  // merge, so batch and stream maintenance provably share one
  // algorithm).

  /** Token shards for [[trendingWords]]: state is ONE summary per
    * shard, so memory is shards × O(k) regardless of vocabulary, and
    * shards bound the per-group work. A token always hashes to the same
    * shard, so each shard's summary is an exact Misra-Gries over its
    * own token substream — the superset guarantee holds per shard with
    * N = that shard's token count. Sharding uses the PORTABLE md5
    * prefix hash (not String.hashCode), so the `stream_trending` value
    * gate can reconstruct shard membership in SQL exactly.
    */
  val TrendShards = 4

  /** [[trendingWords]]'s shard of a token — the portable 60-bit hash
    * mod [[TrendShards]] (non-negative by construction), numerically
    * identical to the oracle's `portable64(w) % shards`.
    */
  def shardOf(w: String, shards: Int): Int =
    (graft.functions.DigestPrefix64.hash(
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % shards).toInt

  /** Summary size per shard for [[trendingWords]]. */
  val TrendK = 8

  case class TokenShard(shard: Int, w: String)
  case class TrendState(m: Map[String, Long])
  case class Trend(shard: Int, word: String, est: Long)

  /** Streaming trending words via `flatMapGroupsWithState`: each
    * micro-batch's tokens are exact-counted per shard (transient,
    * bounded by the batch), pruned to a Misra-Gries k-summary, and
    * merged into the shard's persisted state with the SAME
    * [[graft.functions.MisraGries.mergeMaps]] the batch aggregator and
    * the incremental query use — state never exceeds k entries, and the
    * merged error bound N/(k+1) is the mergeable-summaries theorem.
    * Every trigger emits the shard's current candidates (Update mode),
    * so a dashboard reads live heavy-hitter estimates whose true counts
    * can only be under-stated, never missed (count > N/(k+1) ⇒
    * present).
    */
  def trendingWords(docs: Dataset[Doc], k: Int = TrendK,
      shards: Int = TrendShards): Dataset[Trend] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => d.text.split(" ").iterator.filter(_.nonEmpty)
        .map(w => TokenShard(shardOf(w, shards), w)))
      .groupByKey(_.shard)
      .flatMapGroupsWithState[TrendState, Trend](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (shard: Int, toks: Iterator[TokenShard], state: GroupState[TrendState]) =>
          val batch = toks.foldLeft(Map.empty[String, Long]) { (m, t) =>
            m.updated(t.w, m.getOrElse(t.w, 0L) + 1L)
          }
          val merged = graft.functions.MisraGries.mergeMaps(
            state.getOption.map(_.m).getOrElse(Map.empty),
            graft.functions.MisraGries.mergeMaps(batch, Map.empty, k), k)
          state.update(TrendState(merged))
          val packed = graft.functions.MisraGries.pack(merged)
          packed.words.iterator.zip(packed.counts.iterator)
            .map { case (w, c) => Trend(shard, w, c) }
      }
  }
}
