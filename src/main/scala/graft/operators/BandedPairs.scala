package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The capped band→bucket→pair plan shared by the SimHash
  * (`neardup_simhash_pairs`) and pHash (`multimodal_phash_near`)
  * near-dup queries — ONE implementation so the cap semantics, the
  * streaming bucket drop, and the materialization decision cannot
  * drift between the text and media families (each family's DuckDB
  * twin is still generated from its own constants, which this helper
  * takes as parameters).
  *
  * Shape: explode each signature row to its (band, chunk) keys, keep
  * buckets with 2..`maxBucket` members, self-join members on the
  * bucket key (`a < b`) so candidate pairs distribute across tasks —
  * no per-bucket array is ever materialized — then one codegen'd
  * `bit_count(xor)` per candidate and the exact Hamming cut. Bucket
  * counts partial-aggregate map-side and an over-cap bucket's members
  * are dropped STREAMING through the sort-merge cap join (a
  * window-count formulation would buffer the whole hot bucket on one
  * task before filtering it). Pair volume is bounded by
  * buckets × cap²/2 at any corpus size.
  *
  * The signature relation (two longs per row — the smallest relation
  * in the query) is persisted MEMORY_AND_DISK: column pruning blocks
  * exchange reuse across the differently-projected count and
  * self-join consumers, so without materialization the expensive
  * signature derivation (per-token md5 for SimHash) re-runs per
  * consumer. Blocks are LRU-evictable, and every cached handle
  * registers in an internal queue that [[releaseCached]] drains —
  * Bench's cleanState calls it, and a long-lived session embedding
  * this call does the same when done — because the result is lazy, so
  * the helper cannot unpersist on the caller's behalf (a 100 TB run
  * checkpoints the signature relation to storage between phases
  * instead).
  */
object BandedPairs {

  /** Cached signature relations handed out by [[pairs]] and not yet
    * released. STRONGLY referenced on purpose: Spark's CacheManager
    * pins the cached relation regardless of whether the Dataset
    * wrapper stays reachable, so a weak reference could be GC-cleared
    * mid-query and turn the later release into a silent no-op while
    * the blocks stay pinned. The queue holds a handful of small
    * wrappers between releases, and [[releaseCached]] empties it.
    */
  private val cachedSigs =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist every signature relation [[pairs]] has cached so far —
    * the ONE place the harness (Bench's cleanState) and any long-lived
    * session release this helper's storage between queries, instead of
    * each caller having to remember a session-wide clearCache().
    * Idempotent; safe while queries on other threads still hold their
    * own frames (unpersist only drops cached blocks — consumers
    * recompute).
    */
  def releaseCached(): Unit = {
    var df = cachedSigs.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = cachedSigs.poll()
    }
  }

  /** Bands a `(idCol, sigCol)` relation into one row per (band, chunk)
    * membership.
    */
  private def bandedMembers(sig: DataFrame, idCol: String, sigCol: String,
      nBands: Int, chunkBits: Int): DataFrame = {
    val mask = (1L << chunkBits) - 1
    val bands = (0 until nBands).map { b =>
      struct(lit(b.toLong).as("band"),
        shiftright(col(sigCol), b * chunkBits).bitwiseAND(lit(mask)).as("chunk"))
    }
    sig
      .select(col(idCol), col(sigCol), explode(array(bands: _*)).as("bc"))
      .select(col(idCol), col(sigCol),
        col("bc.band").as("band"), col("bc.chunk").as("chunk"))
  }

  /** Two-sided probe — the incremental-maintenance step: a batch's
    * signatures probe a PERSISTED history signature relation (the
    * index ships (id, signature) rows only — 16 bytes per doc, never
    * text). Buckets are capped on the HISTORY side (a hot history
    * bucket is the index owner's pathology; the cap bounds every probe
    * row's fan-out at `maxBucket` matches), then one `bit_count(xor)`
    * per candidate and the exact Hamming cut. Per-batch cost tracks
    * the batch size plus a bucket-keyed join against the index —
    * never corpus history. Returns `(a, b, hamming)` with `a` the
    * batch id and `b` the history id.
    */
  def probe(history: DataFrame, batch: DataFrame, idCol: String,
      sigCol: String, nBands: Int, chunkBits: Int, maxBucket: Int,
      maxHamming: Int): DataFrame = {
    val hb = bandedMembers(history, idCol, sigCol, nBands, chunkBits)
    val bb = bandedMembers(batch, idCol, sigCol, nBands, chunkBits)
    val okBuckets = hb.groupBy("band", "chunk")
      .agg(count(lit(1)).as("bcnt"))
      .filter(col("bcnt") <= maxBucket)
      .select("band", "chunk")
    bb.select(col("band"), col("chunk"), col(idCol).as("a"), col(sigCol).as("sa"))
      .join(okBuckets, Seq("band", "chunk"))
      .join(
        hb.select(col("band"), col("chunk"), col(idCol).as("b"), col(sigCol).as("sb")),
        Seq("band", "chunk"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(asc("hamming"), asc("a"), asc("b"))
  }

  /** Hamming-verified candidate pairs `(a, b, hamming)` from banded
    * signatures in `sig(idCol, sigCol)`, capped per bucket.
    */
  def pairs(sig: DataFrame, idCol: String, sigCol: String, nBands: Int,
      chunkBits: Int, maxBucket: Int, maxHamming: Int): DataFrame = {
    val cached = sig.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cachedSigs.add(cached)
    val members = bandedMembers(cached, idCol, sigCol, nBands, chunkBits)
    val okBuckets = members.groupBy("band", "chunk")
      .agg(count(lit(1)).as("bcnt"))
      .filter(col("bcnt") > 1 && col("bcnt") <= maxBucket)
      .select("band", "chunk")
    val inBucket = members.join(okBuckets, Seq("band", "chunk"))
    inBucket
      .select(col("band"), col("chunk"), col(idCol).as("a"), col(sigCol).as("sa"))
      .join(
        inBucket.select(col("band"), col("chunk"),
          col(idCol).as("b"), col(sigCol).as("sb")),
        Seq("band", "chunk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(asc("hamming"), asc("a"), asc("b"))
  }
}
