package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, max_by, struct}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.sources.SnapshotTable

/** Transactional streaming ingest into a [[SnapshotTable]] — the
  * exactly-once sink contract a `foreachBatch` writer must provide for
  * itself (Structured Streaming only guarantees at-least-once delivery
  * into the batch function):
  *
  * micro-batch N commits as generation N + 1 — data files land in a
  * generation-private directory, and the manifest publishes only AFTER
  * the data is fully written, carrying generation N's files forward
  * verbatim (the append-without-rewrite invariant).
  *
  * Why this is exactly-once end-to-end from a replayable source: after
  * a crash, Structured Streaming replays at most the last in-flight
  * batch, always under the SAME batch id. A replayed batch re-lands its
  * OWN generation — the data stages into a FRESH attempt-private
  * directory and the manifest republish is the only switch point, after
  * which the failed attempt's files are swept — so duplication is
  * structurally impossible rather than probabilistically avoided.
  * Readers resolve older generations through their untouched manifests
  * (snapshot isolation holds unconditionally for every generation but
  * the latest); the LATEST generation is single-writer and
  * quiesced-reader during a replay window, because the republish
  * replaces its manifest — the caveat every lakehouse sink carries for
  * its last in-flight commit. "The table as of batch N" is simply
  * generation N + 1 (time travel across the stream's whole history).
  */
object SnapshotStream {

  /** One micro-batch commit. Public so the spec (and a batch backfill)
    * can drive the exact production step — including a deliberate
    * same-id replay — without a streaming query around it.
    */
  def commitBatch(batch: DataFrame, batchId: Long, table: String): Unit = {
    val gen = batchId + 1
    // Epoch-aligned or refuse: a NEW checkpoint against a table with
    // existing history would replay batch ids from 0 and overwrite
    // committed generations with replace=true — refuse instead of
    // destroying lineage.
    SnapshotTable.requireEpochAligned(batch.sparkSession, table, gen)
    // replace = true: a same-batch-id replay is the ONE caller allowed
    // to republish an existing generation (everyone else gets
    // first-writer-wins).
    SnapshotTable.commit(batch, table, gen,
      carryFrom = if (gen > 1) Some(gen - 1) else None, replace = true)
  }

  /** The streaming query: each arriving (doc_id, text) micro-batch
    * commits one table generation.
    */
  def snapshotIngest(docs: Dataset[DocStream.Doc], table: String,
      checkpointDir: String): DataStreamWriter[Row] =
    ingest(docs.toDF(), table, checkpointDir)

  /** [[snapshotIngest]] for ANY row shape — the append-only BRONZE
    * ingest of a medallion pipeline (every arriving version kept;
    * the curated latest-per-key view is [[cdcApply]]'s job downstream).
    */
  def ingest(rows: DataFrame, table: String,
      checkpointDir: String): DataStreamWriter[Row] =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) => commitBatch(b.toDF(), id, table))

  /** One micro-batch of the streaming CDC-APPLY sink: the batch's
    * keyed rows UPSERT into the table as one merge-on-read commit
    * ([[SnapshotTable.commitUpsert]] — stamped equality-delete +
    * stamped fresh rows, no base file rewritten), so the table
    * converges to latest-row-per-key as the change stream drains —
    * the "apply a CDC feed to a lakehouse table" pattern. Batch 0 is
    * the initial load (nothing to upsert against); exactly-once holds
    * by the same argument as [[commitBatch]]: a same-id replay
    * re-lands its own generation through a fresh attempt directory,
    * with the manifest republish as the only switch point.
    *
    * A CDC feed routinely delivers SEVERAL changes for one key inside
    * one micro-batch; committing them all would break convergence
    * (each lands stamped `seq = gen`, so the batch's own tombstone
    * hides none of them). `orderCol` names the feed's change-order
    * column (an LSN / change timestamp — every real CDC source carries
    * one): the batch is first reduced to its latest row per key. With
    * `orderCol = None` the CALLER asserts key-unique batches, and
    * [[SnapshotTable.commitUpsert]] refuses (pre-publish, from footer
    * row counts) any batch that violates it.
    */
  def upsertBatch(batch: DataFrame, batchId: Long, table: String,
      keyCol: String, orderCol: Option[String] = None): Unit = {
    val gen = batchId + 1
    SnapshotTable.requireEpochAligned(batch.sparkSession, table, gen)
    // max_by(struct) rather than a row_number window: the aggregate
    // gets a map-side partial combine, so the key shuffle carries one
    // candidate row per (task, key) instead of every change row — the
    // difference that matters when a backfill batch holds many changes
    // per key. The order key wraps in a single-field STRUCT: bare
    // max_by IGNORES rows whose order expression is NULL, so a key
    // whose every change carries a null orderCol would collapse to one
    // all-NULL row; the struct is never null and orders its null field
    // first, which keeps a REAL row (the window's old behavior). Ties
    // on orderCol are contract-broken (a CDC feed's LSN/change
    // timestamp is unique per key).
    val latest = orderCol.fold(batch) { oc =>
      batch
        .groupBy(col(keyCol))
        .agg(max_by(struct(batch.columns.map(col): _*),
          struct(col(oc))).as("__r"))
        .select(col("__r.*"))
    }
    if (gen == 1L)
      SnapshotTable.commit(latest, table, 1L, carryFrom = None, replace = true)
    else
      SnapshotTable.commitUpsert(latest, table, gen, keyCol,
        carryFrom = gen - 1, replace = true)
  }

  /** The streaming CDC-apply query: each keyed micro-batch upserts one
    * generation; `readMor(latest)` is always latest-row-per-key.
    */
  def cdcApply(updates: DataFrame, table: String, keyCol: String,
      checkpointDir: String, orderCol: Option[String] = None): DataStreamWriter[Row] =
    updates.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        upsertBatch(b.toDF(), id, table, keyCol, orderCol))
}
