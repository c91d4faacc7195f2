package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.SnapshotTable
import graft.streaming.DocStream.Doc

/** Golden drills for the transactional snapshot-committing sink:
  * generation-per-batch commits, time travel across the stream's
  * history, same-id replay idempotence, and checkpoint kill-and-restart
  * continuing at the next generation.
  */
/** A CDC change row: `lsn` is the feed's change-order column. */
case class Change(doc_id: Long, lsn: Long, text: String)

class SnapshotStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ids(table: String, gen: Long): Set[Long] = {
    import spark.implicits._
    SnapshotTable.readAs(spark, table, gen).select("doc_id").as[Long].collect().toSet
  }

  test("golden: generation per batch, replay-idempotent, restart-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("snapstream").toString
    val (table, ckpt) = (s"$root/table", s"$root/ckpt")

    val in = MemoryStream[Doc]
    val q1 = SnapshotStream.snapshotIngest(in.toDS(), table, ckpt).start()
    try {
      in.addData(Doc(1L, "a"), Doc(2L, "b"))
      q1.processAllAvailable()
      in.addData(Doc(3L, "c"))
      q1.processAllAvailable()
    } finally q1.stop()

    // Batch N is generation N+1; every generation remains readable —
    // time travel across the stream's history.
    assert(SnapshotTable.generations(spark, table) === Seq(1L, 2L))
    assert(ids(table, 1L) === Set(1L, 2L))
    assert(ids(table, 2L) === Set(1L, 2L, 3L))
    // Append without rewrite: gen 2 carries gen 1's files verbatim.
    val f1 = SnapshotTable.listFiles(spark, table, 1L).toSet
    assert(f1.subsetOf(SnapshotTable.listFiles(spark, table, 2L).toSet))

    // Same-id replay (the crash-between-write-and-checkpoint case):
    // batch 1 re-lands generation 2 over itself — same content, no
    // duplicates, and gen 1 is untouched.
    SnapshotStream.commitBatch(Seq(Doc(3L, "c")).toDS().toDF(), 1L, table)
    assert(ids(table, 2L) === Set(1L, 2L, 3L))
    assert(SnapshotTable.readAs(spark, table, 2L).count() === 3L)
    assert(SnapshotTable.listFiles(spark, table, 1L).toSet === f1)

    // Data arrives while the query is DOWN; a new instance resumes from
    // the checkpoint and must commit it as the NEXT generation (a query
    // ignoring the checkpoint would restart at batch 0 and overwrite
    // generation 1).
    in.addData(Doc(4L, "d"))
    val q2 = SnapshotStream.snapshotIngest(in.toDS(), table, ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(SnapshotTable.generations(spark, table) === Seq(1L, 2L, 3L))
    assert(ids(table, 3L) === Set(1L, 2L, 3L, 4L))
    assert(ids(table, 1L) === Set(1L, 2L), "history stays byte-stable")
  }

  test("cdcApply: keyed micro-batches converge to latest-row-per-key, replay- and restart-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("snapcdc").toString
    val (table, ckpt) = (s"$root/table", s"$root/ckpt")

    def latest: Map[Long, String] = {
      val g = SnapshotTable.generations(spark, table).max
      SnapshotTable.readMor(spark, table, g, "doc_id")
        .as[Doc].collect().map(d => d.doc_id -> d.text).toMap
    }

    val in = MemoryStream[Doc]
    val q1 = SnapshotStream.cdcApply(in.toDS().toDF(), table, "doc_id", ckpt).start()
    try {
      // Batch 0: the initial load. Batch 1: key 2 updated, key 3 new.
      in.addData(Doc(1L, "a"), Doc(2L, "b"))
      q1.processAllAvailable()
      in.addData(Doc(2L, "B2"), Doc(3L, "c"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(latest === Map(1L -> "a", 2L -> "B2", 3L -> "c"),
      "the table converges to latest-row-per-key")
    // No base file was rewritten by the upsert: gen 1's files carry.
    assert(SnapshotTable.listFiles(spark, table, 1L).toSet
      .subsetOf(SnapshotTable.listFiles(spark, table, 2L).toSet))
    // Time travel: the pre-update view still serves the old row.
    assert(SnapshotTable.readMor(spark, table, 1L, "doc_id")
      .as[Doc].collect().map(d => d.doc_id -> d.text).toMap
      === Map(1L -> "a", 2L -> "b"))

    // Same-id replay re-lands generation 2 over itself: same content,
    // no duplicate rows for the upserted key.
    SnapshotStream.upsertBatch(
      Seq(Doc(2L, "B2"), Doc(3L, "c")).toDS().toDF(), 1L, table, "doc_id")
    assert(latest === Map(1L -> "a", 2L -> "B2", 3L -> "c"))

    // Updates arriving while the query is down apply on restart as the
    // NEXT generation.
    in.addData(Doc(1L, "A3"))
    val q2 = SnapshotStream.cdcApply(in.toDS().toDF(), table, "doc_id", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(SnapshotTable.generations(spark, table) === Seq(1L, 2L, 3L))
    assert(latest === Map(1L -> "A3", 2L -> "B2", 3L -> "c"))
  }

  /** A real CDC feed delivers SEVERAL changes for one key inside one
    * micro-batch. Without an in-batch dedupe every such row lands
    * stamped seq=gen and the batch's own tombstone (which hides only
    * strictly-smaller seqs) hides none of them — the key serves two
    * rows forever. orderCol reduces each batch to latest-per-key; a
    * caller that asserts key-unique batches (orderCol = None) and
    * breaks the promise is refused loudly before the commit publishes.
    */
  test("cdcApply: several same-key changes in ONE micro-batch converge via orderCol") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("snapcdcorder").toString
    val (table, ckpt) = (s"$root/table", s"$root/ckpt")

    val in = MemoryStream[Change]
    val q = SnapshotStream.cdcApply(in.toDS().toDF(), table, "doc_id", ckpt,
      orderCol = Some("lsn")).start()
    try {
      // Batch 0 (initial load) already carries two versions of key 2.
      in.addData(Change(1L, 10L, "a"), Change(2L, 11L, "b"), Change(2L, 12L, "b2"))
      q.processAllAvailable()
      // Batch 1: key 1 changes twice more, key 3 appears.
      in.addData(Change(1L, 20L, "a2"), Change(1L, 21L, "a3"), Change(3L, 22L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val got = SnapshotTable.readMor(spark, table, 2L, "doc_id")
      .as[Change].collect().map(c => c.doc_id -> (c.lsn, c.text)).toMap
    assert(got === Map(1L -> (21L, "a3"), 2L -> (12L, "b2"), 3L -> (22L, "c")),
      "each key serves exactly its highest-lsn row")

    // The None contract is enforced, not assumed: a key-duplicate batch
    // is refused BEFORE its manifest publishes, and the table still
    // serves the pre-refusal state.
    val ex = intercept[IllegalArgumentException] {
      SnapshotStream.upsertBatch(
        Seq(Change(3L, 30L, "x"), Change(3L, 31L, "y")).toDS().toDF(),
        2L, table, "doc_id")
    }
    assert(ex.getMessage.contains("duplicate keys"))
    assert(SnapshotTable.generations(spark, table) === Seq(1L, 2L))
  }
}
