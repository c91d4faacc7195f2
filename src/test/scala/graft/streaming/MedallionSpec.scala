package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.SnapshotTable

/** The medallion loop CLOSED across two tables: an append-only BRONZE
  * table ingests the raw change feed (every version kept —
  * [[SnapshotStream.snapshotIngest]]), and a SILVER table maintains the
  * latest-row-per-key materialization incrementally — the DSv2
  * connector TAILS bronze (each micro-batch = the appended files, never
  * the table) and [[SnapshotStream.cdcApply]] upserts the tail into
  * silver with `orderCol` convergence. What this pins beyond each
  * piece's own spec: the source's offsets and the sink's
  * generation-per-batch replay compose — a kill-and-restart of BOTH
  * queries resumes from BOTH checkpoints without duplicating or losing
  * a change, because the bronze tail re-plans its hop from immutable
  * manifests and the silver upsert re-lands its own generation.
  */
class MedallionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bronze append tail -> silver latest-per-key upsert, restart-safe end to end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("medallion").toString
    val (bronze, bronzeCkpt) = (s"$root/bronze", s"$root/bckpt")
    val (silver, silverCkpt) = (s"$root/silver", s"$root/sckpt")

    val in = MemoryStream[Change]
    def bronzeQ() = SnapshotStream.ingest(in.toDS().toDF(), bronze, bronzeCkpt).start()
    def silverQ() = SnapshotStream.cdcApply(
      spark.readStream.format(classOf[SnapshotSourceProvider].getName)
        .option("path", bronze).load(),
      silver, "doc_id", silverCkpt, orderCol = Some("lsn")).start()

    def silverLatest: Map[Long, (Long, String)] = {
      val g = SnapshotTable.generations(spark, silver).max
      SnapshotTable.readMor(spark, silver, g, "doc_id")
        .as[Change].collect().map(c => c.doc_id -> (c.lsn, c.text)).toMap
    }

    // Phase 1: initial load + an in-batch double change of key 2.
    val b1 = bronzeQ()
    try {
      in.addData(Change(1L, 10L, "a"), Change(2L, 11L, "b"), Change(2L, 12L, "b2"))
      b1.processAllAvailable()
      in.addData(Change(3L, 13L, "c"), Change(1L, 14L, "a2"))
      b1.processAllAvailable()
    } finally b1.stop()
    val s1 = silverQ()
    try s1.processAllAvailable() finally s1.stop()
    assert(silverLatest === Map(1L -> (14L, "a2"), 2L -> (12L, "b2"), 3L -> (13L, "c")))
    // Bronze keeps EVERY version (the raw zone); silver holds one row
    // per key (the curated zone).
    val bronzeGens = SnapshotTable.generations(spark, bronze)
    assert(SnapshotTable.readAs(spark, bronze, bronzeGens.max).count() === 5L)

    // Phase 2: both queries are DOWN while changes arrive; restarts
    // resume from their checkpoints and converge without duplicates.
    in.addData(Change(2L, 20L, "b3"), Change(4L, 21L, "d"))
    val b2 = bronzeQ()
    try b2.processAllAvailable() finally b2.stop()
    val s2 = silverQ()
    try s2.processAllAvailable() finally s2.stop()
    assert(silverLatest === Map(1L -> (14L, "a2"), 2L -> (20L, "b3"),
      3L -> (13L, "c"), 4L -> (21L, "d")))
    // Time travel on silver still serves the pre-restart view.
    assert(SnapshotTable.readMor(spark, silver, 1L, "doc_id")
      .as[Change].collect().map(c => c.doc_id -> c.text).toMap
      === Map(1L -> "a2", 2L -> "b2", 3L -> "c"))
  }
}
