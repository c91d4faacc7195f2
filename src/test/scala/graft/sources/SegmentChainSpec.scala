package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Deep segment chains: the checkpoint re-roots resolution and makes
  * ancestors expirable, while an un-checkpointed chain's ancestors are
  * all protected. This is the property completing the segments story:
  * resolution depth is bounded by the distance to the last full-carry
  * checkpoint, not by table age — pinned behaviorally by expiring
  * everything below a mid-chain checkpoint and resolving the head
  * afterwards (a walk that still needed a retired manifest would fail
  * loudly on the broken-chain guard).
  */
class SegmentChainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def seg(table: String, g: Long, parent: Option[Long]): Unit =
    SnapshotTable.commitSegment(
      spark.range(g, g + 1).toDF("id").repartition(1), table, g, parent)

  test("expire keeps every ancestor of an un-checkpointed chain") {
    val table = graft.Scratch.dir("segchain_nockpt")
    (1L to 8L).foreach(g => seg(table, g, if (g == 1L) None else Some(g - 1)))
    // Every dead generation is on the live head's chain — nothing may
    // retire, no file may delete.
    val (retired, orphans) = SnapshotTable.expire(spark, table, keepFrom = 8L)
    assert(retired == 0L && orphans == 0L)
    assert(SnapshotTable.generations(spark, table) == (1L to 8L))
    assert(SnapshotTable.readSegmented(spark, table, 8L).count() == 8L)
  }

  test("mid-chain checkpoint resets resolution depth and frees ancestors") {
    val table = graft.Scratch.dir("segchain_ckpt")
    val N = 40L
    val ck = 21L
    (1L until ck).foreach(g => seg(table, g, if (g == 1L) None else Some(g - 1)))
    // Full-carry checkpoint BY REFERENCE: zero data written, chain
    // re-rooted (no parent row), plain readers work again.
    SnapshotTable.publishAppend(spark, table, ck,
      SnapshotTable.resolvedFiles(spark, table, ck - 1), carryFrom = None,
      action = "checkpoint")
    (ck + 1 to N).foreach(g => seg(table, g, Some(g - 1)))

    // Everything below the checkpoint retires (the checkpoint has no
    // parent reference, so no live chain reaches them) — but ZERO data
    // files delete: the checkpoint carries the ancestors' files by
    // reference, and expire's kept set covers by-reference carries.
    val (retired, orphans) = SnapshotTable.expire(spark, table, keepFrom = ck)
    assert(retired == ck - 1)
    assert(orphans == 0L)
    assert(SnapshotTable.generations(spark, table) == (ck to N))

    // The head still resolves its FULL history through the checkpoint:
    // one file per original segment, content intact, and the walk never
    // needs a retired manifest (a deeper walk would throw the
    // broken-chain IllegalStateException).
    // One file per ORIGINAL segment (the checkpoint itself wrote no
    // data): 20 pre-checkpoint + 19 post-checkpoint.
    val files = SnapshotTable.resolvedFiles(spark, table, N)
    assert(files.size == N - 1)
    val content = SnapshotTable.readSegmented(spark, table, N)
    assert(content.count() == N - 1)
    assert(content.agg(sum("id")).head.getLong(0) == N * (N + 1) / 2 - ck)

    // The checkpoint generation itself serves plain readers mid-lineage.
    assert(SnapshotTable.readAs(spark, table, ck).count() == ck - 1)

    // Depth reset, directly: a PRE-checkpoint head is no longer
    // resolvable (its manifest chain was retired), while every
    // post-checkpoint head is.
    intercept[Exception] { SnapshotTable.resolvedFiles(spark, table, ck - 1) }
    (ck to N).foreach { g =>
      assert(SnapshotTable.resolvedFiles(spark, table, g).size == (ck - 1) + (g - ck))
    }
  }
}
