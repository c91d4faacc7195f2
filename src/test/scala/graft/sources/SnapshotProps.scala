package graft.sources

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Model-based drill of the manifest layer: a random sequence of
  * append / compact / expire operations against a REAL on-disk table,
  * checked after every step against a trivial in-memory model
  * (generation → expected id multiset). What this pins beyond the
  * example-based spec: content correctness under arbitrary op
  * interleavings (append-after-compact, double compaction, expiring
  * mid-history), that every surviving generation stays readable after
  * every later operation, and that expire never deletes a file a
  * surviving manifest still references.
  */
object SnapshotProps extends Properties("SnapshotTable") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  sealed trait Op
  case class Append(ids: List[Long]) extends Op
  case object Compact extends Op
  case object Expire extends Op
  case class DupCommit(ids: List[Long]) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(Append(_))),
    2 -> Gen.const(Compact),
    2 -> Gen.const(Expire),
    2 -> Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(DupCommit(_))))

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  property("random append/compact/expire sequences match the model") =
    Prop.forAll(Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, genOp))) { ops =>
      import spark.implicits._
      val table = graft.Scratch.dir(s"snapprops_${seq.incrementAndGet()}")
      // model: gen -> expected id list (sorted, with duplicates).
      var model = Map.empty[Long, List[Long]]
      var gen = 0L
      def commitBatch(ids: List[Long]): Unit = {
        val carry = if (gen == 0) None else Some(gen)
        SnapshotTable.commit(ids.toDF("id").repartition(2), table, gen + 1, carry)
        model += (gen + 1) -> (model.getOrElse(gen, Nil) ++ ids).sorted
        gen += 1
      }
      // Seed so compact/expire-first sequences have something to act on.
      commitBatch(List(1L, 2L, 3L))
      ops.foreach {
        case Append(ids) => commitBatch(ids)
        // A conflicting writer racing to the CURRENT generation must
        // throw and leave every generation's content and file list
        // untouched — first-writer-wins at any point in the history.
        case DupCommit(ids) =>
          val before = SnapshotTable.listFiles(spark, table, gen)
          val thrown =
            try { SnapshotTable.commit(ids.toDF("id"), table, gen); false }
            catch { case _: IllegalStateException => true }
          assert(thrown, "duplicate commit must be rejected")
          assert(SnapshotTable.listFiles(spark, table, gen) == before,
            "loser must not change the winner's file list")
        case Compact =>
          SnapshotTable.compact(spark, table, gen, 2)
          model += (gen + 1) -> model(gen)
          gen += 1
        case Expire if model.size > 1 =>
          val keepFrom = model.keys.toSeq.sorted.apply(1) // drop the oldest gen
          SnapshotTable.expire(spark, table, keepFrom)
          model = model.filter(_._1 >= keepFrom)
        case Expire => ()
      }
      val live = SnapshotTable.generations(spark, table)
      val gensMatch = live == model.keys.toSeq.sorted
      val contentMatch = model.forall { case (g, expect) =>
        SnapshotTable.readAs(spark, table, g)
          .as[Long].collect().toList.sorted == expect
      }
      // Every file any surviving manifest references must still exist
      // (expire deleted orphans only).
      val filesIntact = live.forall { g =>
        SnapshotTable.listFiles(spark, table, g).forall { p =>
          new java.io.File(p.stripPrefix("file:")).exists
        }
      }
      // CDC conservation across every surviving hop, whatever op
      // produced it (append OR compaction): the manifest diff must
      // satisfy model(g−1) ⊎ added = model(g) ⊎ removed as id
      // multisets — the invariant src_snapshot_changes and the
      // streaming source's planner both stand on.
      val cdcMatch = live.sliding(2).forall {
        case scala.collection.Seq(a, b) if b == a + 1 =>
          val (added, removed) = SnapshotTable.changedFiles(spark, table, a, b)
          def rows(ps: Seq[String]): List[Long] =
            if (ps.isEmpty) Nil
            else spark.read.parquet(ps: _*).as[Long].collect().toList
          (rows(added) ++ model(a)).sorted == (rows(removed) ++ model(b)).sorted
        case _ => true
      }
      gensMatch && contentMatch && filesIntact && cdcMatch
    }
}
