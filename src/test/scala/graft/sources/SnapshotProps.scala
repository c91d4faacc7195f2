package graft.sources

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Model-based drill of the manifest layer: a random sequence of
  * append / delete / compact / expire operations against a REAL
  * on-disk table, checked after every run against a trivial in-memory
  * model (generation → (data multiset, accumulated tombstone set)).
  * What this pins beyond the example-based spec: content correctness
  * under arbitrary op interleavings (append-after-compact, double
  * compaction, delete-then-append with the key-level suppression
  * semantic, expiring mid-history), that every surviving generation
  * stays readable after every later operation, that expire never
  * deletes a file (data OR tombstone) a surviving manifest still
  * references, and CDC conservation across every surviving hop.
  */
object SnapshotProps extends Properties("SnapshotTable") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  sealed trait Op
  case class Append(ids: List[Long]) extends Op
  case class Delete(keys: List[Long]) extends Op
  case object Compact extends Op
  case object Expire extends Op
  case class DupCommit(ids: List[Long]) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(Append(_))),
    2 -> Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(Delete(_))),
    2 -> Gen.const(Compact),
    2 -> Gen.const(Expire),
    2 -> Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(DupCommit(_))))

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  property("random append/delete/compact/expire sequences match the model") =
    Prop.forAll(Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, genOp))) { ops =>
      import spark.implicits._
      val table = graft.Scratch.dir(s"snapprops_${seq.incrementAndGet()}")
      // model: gen -> (data id list sorted with duplicates, tombstones).
      var model = Map.empty[Long, (List[Long], Set[Long])]
      var gen = 0L
      def state(g: Long): (List[Long], Set[Long]) =
        model.getOrElse(g, (Nil, Set.empty))
      def visible(g: Long): List[Long] = {
        val (data, tomb) = state(g)
        data.filterNot(tomb)
      }
      def commitBatch(ids: List[Long]): Unit = {
        val carry = if (gen == 0) None else Some(gen)
        SnapshotTable.commit(ids.toDF("id").repartition(2), table, gen + 1, carry)
        val (data, tomb) = state(gen)
        model += (gen + 1) -> (((data ++ ids).sorted, tomb))
        gen += 1
      }
      // Seed so compact/expire-first sequences have something to act on.
      commitBatch(List(1L, 2L, 3L))
      ops.foreach {
        case Append(ids) => commitBatch(ids)
        // Key-level MoR delete: tombstones accumulate and suppress the
        // key in every later generation until a materialization.
        case Delete(keys) =>
          SnapshotTable.commitDeletes(keys.toDF("id"), table, gen + 1,
            carryFrom = gen)
          val (data, tomb) = state(gen)
          model += (gen + 1) -> ((data, tomb ++ keys))
          gen += 1
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
          if (state(gen)._2.isEmpty) {
            SnapshotTable.compact(spark, table, gen, 2)
            model += (gen + 1) -> state(gen)
          } else {
            // A tombstoned generation refuses plain compaction (it
            // would resurrect deleted rows); the sanctioned move is the
            // key-aware materialization, which also purges.
            val refused =
              try { SnapshotTable.compact(spark, table, gen, 2); false }
              catch { case _: IllegalArgumentException => true }
            assert(refused, "compact must refuse a tombstoned generation")
            SnapshotTable.commit(
              SnapshotTable.readMor(spark, table, gen, "id").repartition(2),
              table, gen + 1)
            model += (gen + 1) -> ((visible(gen).sorted, Set.empty[Long]))
          }
          gen += 1
        case Expire if model.size > 1 =>
          val keepFrom = model.keys.toSeq.sorted.apply(1) // drop the oldest gen
          SnapshotTable.expire(spark, table, keepFrom)
          model = model.filter(_._1 >= keepFrom)
        case Expire => ()
      }
      val live = SnapshotTable.generations(spark, table)
      val gensMatch = live == model.keys.toSeq.sorted
      // Both lenses must match: the raw data files (readAs) and the
      // tombstone-applied view (readMor).
      val contentMatch = model.forall { case (g, (data, _)) =>
        SnapshotTable.readAs(spark, table, g)
          .as[Long].collect().toList.sorted == data &&
          SnapshotTable.readMor(spark, table, g, "id")
            .as[Long].collect().toList.sorted == visible(g).sorted
      }
      // Every file any surviving manifest references — data AND
      // tombstone — must still exist (expire deleted orphans only).
      val filesIntact = live.forall { g =>
        (SnapshotTable.listFiles(spark, table, g) ++
          SnapshotTable.listDeleteFiles(spark, table, g)).forall { p =>
          new java.io.File(p.stripPrefix("file:")).exists
        }
      }
      // CDC conservation across every surviving hop, whatever op
      // produced it (append, delete — a no-data-change hop — or
      // compaction): the DATA manifest diff must satisfy
      // data(g−1) ⊎ added = data(g) ⊎ removed as id multisets — the
      // invariant src_snapshot_changes and the streaming source's
      // planner both stand on.
      val cdcMatch = live.sliding(2).forall {
        case scala.collection.Seq(a, b) if b == a + 1 =>
          val (added, removed) = SnapshotTable.changedFiles(spark, table, a, b)
          def rows(ps: Seq[String]): List[Long] =
            if (ps.isEmpty) Nil
            else spark.read.parquet(ps: _*).as[Long].collect().toList
          (rows(added) ++ state(a)._1).sorted == (rows(removed) ++ state(b)._1).sorted
        case _ => true
      }
      gensMatch && contentMatch && filesIntact && cdcMatch
    }
}
