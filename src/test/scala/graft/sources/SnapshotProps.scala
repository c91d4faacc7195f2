package graft.sources

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Model-based drill of the manifest layer: a random sequence of
  * append / delete / upsert / compact / expire / rollback / WAP /
  * clone / vacuum operations against a REAL on-disk table, checked after every
  * run against a trivial in-memory model (generation → (data multiset,
  * accumulated tombstone set)). What this pins beyond the
  * example-based spec: content correctness under arbitrary op
  * interleavings (append-after-compact, double compaction,
  * delete-then-append with the key-level suppression semantic,
  * expiring mid-history, restore-of-a-tombstoned-snapshot,
  * append-after-restore, vacuum racing nothing), that every surviving
  * generation stays readable after every later operation, that expire
  * never deletes a file (data OR tombstone) a surviving manifest still
  * references, that WAP staging never advances the lineage and a
  * published staged batch lands exactly once, that a shallow clone
  * reproduces its source snapshot, that vacuum is idempotent, that a
  * key-duplicate upsert batch is refused without publishing, and CDC
  * conservation across every surviving hop.
  */
object SnapshotProps extends Properties("SnapshotTable") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  sealed trait Op
  case class Append(ids: List[Long]) extends Op
  case class Delete(keys: List[Long]) extends Op
  case class Upsert(keys: List[Long]) extends Op
  case object Compact extends Op
  case object Expire extends Op
  case class DupCommit(ids: List[Long]) extends Op
  case class DupKeyUpsert(key: Long) extends Op
  case class Rollback(pick: Int) extends Op
  case class Wap(ids: List[Long]) extends Op
  case object CloneCheck extends Op
  case object Vacuum extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(Append(_))),
    2 -> Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(Delete(_))),
    2 -> Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(ks => Upsert(ks.distinct))),
    2 -> Gen.const(Compact),
    2 -> Gen.const(Expire),
    2 -> Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(DupCommit(_))),
    1 -> Gen.chooseNum(0L, 500L).map(DupKeyUpsert(_)),
    2 -> Gen.chooseNum(0, 1000).map(Rollback(_)),
    2 -> Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(Wap(_))),
    1 -> Gen.const(CloneCheck),
    1 -> Gen.const(Vacuum))

  /** WAP audit predicate for the drill: a batch with any id above 400
    * is "bad" and must be abandoned.
    */
  private def wapBad(ids: List[Long]): Boolean = ids.exists(_ > 400L)

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  property("random append/delete/upsert/compact/expire/rollback/wap/clone/vacuum sequences match the model") =
    Prop.forAll(Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, genOp))) { ops =>
      import spark.implicits._
      val table = graft.Scratch.dir(s"snapprops_${seq.incrementAndGet()}")
      // model: gen -> (data rows as (id, seq), tombstones as
      // (key, seq)); seq = None is the legacy unstamped form. A
      // tombstone hides a data row iff same key AND (legacy OR the
      // data row's seq (absent = 0) is strictly smaller).
      var model = Map.empty[Long, (List[(Long, Option[Long])], Set[(Long, Option[Long])])]
      var gen = 0L
      def state(g: Long): (List[(Long, Option[Long])], Set[(Long, Option[Long])]) =
        model.getOrElse(g, (Nil, Set.empty))
      def ids(g: Long): List[Long] = state(g)._1.map(_._1).sorted
      def visible(g: Long): List[Long] = {
        val (data, tomb) = state(g)
        data.filterNot { case (id, s) =>
          tomb.exists { case (k, ds) =>
            k == id && ds.forall(_ > s.getOrElse(0L)) }
        }.map(_._1)
      }
      // publishAppend stamps fresh rows only in a seq-carrying lineage.
      def freshSeq(nextGen: Long): Option[Long] = {
        val (data, tomb) = state(gen)
        if (data.exists(_._2.isDefined) || tomb.exists(_._2.isDefined))
          Some(nextGen)
        else None
      }
      def commitBatch(batch: List[Long]): Unit = {
        val carry = if (gen == 0) None else Some(gen)
        SnapshotTable.commit(batch.toDF("id").repartition(2), table, gen + 1, carry)
        val (data, tomb) = state(gen)
        val fs = freshSeq(gen + 1)
        model += (gen + 1) -> (((data ++ batch.map(id => (id, fs))), tomb))
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
          model += (gen + 1) -> ((data, tomb ++ keys.map(k => (k, None))))
          gen += 1
        // One-commit MERGE/UPSERT: a seq-stamped equality-delete of the
        // keys plus stamped fresh rows — the old rows (whatever their
        // multiplicity) disappear, exactly one new row per key
        // survives, and NOTHING later than the stamp is touched.
        case Upsert(keys) if keys.nonEmpty =>
          SnapshotTable.commitUpsert(keys.toDF("id").repartition(2),
            table, gen + 1, "id", carryFrom = gen)
          val (data, tomb) = state(gen)
          model += (gen + 1) -> ((
            data ++ keys.map(k => (k, Some(gen + 1))),
            tomb ++ keys.map(k => (k, Some(gen + 1)))))
          gen += 1
        case Upsert(_) => ()
        // A batch carrying the same key twice would leave BOTH rows
        // visible forever (each outranks the batch's own tombstone) —
        // commitUpsert must refuse it BEFORE the manifest publishes,
        // leaving the lineage untouched.
        case DupKeyUpsert(k) =>
          val gensBefore = SnapshotTable.generations(spark, table)
          val refused =
            try {
              SnapshotTable.commitUpsert(List(k, k).toDF("id"),
                table, gen + 1, "id", carryFrom = gen); false
            } catch { case _: IllegalArgumentException => true }
          assert(refused, "key-duplicate upsert batch must be refused")
          assert(SnapshotTable.generations(spark, table) == gensBefore,
            "refused upsert must not publish a generation")
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
            model += (gen + 1) -> ((
              visible(gen).sorted.map(id => (id, None: Option[Long])),
              Set.empty[(Long, Option[Long])]))
          }
          gen += 1
        case Expire if model.size > 1 =>
          val keepFrom = model.keys.toSeq.sorted.apply(1) // drop the oldest gen
          SnapshotTable.expire(spark, table, keepFrom)
          model = model.filter(_._1 >= keepFrom)
        case Expire => ()
        // RESTORE to a random surviving generation: the new generation
        // must reproduce that snapshot's data AND tombstones exactly —
        // the model just copies the restored state.
        case Rollback(pick) =>
          val gens = model.keys.toSeq.sorted
          val toGen = gens(pick % gens.size)
          SnapshotTable.rollback(spark, table, toGen, gen + 1)
          model += (gen + 1) -> state(toGen)
          gen += 1
        // Write-audit-publish: stage, audit against the STAGED read,
        // publish only a clean batch. While staged, the generation
        // lineage must not have moved.
        case Wap(ids) =>
          val branch = s"b${seq.incrementAndGet()}"
          SnapshotTable.stage(ids.toDF("id").repartition(2), table, branch)
          assert(SnapshotTable.generations(spark, table).max == gen,
            "staging must not advance the lineage")
          val staged = SnapshotTable.readStaged(spark, table, branch)
            .as[Long].collect().toList.sorted
          assert(staged == ids.sorted, "staged snapshot must hold the batch")
          if (wapBad(ids))
            SnapshotTable.abandonStaged(spark, table, branch)
          else {
            SnapshotTable.publishStaged(spark, table, branch, gen + 1, Some(gen))
            val (data, tomb) = state(gen)
            val fs = freshSeq(gen + 1)
            model += (gen + 1) -> ((data ++ ids.map(id => (id, fs)), tomb))
            gen += 1
          }
        // A shallow clone of the current generation must serve the same
        // rows from the same files, in a table that shares no lineage.
        case CloneCheck =>
          val dest = graft.Scratch.dir(s"snapprops_clone_${seq.incrementAndGet()}")
          SnapshotTable.cloneShallow(spark, table, gen, dest)
          assert(SnapshotTable.readMor(spark, dest, 1L, "id")
            .as[Long].collect().toList.sorted == visible(gen).sorted,
            "clone must reproduce the source snapshot")
        // Vacuum removes only unreferenced debris (e.g. a race loser's
        // staged attempt), and a second sweep finds nothing.
        case Vacuum =>
          SnapshotTable.vacuum(spark, table, minAgeMs = 0L)
          assert(SnapshotTable.vacuum(spark, table, minAgeMs = 0L)._2 == 0L,
            "vacuum must be idempotent")
      }
      val live = SnapshotTable.generations(spark, table)
      val gensMatch = live == model.keys.toSeq.sorted
      // Both lenses must match: the raw data files (readAs) and the
      // tombstone-applied view (readMor).
      val contentMatch = model.forall { case (g, _) =>
        SnapshotTable.readAs(spark, table, g)
          .as[Long].collect().toList.sorted == ids(g) &&
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
          (rows(added) ++ ids(a)).sorted == (rows(removed) ++ ids(b)).sorted
        case _ => true
      }
      gensMatch && contentMatch && filesIntact && cdcMatch
    }
}
