package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SnapshotTable

/** SQL-callable MAINTENANCE procedures for the snapshot catalog — the
  * Iceberg `CALL catalog.system.<proc>(...)` surface on Spark's
  * DataSource V2 stored-procedure API ([[SnapshotCatalog]] implements
  * `ProcedureCatalog`): the lifecycle commands an external SQL user
  * needs but DML statements cannot express. Each wraps the
  * library's existing command verbatim — same guards, same
  * first-writer-wins commits — and returns a small summary relation
  * (a `LocalScan`; all side effects run DRIVER-side on metadata, no
  * job is scheduled for the call itself except compact's rewrite):
  *
  *  - `compact(tbl, from_gen, files)` — bin-pack `from_gen` into
  *    `from_gen + 1` ([[SnapshotTable.compact]]); time travel to the
  *    pre-compaction generation keeps serving.
  *  - `expire(tbl, keep_from)` — retire generations `< keep_from`
  *    ([[SnapshotTable.expire]]: manifests first, then
  *    no-longer-referenced data files; live segment chains protected).
  *  - `expire_before(tbl, ts_ms)` — the TIME-based retention form
  *    ("keep 7 days"): resolves the cutoff generation through the
  *    shared commit-stamp policy, then runs the same expire.
  *  - `rollback(tbl, to_gen)` — restore `to_gen`'s manifest as a NEW
  *    latest generation ([[SnapshotTable.rollback]]; history is
  *    never rewritten).
  *  - `history(tbl)` — one row per generation: recorded action,
  *    commit wall-clock, data/tombstone file counts (the DESCRIBE
  *    HISTORY analogue, straight off the manifests).
  *  - `vacuum(tbl, min_age_ms)` — delete files no surviving manifest
  *    or WAP branch references ([[SnapshotTable.vacuum]]; the age
  *    guard protects in-flight writers' staged files — pass 0 only
  *    in a quiesced maintenance window).
  *
  * `tbl` is the table's catalog name (warehouse-relative,
  * `ns.name` dots for namespaces), resolved through the SAME path
  * logic as table lookups so `CALL` and `SELECT` can never disagree
  * about which directory a name means.
  */
private[streaming] object SnapshotProcedures {

  val Namespace = "system"

  private def spark: SparkSession = SparkSession.active

  val names: Seq[String] =
    Seq("abandon_branch", "analyze", "changes", "compact",
      "compact_partition", "drop", "expire", "expire_before", "history",
      "index_bloom", "publish_branch", "rollback", "vacuum")

  def load(warehouse: String, name: String): UnboundProcedure = {
    def rootOf(tbl: String): String = {
      val root = (warehouse +: tbl.split('.').toSeq).mkString("/")
      require(SnapshotTable.generations(spark, root).nonEmpty,
        s"procedure target '$tbl' is not a committed snapshot table " +
          s"under $warehouse")
      root
    }
    name match {
      case "compact" => proc("compact",
        "bin-pack a generation into the next one; history keeps serving",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("from_gen", LongType).build(),
          ProcedureParameter.in("files", IntegerType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("compacted_gen", LongType),
          StructField("new_gen", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val fromGen = in.getLong(1)
        val files = in.getInt(2)
        SnapshotTable.compact(spark, rootOf(tbl), fromGen, files)
        Array(row(UTF8String.fromString(tbl), fromGen, fromGen + 1L))
      }
      case "analyze" => proc("analyze",
        "record zone maps (+null counts) for the latest snapshot from parquet footers",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("columns", StringType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("new_gen", LongType),
          StructField("n_columns", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val cols = in.getUTF8String(1).toString.split(',').toSeq
          .map(_.trim).filter(_.nonEmpty)
        val newGen = SnapshotTable.analyze(spark, rootOf(tbl), cols)
        Array(row(UTF8String.fromString(tbl), newGen, cols.size.toLong))
      }
      case "index_bloom" => proc("index_bloom",
        "build (or rebuild) the file-level bloom sidecar of one column",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("column", StringType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("column", StringType),
          StructField("n_files", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val col = in.getUTF8String(1).toString
        val root = rootOf(tbl)
        val files = SnapshotTable.listFiles(spark, root,
          SnapshotTable.generations(spark, root).max)
        SnapshotTable.writeBloomIndex(spark, root, col, files)
        Array(row(UTF8String.fromString(tbl), UTF8String.fromString(col),
          files.size.toLong))
      }
      case "compact_partition" => proc("compact_partition",
        "bin-pack ONE identity partition's files; everything else carries verbatim",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("value", LongType).build(),
          ProcedureParameter.in("files", IntegerType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("value", LongType),
          StructField("files_before", LongType),
          StructField("new_gen", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val value = in.getLong(1)
        val (before, newGen) = SnapshotTable.compactPartition(
          spark, rootOf(tbl), value, in.getInt(2))
        Array(row(UTF8String.fromString(tbl), value, before, newGen))
      }
      case "expire" => proc("expire",
        "retire generations below keep_from (manifests first, then orphaned files)",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("keep_from", LongType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("manifests_removed", LongType),
          StructField("data_files_removed", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val (manifests, dataFiles) =
          SnapshotTable.expire(spark, rootOf(tbl), in.getLong(1))
        Array(row(UTF8String.fromString(tbl), manifests, dataFiles))
      }
      case "rollback" => proc("rollback",
        "restore an existing generation's manifest as a NEW latest generation",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("to_gen", LongType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("restored_gen", LongType),
          StructField("as_gen", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val root = rootOf(tbl)
        val toGen = in.getLong(1)
        val asGen = SnapshotTable.generations(spark, root).max + 1L
        SnapshotTable.rollback(spark, root, toGen, asGen)
        Array(row(UTF8String.fromString(tbl), toGen, asGen))
      }
      case "expire_before" => proc("expire_before",
        "retire generations committed strictly before a wall-clock time",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("ts_ms", LongType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("keep_from", LongType),
          StructField("manifests_removed", LongType),
          StructField("data_files_removed", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val root = rootOf(tbl)
        val ts = in.getLong(1)
        // TIME-based retention (the policy users actually configure:
        // "keep 7 days"): the cutoff generation is the earliest one
        // committed AT OR AFTER ts — everything strictly before it
        // retires through the same reference-counted expire. Resolved
        // via the shared stamp policy; a lineage wholly before ts
        // keeps its latest generation (expire's own contract: the
        // newest snapshot always survives).
        val keepFrom = SnapshotTable.stampedGenerations(spark, root)
          .collectFirst { case (g, ms) if ms >= ts => g }
          .getOrElse(SnapshotTable.generations(spark, root).max)
        val (manifests, dataFiles) =
          SnapshotTable.expire(spark, root, keepFrom)
        Array(row(UTF8String.fromString(tbl), keepFrom, manifests, dataFiles))
      }
      case "vacuum" => proc("vacuum",
        "delete unreferenced data files older than min_age_ms (retention guard)",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("min_age_ms", LongType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("files_seen", LongType),
          StructField("orphans_removed", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val (seen, removed) =
          SnapshotTable.vacuum(spark, rootOf(tbl), in.getLong(1))
        Array(row(UTF8String.fromString(tbl), seen, removed))
      }
      case "changes" => proc("changes",
        "the manifest file diff between two generations (incremental-scan view)",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("from_gen", LongType).build(),
          ProcedureParameter.in("to_gen", LongType).build()),
        StructType(Seq(
          StructField("path", StringType),
          StructField("change", StringType),
          StructField("n_rows", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val root = rootOf(tbl)
        val (fromGen, toGen) = (in.getLong(1), in.getLong(2))
        // The Delta CDF / Iceberg incremental-scan view at file
        // granularity: an append hop's added set is exactly the batch
        // (history carries verbatim), a rewrite hop reports both sides
        // honestly. Row counts come from the manifests' recorded stats
        // (one read per side), null on legacy rows — same fallback
        // posture as every stats consumer, without paying footer opens
        // inside a CALL.
        val (added, removed) =
          SnapshotTable.changedFiles(spark, root, fromGen, toGen)
        val statsFrom = SnapshotTable.recordedFileStats(spark, root, fromGen)
        val statsTo = SnapshotTable.recordedFileStats(spark, root, toGen)
        def rows(ps: Seq[String], tag: String,
            stats: Map[String, (Option[Long], Option[Long])]) =
          ps.map(p => row(UTF8String.fromString(p), UTF8String.fromString(tag),
            stats.get(p).flatMap(_._1).map(java.lang.Long.valueOf).orNull))
        (rows(added, "added", statsTo) ++
          rows(removed, "removed", statsFrom)).toArray
      }
      case "publish_branch" => proc("publish_branch",
        "fast-forward an audited WAP branch into the lineage by reference",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("branch", StringType),
          StructField("published_gen", LongType),
          StructField("n_files", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val branch = in.getUTF8String(1).toString
        val root = rootOf(tbl)
        require(SnapshotTable.branches(spark, root).contains(branch),
          s"branch '$branch' of '$tbl' is not staged; nothing to publish")
        val nFiles = SnapshotTable.stagedFiles(spark, root, branch).size.toLong
        val base = SnapshotTable.generations(spark, root).max
        // PUBLISH half of write-audit-publish: the staged files enter
        // the lineage BY REFERENCE (no data moves) and the branch
        // pointer retires — same first-writer-wins commit as any append.
        SnapshotTable.publishStaged(spark, root, branch, base + 1L, Some(base))
        Array(row(UTF8String.fromString(tbl), UTF8String.fromString(branch),
          base + 1L, nFiles))
      }
      case "abandon_branch" => proc("abandon_branch",
        "reject a staged WAP branch: retire the pointer, delete unshared files",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("branch", StringType),
          StructField("n_files_staged", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        val branch = in.getUTF8String(1).toString
        val root = rootOf(tbl)
        require(SnapshotTable.branches(spark, root).contains(branch),
          s"branch '$branch' of '$tbl' is not staged; nothing to abandon")
        val nFiles = SnapshotTable.stagedFiles(spark, root, branch).size.toLong
        SnapshotTable.abandonStaged(spark, root, branch)
        Array(row(UTF8String.fromString(tbl), UTF8String.fromString(branch),
          nFiles))
      }
      case "drop" => proc("drop",
        "retire the whole table: manifests first, then data/branches/indexes",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("force", BooleanType).build()),
        StructType(Seq(
          StructField("table", StringType),
          StructField("generations_removed", LongType),
          StructField("files_removed", LongType))),
        deterministic = false) { in =>
        val tbl = in.getUTF8String(0).toString
        // The SQL-reachable lifecycle terminator ([[SnapshotTable.drop]]):
        // staged branches or surviving history refuse without force,
        // so a CALL cannot silently destroy an audit in flight or
        // time-travel-addressable snapshots.
        val (gens, files) =
          SnapshotTable.drop(spark, rootOf(tbl), in.getBoolean(1))
        Array(row(UTF8String.fromString(tbl), gens, files))
      }
      case "history" => proc("history",
        "one row per generation: action, commit time, file counts",
        Array(ProcedureParameter.in("tbl", StringType).build()),
        SnapshotMetaTable.schemaOf("history"),
        // Reads only, but the RESULT depends on mutable table state (a
        // concurrent commit changes it) — not deterministic in the
        // invoke-me-anywhere sense the flag promises. Rows are the
        // `<table>.history` metadata relation's, shared so the CALL
        // and SELECT surfaces cannot drift.
        deterministic = false) { in =>
        SnapshotMetaTable.rowsOf(spark,
          rootOf(in.getUTF8String(0).toString), "history")
      }
      case other => throw new UnsupportedOperationException(
        s"unknown snapshot procedure '$other' " +
          s"(have: ${names.mkString(", ")})")
    }
  }

  private def row(values: Any*): InternalRow =
    new GenericInternalRow(values.toArray)

  /** One procedure: `bind` ignores the argument shape (Spark coerces
    * to the declared parameters) and `call` runs `body`, returning its
    * rows as a single driver-local scan.
    */
  private def proc(procName: String, desc: String,
      params: Array[ProcedureParameter], outSchema: StructType,
      deterministic: Boolean)(
      body: InternalRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = deterministic
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            java.util.List.of[Scan](
              SnapshotProcedureResult(outSchema, body(input))).iterator()
        }
    }
}

/** Driver-local result relation of one procedure call. */
private[streaming] case class SnapshotProcedureResult(
    schema: StructType, out: Array[InternalRow]) extends LocalScan {
  override def rows(): Array[InternalRow] = out
  override def readSchema(): StructType = schema
}

/** READ-ONLY metadata relations of one snapshot table, addressed as
  * `<catalog>.<table>.<kind>` ([[SnapshotCatalog.loadTable]]'s
  * fallback). Everything is DRIVER-side manifest/footer metadata —
  * O(files), no data pages — served as a local scan, resolved fresh
  * at scan-build time so a reader always sees the current lineage:
  *
  *  - `files`: the LATEST generation's file inventory — path, KIND
  *    (`data` or `delete`: a merge-on-read generation's tombstone
  *    files list too, so the inventory can never read as "visible
  *    rows" on a MoR lineage), footer row count, on-disk bytes (what
  *    `DESCRIBE DETAIL` / Iceberg's files table answer: how many
  *    files, how big, how balanced).
  *  - `history`: one row per generation — recorded action, commit
  *    wall-clock, data/tombstone file counts (the procedure's
  *    relation as a plain SELECT-able table).
  *  - `branches`: one row per live staged WAP branch — name, file
  *    count, recorded row/byte footprint (audit discovery).
  */
private[streaming] class SnapshotMetaTable(table: String, kind: String)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {

  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
  import org.apache.spark.sql.util.CaseInsensitiveStringMap

  private def spark: SparkSession = SparkSession.active

  override def name(): String = s"snapshot:$table.$kind"

  override def schema(): StructType = SnapshotMetaTable.schemaOf(kind)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      // Row production DEFERS to the first rows() call (cached after):
      // planning a query over a 10k-file table must not pay the
      // O(files) footer/status I/O for an EXPLAIN that never executes.
      override def build(): Scan = new LocalScan {
        private lazy val out =
          SnapshotMetaTable.rowsOf(spark, table, kind)
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = schema()
      }
    }
}

private[streaming] object SnapshotMetaTable {

  val Kinds: Set[String] = Set("files", "history", "branches", "partitions")

  def schemaOf(kind: String): StructType = kind match {
    case "files" => StructType(Seq(
      StructField("path", StringType),
      StructField("kind", StringType),
      StructField("n_rows", LongType),
      StructField("bytes", LongType)))
    case "history" => StructType(Seq(
      StructField("generation", LongType),
      StructField("action", StringType),
      StructField("commit_ts_ms", LongType),
      StructField("n_data_files", LongType),
      StructField("n_delete_files", LongType)))
    case "branches" => StructType(Seq(
      StructField("branch", StringType),
      StructField("n_files", LongType),
      StructField("n_rows", LongType),
      StructField("bytes", LongType)))
    // One row per identity-partition VALUE of the latest snapshot (a
    // NULL value covers files outside the routing: null partitions,
    // DML-rewritten files) — the answer to "how is this table laid
    // out, and is it skewed?" as plain SQL, from manifest rows alone.
    // DATE partition values surface as epoch days (the physical
    // domain every zone map lives in).
    case "partitions" => StructType(Seq(
      StructField("value", LongType),
      StructField("n_files", LongType),
      StructField("n_rows", LongType),
      StructField("bytes", LongType)))
  }

  def rowsOf(spark: SparkSession, table: String,
      kind: String): Array[InternalRow] = kind match {
    case "files" =>
      val gens = SnapshotTable.generations(spark, table)
      require(gens.nonEmpty, s"$table has no committed generation")
      val conf = spark.sparkContext.hadoopConfiguration
      val (_, _, seg) = SnapshotTable.tailEntries(spark, table, gens.max)
      // Stats-recording lineages answer from manifest reads alone —
      // full-carry from ONE, segmented from the chain walk that also
      // folds each segment's recorded rows (resolvedDataRows refuses
      // tombstone rows loudly; segments are append-only by contract).
      // The per-file footer/status round trips below are the LEGACY
      // fallback for pre-recording manifests only.
      val entries: Seq[(String, String, Option[Long], Option[Long])] =
        if (seg)
          SnapshotTable.resolvedDataRows(spark, table, gens.max)
            .map { case (p, n, b) => (p, "data", n, b) }
        else SnapshotTable.fileInventory(spark, table, gens.max)
      entries.map { case (f, k, nRec, bRec) =>
        val n = nRec.getOrElse(
          SnapshotTable.footerRowCounts(spark, Seq(f)).head._2)
        val b = bRec.getOrElse {
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(f), UTF8String.fromString(k), n, b))
      }.toArray
    case "branches" =>
      // Branch DISCOVERY for the WAP auditor: one row per live staged
      // branch with its recorded footprint — the answer to "what is
      // waiting for an audit?" as plain SQL. Stats come off each
      // branch's own manifest (recorded at staging); zero per-file I/O.
      SnapshotTable.branches(spark, table).map { b =>
        val stats = SnapshotTable.stagedFileStats(spark, table, b)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(b), stats.size.toLong,
          if (stats.forall(_._2.isDefined))
            java.lang.Long.valueOf(stats.flatMap(_._2).sum) else null,
          if (stats.forall(_._3.isDefined))
            java.lang.Long.valueOf(stats.flatMap(_._3).sum) else null))
      }.toArray
    case "partitions" =>
      val gens = SnapshotTable.generations(spark, table)
      require(gens.nonEmpty, s"$table has no committed generation")
      val col = SnapshotTable.partitionColumn(spark, table).getOrElse(
        throw new IllegalArgumentException(
          s"$table records no identity partition column; the partitions " +
            "relation applies to PARTITIONED tables"))
      val gen = gens.max
      val vals = SnapshotTable.partitionValues(spark, table, gen, col)
      val inv = SnapshotTable.fileInventory(spark, table, gen)
        .filter(_._2 == "data")
      inv.groupBy(e => vals.get(e._1)).toSeq
        .sortBy { case (v, _) => (v.isEmpty, v.getOrElse(0L)) }
        .map { case (v, es) =>
          new GenericInternalRow(Array[Any](
            v.map(java.lang.Long.valueOf).orNull,
            es.size.toLong,
            if (es.forall(_._3.isDefined))
              java.lang.Long.valueOf(es.flatMap(_._3).sum) else null,
            if (es.forall(_._4.isDefined))
              java.lang.Long.valueOf(es.flatMap(_._4).sum) else null))
        }.toArray
    case "history" =>
      SnapshotTable.generations(spark, table).map { g =>
        val (data, dels, _) = SnapshotTable.tailEntries(spark, table, g)
        // Both markers off ONE listing — a deep lineage would
        // otherwise pay 3 sequential FS round trips per generation.
        val (action, ts) = SnapshotTable.commitMarkers(spark, table, g)
        new GenericInternalRow(Array[Any](
          g, action.map(UTF8String.fromString).orNull,
          ts.map(java.lang.Long.valueOf).orNull,
          data.size.toLong, dels.size.toLong))
      }.toArray
  }
}
