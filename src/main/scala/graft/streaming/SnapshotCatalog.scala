package graft.streaming

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotTable

/** DataSource V2 `TableCatalog` over a warehouse directory of snapshot
  * tables — the SQL-first front door to the table format: register it
  * once (`spark.sql.catalog.<name>` = this class,
  * `spark.sql.catalog.<name>.warehouse` = a directory) and every
  * committed table under the warehouse is addressable as
  * `<name>.<table>` (namespaces map to subdirectories) from plain SQL:
  * `SELECT`, `INSERT INTO` (the connector's first-writer-wins append
  * write), and time travel via `VERSION AS OF <generation>` — Spark
  * routes the version string to [[loadTable(ident, version)]], which
  * pins the generation on the returned table so the scan resolves the
  * snapshot's own schema and manifest (an explicit `generation` read
  * option still wins). All resolution is DRIVER-side metadata I/O
  * (manifest listings through the same Group-API readers the rest of
  * the layer uses); no Spark job runs until the scan plans, so a
  * 100 TB warehouse costs a directory listing to address.
  *
  * Deliberately a CATALOG OF EXTERNAL TABLES: tables are created and
  * maintained by the library's commands (commit/append/compact/...),
  * so `CREATE TABLE` / `ALTER` / `DROP` / `RENAME` through SQL are
  * refused loudly rather than half-implemented — the DML surface
  * (read, time travel, insert) is the part external consumers need.
  * The MAINTENANCE commands ARE reachable from SQL, as stored
  * procedures rather than DDL: `CALL <name>.system.compact/expire/
  * rollback/history(...)` ([[SnapshotProcedures]]) wrap the library
  * commands verbatim, so the SQL front door covers the whole table
  * lifecycle without a second implementation of any of it.
  */
class SnapshotCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"snapshot catalog '$name' requires spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  private def rootOf(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  private def spark: SparkSession = SparkSession.active

  /** A directory is a table iff it has at least one committed
    * generation — crash debris and non-table dirs are invisible.
    * ONLY the expected not-a-table shape is swallowed (a `manifests`
    * entry whose `gen=` names do not parse, i.e. foreign directory
    * layout); a genuine IO/permission failure while listing PROPAGATES
    * — masking it as `NoSuchTableException` would turn a transient
    * filesystem outage into "table does not exist".
    */
  private def isTable(root: String): Boolean =
    try SnapshotTable.generations(spark, root).nonEmpty
    catch { case _: NumberFormatException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      // ENUMERATION posture: one unreadable sibling entry must not
      // abort the whole namespace listing and hide every healthy
      // table — skip it here; a DIRECT lookup of that entry
      // (loadTable/tableExists) still propagates its IO failure.
      .filter { n =>
        try isTable((dir +: Seq(n)).mkString("/"))
        catch { case _: Exception => false }
      }.sorted
      .map(n => Identifier.of(namespace, n))
  }

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    if (isTable(root)) return new SnapshotSourceTable(root,
      SnapshotSource.latestSchema(root))
    // METADATA tables (the Iceberg `t.files` / `t.history` idiom): a
    // name that is not itself a committed table but whose PARENT path
    // is one serves that table's metadata relation — `SELECT * FROM
    // <cat>.<table>.files` inspects the current snapshot's file
    // inventory from SQL. Real tables win by construction (checked
    // first), matching the reference idiom's precedence.
    // Kind matching is CASE-INSENSITIVE, like Spark's default
    // identifier resolution (and Iceberg's metadata-table names).
    val kind = ident.name().toLowerCase(java.util.Locale.ROOT)
    if (ident.namespace().nonEmpty && SnapshotMetaTable.Kinds.contains(kind)) {
      val parent = (warehouse +: ident.namespace().toSeq).mkString("/")
      if (isTable(parent))
        return new SnapshotMetaTable(parent, kind)
    }
    throw new NoSuchTableException(ident)
  }

  /** `VERSION AS OF <generation>`: the returned table is pinned to the
    * named generation — schema AND files resolve against that
    * snapshot, so a probe after a schema evolution sees the columns
    * the snapshot actually carried.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    val gen =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"snapshot catalog versions are generation numbers; got '$version'")
      }
    val gens = SnapshotTable.generations(spark, root)
    require(gens.contains(gen),
      s"generation $gen does not exist at $root (have ${gens.mkString(", ")})")
    new SnapshotSourceTable(root, SnapshotSource.schemaAt(root, gen), Some(gen))
  }

  /** `TIMESTAMP AS OF <ts>` (Spark hands `ts` in MICROSECONDS):
    * resolves to the LATEST generation whose recorded commit
    * wall-clock — the `.ts=` marker published atomically inside the
    * manifest ([[SnapshotTable.commitTimestamp]]), never a file mtime,
    * which copies/restores do not preserve — is ≤ `ts`, then pins that
    * generation exactly like `VERSION AS OF`. Monotonic stamping at
    * commit ([[SnapshotTable]]'s writeManifest) is what makes "latest
    * committed ≤ ts" well-defined. A timestamp before the table's
    * first commit is refused (there is no snapshot to serve), and a
    * lineage with any pre-recording manifest is refused rather than
    * part-resolved — `VERSION AS OF` still serves those.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    // Shared resolution policy (SnapshotTable.stampedGenerations):
    // a part-stamped legacy lineage refuses rather than part-resolves.
    val stamped = SnapshotTable.stampedGenerations(spark, root)
    val admitted = stamped.collect {
      case (g, ms) if ms * 1000L <= timestamp => g
    }
    require(admitted.nonEmpty,
      s"timestamp ${timestamp} us precedes the first commit of $root " +
        s"(earliest: ${stamped.head._2} ms); there is no snapshot to serve")
    val gen = admitted.max
    new SnapshotSourceTable(root, SnapshotSource.schemaAt(root, gen), Some(gen))
  }

  override def tableExists(ident: Identifier): Boolean = isTable(rootOf(ident))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "snapshot tables are created by the library's commit command; " +
        "the catalog serves reads, time travel, and INSERT INTO")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "snapshot schema evolves through committed generations, not ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "refusing DROP through the catalog; use the library's expire/vacuum commands")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "snapshot tables are addressed by path; rename the directory out-of-band")

  /** `CALL <catalog>.system.<proc>(...)` — the maintenance surface
    * ([[SnapshotProcedures]]). Only the `system` namespace exists.
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array(SnapshotProcedures.Namespace)),
      s"snapshot procedures live under the '${SnapshotProcedures.Namespace}' " +
        s"namespace: CALL $catalogName.system.<proc>(...); " +
        s"got ${ident.namespace().mkString(".")}")
    SnapshotProcedures.load(warehouse, ident.name())
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array(SnapshotProcedures.Namespace)))
      SnapshotProcedures.names
        .map(Identifier.of(Array(SnapshotProcedures.Namespace), _)).toArray
    else Array.empty
}
