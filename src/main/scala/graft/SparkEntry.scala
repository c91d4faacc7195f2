package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._
import graft.sources.SourceOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator registry (one entry per implemented
  * operator from SURVEY.md §2.1/§2.4); `oracleSql` holds the DuckDB twin
  * for every SQL-expressible query. Entries present in `queries` but
  * absent from `oracleSql` (custom hash functions with no DuckDB
  * equivalent) get the driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship §2.2 Search pipeline on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefOps.searchCount(spark, "/root/testdata/sf0.001")

  private val registry: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RefOps.queries, RefOps.oracle),
      (RelOps.queries, RelOps.oracle),
      (StarOps.queries, StarOps.oracle),
      (ScalarOps.queries, ScalarOps.oracle),
      (TextOps.queries, TextOps.oracle),
      (DedupOps.queries, DedupOps.oracle),
      (SampleOps.queries, SampleOps.oracle),
      (GraphOps.queries, GraphOps.oracle),
      (AuditOps.queries, AuditOps.oracle),
      (VectorQueries.queries, VectorQueries.oracle),
      (EventOps.queries, EventOps.oracle),
      (MultimodalOps.queries, MultimodalOps.oracle),
      (SourceOps.queries, SourceOps.oracle),
    )

  /** Merge per-file maps, REFUSING duplicate keys: `Map ++` silently
    * lets the later file shadow the earlier one, which would drop a
    * registered query (and its oracle pairing) without any gate
    * noticing — the shadowed query simply stops being verified.
    */
  private def merged[V](maps: Iterator[Map[String, V]]): Map[String, V] =
    maps.reduce { (a, b) =>
      val dup = a.keySet.intersect(b.keySet)
      require(dup.isEmpty,
        s"duplicate query registration across files: ${dup.toSeq.sorted.mkString(", ")}")
      a ++ b
    }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(registry.iterator.map(_._1))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    merged(registry.iterator.map(_._2))

  /** [[oracleSql]] with the dir-dependent twins (src_dirscan's real
    * directory glob) generated for the sf dir Verify actually runs at.
    */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    oracleSql ++ SourceOps.oracleFor(sfDir)
}
