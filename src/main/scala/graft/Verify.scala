package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries dump through a small thread pool — Spark's scheduler runs
  * independent jobs concurrently, so the wall-clock is bounded by the
  * heaviest queries instead of the sum over the whole registry.
  */
object Verify {
  /** Dump every query in `selected` to `outDir/<name>` parquet and
    * return the failure list (name → reason). Two failure classes:
    * the query THREW (the dump is missing — the driver's compare
    * records its own err), or the query succeeded but returned an
    * EMPTY frame at the gate scale — the vacuity class round 13's
    * hand audit found three instances of (`join_anti`, `set_except`,
    * `multimodal_phash` all returned empty frames the DuckDB twin
    * trivially agreed on, gating nothing). An empty result makes any
    * value oracle vacuously true, so it is structurally a FAILURE
    * here: every registered query must bind ≥ 1 row at the scale the
    * driver verifies, or pick a fixture/threshold that does.
    */
  private[graft] def dumpAll(spark: SparkSession, sfDir: String, outDir: String,
      selected: Seq[(String, (SparkSession, String) => DataFrame)]): Seq[(String, String)] = {
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // Per-query dump failures collect here and surface in the separate
    // failed.json artifact (the Bench precedent), so the dump is
    // self-describing: a query that threw writes no parquet — the
    // driver's compare already records an err for it — but the
    // artifact itself says which queries died and why.
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val dumps = selected.map { case (name, fn) =>
      Future {
        try {
          val out = s"$outDir/$name"
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(out)
          // The vacuity gate: read the dump back (one tiny file — the
          // write above coalesced to 1) and require at least one row.
          // Checking the FILES rather than the in-flight frame means a
          // write that silently dropped rows would also trip it.
          if (spark.read.parquet(out).isEmpty) {
            System.err.println(s"[verify] $name VACUOUS: empty result at gate scale")
            failed.add((name, "vacuous: empty result at gate scale"))
          }
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failed.add((name, String.valueOf(e.getMessage)))
        }
      }
    }
    Await.result(Future.sequence(dumps), Duration.Inf)
    pool.shutdown()
    import scala.jdk.CollectionConverters._
    failed.asScala.toSeq.sortBy(_._1)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Mirror Bench: fixed small leaf parallelism so literal-frame
      // file layouts (and thus any layout-sensitive drill) match the
      // benched configuration exactly.
      .config("spark.sql.leafNodeDefaultParallelism", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // The events nanos conf is session-wide and set lazily inside
    // Tables.events on first touch; trigger it once up front so
    // concurrent query threads never race the conf flip.
    try Tables.events(spark, sfDir).schema catch { case _: Throwable => () }

    // Dev-only subset filter (comma-separated names): lets a local run
    // re-verify just the queries a change touched instead of the whole
    // registry. The driver never sets it, so the per-round dump is
    // always complete.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }

    val failed = dumpAll(spark, sfDir, outDir, selected)

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The failure list is a SEPARATE artifact: oracle_sql.json stays a
    // pure name → SQL map (every key a query name — no sentinel key a
    // consumer must special-case, no collision with a query that could
    // legitimately be named "failed").
    val failedJson = failed
      .map { case (n, m) => s"{${q("query")}: ${q(n)}, ${q("error")}: ${q(m)}}" }
      .mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/failed.json"), failedJson)
    val json = SparkEntry.oracleSqlFor(sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
