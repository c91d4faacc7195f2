package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets a real
  * FileSourceScanExec: filters and column pruning push into the scan, and
  * at cluster scale the same code paths handle splittable multi-file
  * datasets without change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized per-(path, nanos-conf) parquet schemas: the fixture
    * tables are immutable, and `spark.read.parquet` re-infers the
    * schema (a footer read + file listing) on EVERY call — ~80 ms of
    * driver latency per read on the bench fixture, paid 2-4× per
    * query across the whole registry. Production keeps table schemas
    * in a catalog for exactly this reason; the cache is the same
    * metadata move (schemas only — every query still scans the
    * parquet data). Keyed on the nanosAsLong conf because it changes
    * what schema inference returns for nanosecond timestamp columns
    * ([[events]] may flip it mid-session).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = path + "#" +
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    // Inference failures (the events nanos probe) propagate uncached.
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.ts` is parquet timestamp[ns]. Spark's native timestamp is
    * microseconds, so depending on reader config the column arrives as
    * TIMESTAMP(_NTZ) or (with `legacy.parquet.nanosAsLong`) as raw Long
    * nanos. Normalize to a session-TZ (UTC) TimestampType column named
    * `ts` truncated to microseconds — the same truncation DuckDB applies,
    * keeping oracle parity.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    def isNanosUnsupported(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(5).exists { c =>
        val m = Option(c.getMessage).getOrElse("")
        m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("TIMESTAMP(NANOS")
      }
    val raw =
      try load(spark, dir, "events")
      catch {
        // Retry ONLY the nanos-unsupported reader failure (checked down
        // the cause chain — it surfaces wrapped in SparkException from
        // executor tasks); anything else propagates rather than silently
        // flipping the session-wide legacy conf.
        case e @ (_: org.apache.spark.sql.AnalysisException | _: org.apache.spark.SparkException)
            if isNanosUnsupported(e) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(spark, dir, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => // nanos since epoch: exact integer division (doubles
        // lose integer precision above 2^53, so `/ 1000L` would be off ±1µs)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // NTZ with a UTC session TZ denotes the same instant.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** A literal comparable against `c`'s actual type — parquet timestamp
    * columns may surface as TIMESTAMP or TIMESTAMP_NTZ depending on
    * `isAdjustedToUTC`, so literals are cast to whatever the column is.
    */
  def tsLit(df: DataFrame, colName: String, value: String) =
    lit(value).cast(df.schema(colName).dataType)
}
