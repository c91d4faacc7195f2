package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  *
  * Queries execute through the noop data-source writer, which runs the
  * registered plan EXACTLY as written — a `count()` on top would let
  * Catalyst prune columns and eliminate sorts, silently skipping the
  * work global-sort/projection queries exist to measure. A warmup pass
  * (untimed) absorbs JVM/codegen/session startup so the first measured
  * query isn't charged for it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup (untimed): exercise codegen, shuffle, and touch every big
    // table once so the first measured query isn't charged for cold
    // parquet footers / page-cache misses — alphabetical order used to
    // tax agg_* with lineitem's first scan.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try exec("group_count") catch { case _: Throwable => () }
    Seq(Tables.lineitem _, Tables.orders _, Tables.customer _,
      Tables.events _, Tables.documents _, Tables.embeddings _).foreach { t =>
      try t(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      try exec(name) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
