package graft

import org.apache.spark.sql.SparkSession

/** Dev-only fixed-cost profiler (deleted before commit). */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.sources.SnapshotTable

    // flat layout
    val tiny = (1L to 1000L).map(k => (k, k * 2, k % 7)).toDF("k", "v", "s")
    val d1 = graft.Scratch.dir("prof_flat")
    tiny.repartition(3).write.mode("overwrite").parquet(d1)
    val a1 = spark.read.parquet(d1).inputFiles.toSeq.sorted
    val b1 = SnapshotTable.freshFiles(spark, d1)
    println(s"[prof] flat identical: ${a1 == b1} (${a1.size} vs ${b1.size})")

    // partitionBy layout
    val d2 = graft.Scratch.dir("prof_part")
    tiny.repartition(org.apache.spark.sql.functions.col("s"))
      .write.partitionBy("s").mode("overwrite").parquet(d2)
    val a2 = spark.read.parquet(d2).inputFiles.toSeq.sorted
    val b2 = SnapshotTable.freshFiles(spark, d2)
    println(s"[prof] partitioned identical: ${a2 == b2} (${a2.size} vs ${b2.size})")
    if (a2 != b2) {
      println(s"[prof] a2.head=${a2.headOption}")
      println(s"[prof] b2.head=${b2.headOption}")
    }

    // empty dir
    val d3 = graft.Scratch.dir("prof_empty")
    new java.io.File(d3).mkdirs()
    println(s"[prof] empty ok: ${SnapshotTable.freshFiles(spark, d3)}")
    println(s"[prof] missing ok: ${SnapshotTable.freshFiles(spark, d3 + "/nope")}")

    // schema cache: timing + events branch
    def t(label: String, n: Int)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[prof] $label%-42s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
    }
    t("Tables.lineitem [plan only, cached schema]", 20) {
      Tables.lineitem(spark, dir)
    }
    t("Tables.lineitem count", 10) {
      Tables.lineitem(spark, dir).count()
    }
    val ev = Tables.events(spark, dir)
    println(s"[prof] events ts type: ${ev.schema("ts").dataType}")
    println(s"[prof] events count: ${ev.count()}")
    spark.stop()
  }
}
