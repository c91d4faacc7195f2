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

    def t(label: String, n: Int)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[prof] $label%-52s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
    }

    val tiny = (1L to 1000L).map(k => (k, k * 2, k % 7)).toDF("k", "v", "s")
    println(s"[prof] tiny partitions: ${tiny.rdd.getNumPartitions}")

    // How many partitions does a local relation write with?
    t("write tiny (as-is)", 10) {
      tiny.write.mode("overwrite").parquet(Scratch.dir("pw_asis"))
    }
    t("write tiny coalesce(1)", 10) {
      tiny.coalesce(1).write.mode("overwrite").parquet(Scratch.dir("pw_c1"))
    }
    t("write tiny repartition(2)", 10) {
      tiny.repartition(2).write.mode("overwrite").parquet(Scratch.dir("pw_r2"))
    }
    t("write tiny repartition(32)", 10) {
      tiny.repartition(32).write.mode("overwrite").parquet(Scratch.dir("pw_r32"))
    }
    // noop as floor: job scheduling only
    t("noop tiny (as-is)", 10) {
      tiny.write.format("noop").mode("overwrite").save()
    }
    // committer v2?
    spark.conf.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    t("write tiny (as-is) committer v2", 10) {
      tiny.write.mode("overwrite").parquet(Scratch.dir("pw_v2"))
    }
    spark.sparkContext.hadoopConfiguration
      .setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", false)
    t("write tiny (as-is) no _SUCCESS", 10) {
      tiny.write.mode("overwrite").parquet(Scratch.dir("pw_ns"))
    }
    // streaming-ish: partitionBy overwrite dynamic
    spark.sparkContext.hadoopConfiguration
      .setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
    t("write tiny partitionBy dyn-overwrite", 10) {
      tiny.withColumn("batch_id", org.apache.spark.sql.functions.lit(1L))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(Scratch.dir("pw_dyn"))
    }
    t("commit tiny via SnapshotTable", 5) {
      graft.sources.SnapshotTable.commit(tiny,
        Scratch.dir("pw_snap") + "/t" + System.nanoTime(), 1L)
    }
    // small real frame through an exchange
    val li = Tables.lineitem(spark, dir)
    t("lineitem groupBy count collect", 5) {
      li.groupBy("l_returnflag").count().collect()
    }
    t("lineitem noop scan (all cols)", 5) {
      li.write.format("noop").mode("overwrite").save()
    }
    t("empty job (range(1).collect)", 20) {
      spark.range(1).collect()
    }
    t("localCheckpoint tiny", 10) {
      tiny.localCheckpoint().count()
    }
    spark.stop()
  }
}
