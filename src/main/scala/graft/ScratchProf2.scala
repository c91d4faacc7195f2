package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ScratchProf2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.leafNodeDefaultParallelism", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = graft.Scratch.dir("prof_stream_root")
    val bucketUs = 11L * 86400L * 1000000L
    val epoch = 1704067200000000L
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"),
        floor((unix_micros(col("ts")) - lit(epoch)) / bucketUs)
          .cast("int").as("b"))
      .repartition(col("b"))
      .write.partitionBy("b").parquet(s"$root/staging")
    val stagingPath = new org.apache.hadoop.fs.Path(s"$root/staging")
    val buckets = stagingPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(stagingPath)
      .map(_.getPath.getName).filter(_.startsWith("b="))
      .map(_.stripPrefix("b=").toInt).sorted.toSeq
    buckets.zipWithIndex.foreach { case (b, i) =>
      val files = graft.sources.SnapshotTable.freshFiles(spark, s"$root/staging/b=$b")
      graft.sources.SnapshotTable.publishAppend(spark, root, (i + 1).toLong,
        files.sorted, carryFrom = if (i == 0) None else Some(i.toLong))
    }

    def runStream(tag: String, write: (DataFrame, Long, String) => Unit): Double = {
      val s = graft.streaming.StreamDrill.session(spark)
      val src = s.readStream
        .format(classOf[graft.streaming.SnapshotSourceProvider].getName)
        .option("path", root).option("maxGensPerBatch", "1").load()
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"))
      val counts = src
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_timestamp(col("window.start")).as("hour_start"),
          col("event_type"), col("cnt"))
      val sink = graft.Scratch.dir(s"prof_sink_$tag" + System.nanoTime())
      val ckpt = graft.Scratch.dir(s"prof_ckpt_$tag" + System.nanoTime())
      val t0 = System.nanoTime()
      val q = counts.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            write(b.toDF(), id, sink))
        .start()
      try q.processAllAvailable() finally q.stop()
      val n = spark.read.parquet(sink).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $tag%-12s $sec%6.2f s (sink rows $n)")
      sec
    }
    val dyn = (b: DataFrame, id: Long, sink: String) =>
      b.withColumn("batch_id", lit(id)).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(sink)
    val direct = (b: DataFrame, id: Long, sink: String) =>
      b.write.mode("overwrite").parquet(s"$sink/batch_id=$id")
    val directC1 = (b: DataFrame, id: Long, sink: String) =>
      b.coalesce(1).write.mode("overwrite").parquet(s"$sink/batch_id=$id")
    // warmup round, then 3 measured rounds of each interleaved
    runStream("warmup", dyn)
    (1 to 3).foreach { _ =>
      runStream("dynamic", dyn); runStream("direct", direct); runStream("directC1", directC1)
    }
    spark.stop()
  }
}
