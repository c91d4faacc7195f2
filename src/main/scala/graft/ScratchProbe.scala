package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only structural profiler (deleted before close): runs named
  * queries through the noop sink and reports DETERMINISTIC work
  * counters (Spark jobs launched, tasks run) next to wall time — the
  * machine-state-independent signal for fixed-cost optimizations.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.leafNodeDefaultParallelism",
        sys.env.getOrElse("SPARK_GRAFT_LEAF", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger()
    val tasks = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val names = if (args.nonEmpty) args.toSeq
      else sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq).getOrElse(Nil)
    names.foreach { name =>
      // settle listener
      Thread.sleep(200)
      val (j0, t0) = (jobs.get(), tasks.get())
      val w0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - w0) / 1e9
      Thread.sleep(300) // let task-end events drain
      println(f"[probe] $name%-28s ${sec}%7.2f s  jobs=${jobs.get() - j0}%4d tasks=${tasks.get() - t0}%6d")
    }
    spark.stop()
  }
}
