package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SourceOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction sizes output files from measured bytes and shrinks the count") {
    val dir = "/root/testdata/sf0.001"
    val root = graft.Scratch.dir("compact_spec")
    val small = s"$root/small"
    val out = s"$root/out"
    Tables.documents(spark, dir)
      .repartition(16).write.mode("overwrite").parquet(small)
    def partFiles(d: String): Int =
      new java.io.File(d).listFiles().count(f => f.getName.startsWith("part-"))
    assert(partFiles(small) === 16)
    // Large target: everything fits one file.
    assert(SourceOps.compactTo(spark, small, out, 64L << 20) === 1)
    assert(partFiles(out) === 1)
    // Tiny target: the measured-bytes math must split into >1 file and
    // the writer must produce exactly that many.
    val target = SourceOps.compactTo(spark, small, out, 8L << 10)
    assert(target > 1, s"8KB target over ${partFiles(small)} small files")
    assert(partFiles(out) === target)
  }

  test("partitioned read prunes to the selected partition's files only") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.Scratch.dir("orders_part_spec")
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    // The pruning decision lives in the scan node: the partition filter
    // must reach FileSourceScanExec, and the file listing under that
    // filter must touch only the selected partition directory.
    val df = SourceOps.partitionedRead(spark, out)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("expected a FileSourceScanExec leaf"))
    assert(scan.partitionFilters.nonEmpty,
      "the o_orderstatus predicate must arrive as a partition filter, not a data filter")
    val files = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty)
    assert(files.forall(_.contains("o_orderstatus=F")),
      s"pruned listing must only contain the F partition, got:\n${files.mkString("\n")}")

    // And the table really has more partitions to prune.
    val all = spark.read.parquet(out).inputFiles
    assert(all.exists(!_.contains("o_orderstatus=F")),
      "fixture must contain other partitions for the pruning to be meaningful")
  }

  test("bucketed join plans with no shuffle exchange on either side") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val dir = "/root/testdata/sf0.001"
    // Run the registered query once so both bucketed tables exist.
    SourceOps.bucketedJoin(spark, dir).collect()

    val joined = SourceOps.bucketedRead(spark)
    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"bucketed co-located join must not shuffle, found:\n${exchanges.mkString("\n")}")
    val scans = joined.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.forall(_.bucketedScan), "both sides must use the bucketed scan path")

    // The layout is result-transparent: same rows as the plain join.
    val plain = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
    assert(joined.count() === plain.count())
  }

  test("variant round-trip stores a true VARIANT column in parquet") {
    val dir = "/root/testdata/sf0.001"
    val rows = SourceOps.variantRoundtrip(spark, dir).collect()
    assert(rows.nonEmpty)
    // The stored column must be the binary VARIANT type (parse-once at
    // write), not a re-serialized JSON string.
    val stored = spark.read.parquet(graft.Scratch.dir("roundtrip_events_variant"))
    assert(stored.schema("v").dataType.typeName === "variant",
      s"stored type was ${stored.schema("v").dataType}")
  }
}
