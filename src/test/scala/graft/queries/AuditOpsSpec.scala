package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("quality checks report every constraint over the full population") {
    val rows = AuditOps.qualityChecks(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) === rows.map(_._1).sorted)
    assert(rows.length === 4)
    val byName = rows.map(r => r._1 -> r).toMap
    val nOrders = Tables.orders(spark, dir).count()
    val nCust = Tables.customer(spark, dir).count()
    // The generated star schema is referentially intact and key-unique:
    // those checks must pass over the full population.
    assert(byName("orders_custkey_fk") === (("orders_custkey_fk", 0L, nOrders, 1L)))
    assert(byName("customer_custkey_unique") === (("customer_custkey_unique", 0L, nCust, 1L)))
    rows.foreach { case (name, viol, checked, pass) =>
      assert(viol >= 0L && viol <= checked, s"$name violations bounded")
      assert(pass === (if (viol == 0L) 1L else 0L), s"$name pass flag consistent")
    }
  }

  test("skew audit ranks the heaviest keys with consistent shares") {
    val rows = AuditOps.joinKeySkew(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.length === AuditOps.SkewTopK)
    // Descending load, key tie-break; shares bounded; the heaviest key
    // carries at least the mean load.
    assert(rows.map(r => (-r._2, r._1)) === rows.map(r => (-r._2, r._1)).sorted)
    rows.foreach { case (_, cnt, ppm, x100) =>
      assert(cnt >= 1L && ppm >= 0L && ppm <= 1000000L && x100 >= 0L)
    }
    assert(rows.head._4 >= 100L, "the top key is at least the mean key load")
  }

  test("k-anonymity profile is internally consistent") {
    val (classes, small, minClass, atRisk) =
      AuditOps.kAnonymity(spark, dir).as[(Long, Long, Long, Long)].collect().head
    val nCust = Tables.customer(spark, dir).count()
    assert(classes >= 1L && classes <= nCust)
    assert(small >= 0L && small <= classes)
    assert(minClass >= 1L)
    assert(atRisk >= small * 1L && atRisk < AuditOps.KAnon * small + 1,
      s"rows at risk ($atRisk) must be between the small-class count ($small) and k*small")
    if (small == 0L) assert(atRisk === 0L)
  }

  test("split-drift histogram is exhaustive, ppm-consistent, and bounded") {
    val rows = AuditOps.splitDrift(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.map(r => r._2 + r._3).sum === nDocs,
      "every document lands in exactly one bucket/side")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= AuditOps.DriftBucketMax))
    // Each side's ppm shares sum to 1e6 minus at most one floor-loss
    // per bucket; drift is the exact abs difference.
    for ((side, idx) <- Seq(("train", 4), ("eval", 5)).map(t => (t._1, t._2 - 1))) {
      val s = rows.map(r => Seq(r._1, r._2, r._3, r._4, r._5, r._6)(idx)).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"$side ppm shares must sum to ~1e6, got $s")
    }
    rows.foreach(r => assert(r._6 === math.abs(r._4 - r._5)))
  }

  test("source concentration matches hand-computed HHI on a planted corpus") {
    val tmp = graft.Scratch.dir("hhi_docs")
    // en: one source owns all 4 docs (HHI = 1e6); de: 2+1+1 over three
    // sources (HHI = (4+1+1)/16 = 375000, top = 500000).
    (Seq.tabulate(4)(i => (i.toLong, "t", "en", "crawlA", 0L)) ++
      Seq((10L, "t", "de", "crawlA", 0L), (11L, "t", "de", "crawlA", 0L),
        (12L, "t", "de", "crawlB", 0L), (13L, "t", "de", "crawlC", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val out = AuditOps.sourceConcentration(spark, tmp)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("en") === ((4L, 1L, 1000000L, 1000000L)))
    assert(out("de") === ((4L, 3L, 500000L, 375000L)))
  }

  test("leakage audit: grouped policy crosses zero pairs, plain policy leaks") {
    val rows = AuditOps.leakageAudit(spark, dir)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.keySet === Set("grouped", "plain"))
    val (gCross, gTotal) = rows("grouped")
    val (pCross, pTotal) = rows("plain")
    assert(gTotal === pTotal, "both policies audit the same pair list")
    assert(gTotal > 0, "the fixture plants verified near-dup pairs")
    assert(gCross === 0L, "component-keyed splits cannot cross a pair")
    assert(pCross >= 0L && pCross <= pTotal)
  }
}
