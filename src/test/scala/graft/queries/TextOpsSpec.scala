package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("redactPii masks emails and phones, leaves clean text alone") {
    val out = Seq(
      "write to jane.doe@example.org today",
      "call +1-555-0199 or +44-201-3000 now",
      "no pii here at all")
      .toDF("s")
      .select(TextOps.redactPii(col("s")).as("r"))
      .as[String].collect().toSeq
    assert(out === Seq(
      "write to <EMAIL> today",
      "call <PHONE> or <PHONE> now",
      "no pii here at all"))
  }

  test("redact plants exactly one email and one phone per document") {
    val rows = TextOps.redact(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, emails, phones, rawLen, redLen) =>
      assert(emails === 1L, s"doc $id email count")
      assert(phones === 1L, s"doc $id phone count")
      assert(redLen < rawLen, s"doc $id must shrink under redaction")
    }
  }

  test("repetition signals match a hand-computed document") {
    // "a b a b a": 5 tokens, 2 distinct, top bigram "a b" x2 of 4.
    val df = Seq((1L, "a b a b a"), (2L, "x y z")).toDF("doc_id", "text")
    val toks = TextOps.tokens(col("text"))
    val stats = df.select(col("doc_id"),
      size(toks).cast("long").as("tok_cnt"),
      size(array_distinct(toks)).cast("long").as("uniq_cnt"))
    assert(stats.as[(Long, Long, Long)].collect().toSet ===
      Set((1L, 5L, 2L), (2L, 3L, 3L)))

    val rep = TextOps.repetition(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rep.nonEmpty)
    rep.foreach { case (id, tokCnt, uniqCnt, dupPpm, topCnt, topPpm) =>
      assert(uniqCnt <= tokCnt, s"doc $id distinct bound")
      assert(dupPpm >= 0 && dupPpm <= 1000000L, s"doc $id dup ppm range")
      assert(topCnt >= 1L, s"doc $id has at least one bigram")
      assert(topPpm <= 1000000L, s"doc $id top-bigram ppm bounded")
    }
  }
}
