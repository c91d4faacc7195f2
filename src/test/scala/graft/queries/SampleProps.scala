package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[SampleOps]]: on random document sets,
  * split assignment must partition the input exactly (every doc in one
  * and only one split) and agree with a sequential reimplementation of
  * the bucket arithmetic — the property the oracle parity and the
  * rerun-stability story both rest on.
  */
object SampleProps extends Properties("SampleOps.withSplit") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genDocs: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L)).map(_.distinct)

  /** Sequential twin of bucketOf: first 15 hex chars of md5 of the
    * decimal id, mod 100 — computed with java.security, no Spark.
    */
  private def bucketSeq(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 100
  }

  private def splitSeq(id: Long): String = {
    val b = bucketSeq(id)
    if (b < SampleOps.TrainPct) "train"
    else if (b < SampleOps.TrainPct + SampleOps.ValidPct) "valid"
    else "test"
  }

  property("partitions any id set and matches the sequential hash") =
    Prop.forAllNoShrink(genDocs) { ids =>
      import spark.implicits._
      val docs = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val got = SampleOps.withSplit(docs)
        .select(col("doc_id"), col("split"))
        .as[(Long, String)].collect().toMap
      got.keySet == ids.toSet && ids.forall(i => got(i) == splitSeq(i))
    }
}
