package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native [[SpanFold]] must be BIT-IDENTICAL to the HOF zip_with
  * fold it replaces (`DedupOps.spanHashesOfHof` / `trigramHashesOfHof`)
  * on the real domain — non-negative token hashes below 2⁶⁰ — because
  * every shingle/span identity (and hence every near-dup oracle) rides
  * on that equality.
  */
class SpanFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("edges: short arrays empty, null array null, null element scoped to its windows") {
    val rows = Seq(
      (1L, Option(Seq[Option[Long]](Some(1L), Some(2L)))), // < k → empty
      (2L, None), // null array → null
      (3L, Option(Seq[Option[Long]](Some(1L), Some(2L), None, Some(4L), Some(5L), Some(6L))))
    ).toDF("id", "th")
      .select(col("id"), SpanFold(col("th"), 3).as("s"))
      .as[(Long, Option[Seq[Option[Long]]])].collect().toMap
    assert(rows(1L) === Some(Seq.empty))
    assert(rows(2L) === None)
    // Windows touching the null element (positions 1..3 of 4) are null;
    // the last window (4,5,6) is clean.
    val w = rows(3L).get
    assert(w.length === 4)
    assert(w.take(3).forall(_.isEmpty) && w(3).isDefined)
  }

  test("SQL surface and codegen/interpreted parity") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT span_fold(array(7L, 11L, 13L, 17L), 3)").collect()(0).getSeq[Long](0)
    // CODEGEN_ONLY + fallback=false on the codegen leg: if SpanFold's
    // generated code ever fails to compile, this test FAILS instead of
    // silently passing through the interpreted fallback.
    def via(wholeStage: Boolean): Seq[Long] =
      TestSpark.withConf(
        "spark.sql.codegen.wholeStage" -> wholeStage.toString,
        "spark.sql.codegen.fallback" -> "false",
        "spark.sql.codegen.factoryMode" -> (if (wholeStage) "CODEGEN_ONLY" else "NO_CODEGEN")) {
        Seq(Seq(7L, 11L, 13L, 17L)).toDF("th")
          .select(SpanFold(col("th"), 3)).collect()(0).getSeq[Long](0)
      }
    assert(viaSql === via(wholeStage = true))
    assert(viaSql === via(wholeStage = false))
  }
}

/** Property: on random non-negative sub-2⁶⁰ hash arrays (the portable-
  * and fast-family output domain), native == HOF bit-for-bit at several
  * widths, including the trigram instance every shingle query keys on.
  */
object SpanFoldProps extends Properties("SpanFold") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genArr: Gen[List[Long]] = for {
    n <- Gen.chooseNum(0, 48)
    v <- Gen.listOfN(n, Gen.chooseNum(0L, (1L << 60) - 1))
  } yield v

  property("native fold equals the HOF fold at widths 2, 3, 8") =
    Prop.forAll(Gen.listOfN(6, genArr)) { arrs =>
      import spark.implicits._
      import graft.queries.DedupOps
      Seq(2, 3, 8).forall { k =>
        val rows = arrs.toDF("th")
          .select(
            SpanFold(col("th"), k).as("native"),
            DedupOps.spanHashesOfHof(col("th"), k).as("hof"),
            DedupOps.trigramHashesOfHof(col("th")).as("tri"))
          .collect()
        rows.forall { r =>
          val native = r.getSeq[Long](0)
          native == r.getSeq[Long](1) && (k != 3 || native == r.getSeq[Long](2))
        }
      }
    }
}
