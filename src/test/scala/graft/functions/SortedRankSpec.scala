package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native [[SortedRank]] must equal the HOF formulation
  * `size(filter(cuts, c -> c <= x))` it replaces on every sorted,
  * null-free input — the quantile-bin assignment agg_spearman_approx
  * rides on.
  */
class SortedRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("null input → null; empty array → 0; boundary ties count as ≤") {
    val r = Seq((Seq(1.0, 2.0, 2.0, 5.0), 2.0)).toDF("cuts", "x")
      .select(SortedRank(col("cuts"), col("x"))).collect()(0).getLong(0)
    assert(r === 3L) // upper bound: both 2.0s and the 1.0 are ≤ x
    val empty = Seq((Seq.empty[Double], 1.0)).toDF("cuts", "x")
      .select(SortedRank(col("cuts"), col("x"))).collect()(0).getLong(0)
    assert(empty === 0L)
    val nul = Seq((Option.empty[Seq[Double]], Option(1.0))).toDF("cuts", "x")
      .select(SortedRank(col("cuts"), col("x"))).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val cuts = Seq(-1e300, -2.5, 0.0, 0.0, 3.75, 1e300)
    def via(wholeStage: Boolean): Seq[Long] =
      TestSpark.withConf(
        "spark.sql.codegen.wholeStage" -> wholeStage.toString,
        "spark.sql.codegen.factoryMode" -> (if (wholeStage) "FALLBACK" else "NO_CODEGEN")) {
        Seq(-1e301, -2.5, -0.0, 2.0, 1e301).map(x => (cuts, x)).toDF("cuts", "x")
          .select(SortedRank(col("cuts"), col("x"))).collect().map(_.getLong(0)).toSeq
      }
    val expected = Seq(0L, 2L, 4L, 4L, 6L)
    assert(via(wholeStage = true) === expected)
    assert(via(wholeStage = false) === expected)
  }
}

/** Property: on random sorted cut arrays and probes (ties and duplicate
  * cuts included), the O(log n) binary search equals the O(n) HOF count.
  */
object SortedRankProps extends Properties("SortedRank") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genCase: Gen[(List[Double], Double)] = for {
    n <- Gen.chooseNum(0, 64)
    cuts <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
    // Probe near the cuts often enough that ties actually occur.
    x <- Gen.oneOf(Gen.chooseNum(-150.0, 150.0),
      if (cuts.nonEmpty) Gen.oneOf(cuts) else Gen.chooseNum(-150.0, 150.0))
  } yield (cuts.sorted, x)

  property("binary search equals the linear HOF count on sorted arrays") =
    Prop.forAll(Gen.listOfN(12, genCase)) { cases =>
      import spark.implicits._
      cases.toDF("cuts", "x")
        .select(
          SortedRank(col("cuts"), col("x")).as("native"),
          size(filter(col("cuts"), c => c <= col("x"))).cast("long").as("hof"))
        .collect()
        .forall(r => r.getLong(0) == r.getLong(1))
    }
}
