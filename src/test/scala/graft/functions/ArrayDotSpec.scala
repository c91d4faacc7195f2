package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native [[ArrayDot]] must be BIT-IDENTICAL to the built-in HOF
  * formulation ([[VectorOps.dotHof]]) it replaces — same left-fold
  * accumulation order, same null guards — because every cosine oracle's
  * exact-value check rides on that equality.
  */
class ArrayDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def both(a: Seq[Option[Double]], b: Seq[Option[Double]]): (Option[Double], Option[Double]) = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(
        VectorOps.dot(col("a"), col("b")).as("native"),
        VectorOps.dotHof(col("a"), col("b")).as("hof"))
      .collect()(0)
    def get(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (get(0), get(1))
  }

  test("guards match the HOF shape: mismatch, empty, null element") {
    for {
      (a, b) <- Seq(
        (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(1.0), Some(2.0), Some(3.0))),
        (Seq.empty[Option[Double]], Seq.empty[Option[Double]]),
        (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))))
    } {
      val (n, h) = both(a, b)
      assert(n === h)
      assert(n === None)
    }
  }

  test("codegen and interpreted paths agree") {
    val a = Seq(1.5, -2.25, 3.0e10, 1e-300)
    val b = Seq(0.5, 4.75, -1.0e-5, 1e300)
    def via(wholeStage: Boolean): Double =
      TestSpark.withConf(
        "spark.sql.codegen.wholeStage" -> wholeStage.toString,
        "spark.sql.codegen.factoryMode" -> (if (wholeStage) "FALLBACK" else "NO_CODEGEN")) {
        Seq((a, b)).toDF("a", "b")
          .select(VectorOps.dot(col("a"), col("b"))).collect()(0).getDouble(0)
      }
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    assert(via(wholeStage = true) === expected)
    assert(via(wholeStage = false) === expected)
  }
}

/** Property: on random double vectors (magnitudes spanning ±1e±30, where
  * float addition order visibly changes results), native == HOF
  * bit-for-bit, including the cosine composition.
  */
object ArrayDotProps extends Properties("ArrayDot") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genVec: Gen[List[Double]] = for {
    n <- Gen.chooseNum(1, 64)
    v <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(-1e3, 1e3),
      Gen.chooseNum(-1e30, 1e30),
      Gen.chooseNum(-1e-30, 1e-30)))
  } yield v

  property("native dot and cosine are bit-identical to the HOF fold") =
    Prop.forAll(Gen.listOfN(8, genVec.flatMap(a => genVec.map(b => (a, b))))) { pairs =>
      import spark.implicits._
      val rows = pairs.toDF("a", "b")
        .select(
          VectorOps.dot(col("a"), col("b")).as("nd"),
          VectorOps.dotHof(col("a"), col("b")).as("hd"),
          VectorOps.cosine(col("a"), col("b")).as("nc"))
        .collect()
      rows.forall { r =>
        val sameDot =
          (r.isNullAt(0) && r.isNullAt(1)) ||
            (!r.isNullAt(0) && !r.isNullAt(1) &&
              java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
                java.lang.Double.doubleToLongBits(r.getDouble(1)))
        sameDot
      }
    }
}
