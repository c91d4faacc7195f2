package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** The determinism contract [[Parity]] exists for, as an executable
  * property: the decimal-routed sum of a double column is identical for
  * every partitioning of the same data — i.e. aggregation order can
  * never change the compared value, which is what makes DuckDB-oracle
  * hashes stable and cluster-size-independent.
  */
object ParityProps extends Properties("Parity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  // money-like doubles within the documented |x| < 1e14 domain
  private val genValues: Gen[List[Double]] =
    Gen.listOfN(60, Gen.chooseNum(-1000000L, 1000000L).map(_ / 100.0))

  property("dsum is invariant under repartitioning") =
    Prop.forAllNoShrink(genValues, Gen.chooseNum(1, 7)) { (xs, parts) =>
      import spark.implicits._
      def sumWith(n: Int): Double =
        xs.toDF("x").repartition(n)
          .agg(Parity.dsum(col("x")).as("s"))
          .collect()(0).getDouble(0)
      xs.isEmpty || {
        val a = sumWith(1)
        val b = sumWith(parts)
        java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b)
      }
    }
}
