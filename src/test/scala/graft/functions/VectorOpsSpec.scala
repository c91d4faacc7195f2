package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval(a: Seq[Double], b: Seq[Double],
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Option[Double] = {
    val r = Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("dot is the index-ordered sum of products") {
    assert(eval(Seq(1, 2, 3), Seq(4, 5, 6), VectorOps.dot) === Some(32.0))
  }

  test("cosine of identical vectors is 1 (exact when the norm is exact)") {
    // norm = sqrt(4) = 2 exactly, so no rounding anywhere in the chain.
    assert(eval(Seq(2, 0), Seq(2, 0), VectorOps.cosine) === Some(1.0))
  }

  test("orthogonal vectors score 0") {
    assert(eval(Seq(1, 0), Seq(0, 1), VectorOps.cosine) === Some(0.0))
  }

  test("guards: length mismatch, empty arrays and zero norms are null") {
    assert(eval(Seq(1, 2), Seq(1, 2, 3), VectorOps.dot) === None)
    assert(eval(Seq.empty, Seq.empty, VectorOps.dot) === None)
    assert(eval(Seq(0, 0), Seq(1, 1), VectorOps.cosine) === None)
  }
}
