package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the moment-sum aggregator `embed_pca` scans with: agreement
  * with a sequential reference fold, merge associativity/commutativity
  * (the property that makes the integer sums partition-order-proof),
  * and the Spark aggregation path itself.
  */
class GramSumsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val d = 3
  private val vecs: Seq[Seq[Float]] = Seq(
    Seq(0.5f, -1.25f, 2.0f),
    Seq(-0.1f, 0.0f, 0.375f),
    Seq(1.5f, 1.5f, -0.625f),
    Seq(-2.0f, 0.25f, 0.125f))

  private def reference(vs: Seq[Seq[Float]]): GramBuf = {
    val s1 = new Array[Long](d)
    val s2 = new Array[Long](d * d)
    vs.foreach { v =>
      for (i <- 0 until d) {
        s1(i) += GramSums.unitsOf(v(i).toDouble)
        for (j <- 0 until d)
          s2(i * d + j) += GramSums.unitsOf(v(i).toDouble * v(j).toDouble)
      }
    }
    GramBuf(vs.size.toLong, s1.toIndexedSeq, s2.toIndexedSeq)
  }

  test("reduce matches the sequential reference and is order-insensitive") {
    val agg = new GramSums(d)
    val fwd = vecs.foldLeft(agg.zero)(agg.reduce)
    val rev = vecs.reverse.foldLeft(agg.zero)(agg.reduce)
    assert(fwd === reference(vecs))
    assert(rev === fwd, "integer sums cannot depend on arrival order")
  }

  test("merge is associative and commutative over partial buffers") {
    val agg = new GramSums(d)
    val parts = vecs.map(v => agg.reduce(agg.zero, v))
    val left = parts.reduceLeft(agg.merge)
    val right = parts.reduceRight(agg.merge)
    val shuffled = Seq(parts(2), parts(0), parts(3), parts(1)).reduceLeft(agg.merge)
    assert(left === reference(vecs))
    assert(right === left && shuffled === left)
  }

  test("the Spark aggregation path emits the reference buffer") {
    import spark.implicits._
    val got = vecs.toDS().repartition(3)
      .select(new GramSums(d).toColumn).head()
    assert(got === reference(vecs))
  }

  test("dimension mismatch fails loudly") {
    val agg = new GramSums(d)
    intercept[IllegalArgumentException](
      agg.reduce(agg.zero, Seq(1.0f, 2.0f)))
  }

  test("the imperative form emits sums identical to the typed form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Same data, both forms, several partitions so partial merges fire.
    val ds = vecs.toDS().repartition(3)
    val typed = ds.select(new GramSums(d).toColumn).head()
    val row = ds.toDF("v")
      .select(GramSumsAgg(col("v"), d).as("g")).head().getStruct(0)
    assert(row.getLong(0) === typed.n)
    assert(row.getSeq[Long](1) === typed.s1)
    assert(row.getSeq[Long](2) === typed.s2)
    assert(typed === reference(vecs),
      "both forms must carry the sequential reference sums")
  }

  test("the imperative buffer round-trips serialization and merges in place") {
    val agg = GramSumsAgg(
      org.apache.spark.sql.GraftBridge.expression(
        org.apache.spark.sql.functions.col("v")), d)
    val b = agg.createAggregationBuffer()
    assert(b.length === 1 + d + d * d)
    val restored = agg.deserialize(agg.serialize(
      Array.tabulate(1 + d + d * d)(_.toLong)))
    assert(restored.toSeq === (0 until 1 + d + d * d).map(_.toLong))
    // merge mutates the left buffer in place (the zero-allocation path).
    val x = Array.fill(1 + d + d * d)(2L)
    val y = Array.fill(1 + d + d * d)(3L)
    val merged = agg.merge(x, y)
    assert(merged eq x)
    assert(x.forall(_ == 5L))
  }
}
