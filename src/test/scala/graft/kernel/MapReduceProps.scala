package graft.kernel

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** The executable specification that replaces the reference's missing
  * test suite (SURVEY.md §5.2 item 3): for arbitrary inputs, an
  * order-insensitive flatMap-shaped map and reduce, the distributed
  * kernel is equivalent to the sequential fold
  *
  *   in.flatMap(map).groupBy(_._1).toSeq.flatMap(reduce).sortBy(_._1)
  *
  * which is a direct transliteration of RunMapReduceFramework's contract
  * (/root/reference/MapReduceFramework.cpp:621-694: map all, group by k2,
  * reduce each group, sort by k3).
  */
object MapReduceProps extends Properties("MapReduceKernel") {

  // Spark jobs per case are ~100ms; keep the case count moderate.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15).withMaxSize(40)

  private lazy val spark = TestSpark.spark

  private val genPair: Gen[(String, Int)] = for {
    k <- Gen.oneOf("alpha", "beta", "Gamma", "delta x", "", "éclair")
    v <- Gen.chooseNum(-50, 50)
  } yield (k, v)

  private val genInput: Gen[List[(String, Int)]] = Gen.listOf(genPair)

  /** Fan-out map: 0, 1 or 2 emissions per input, key derived from both
    * fields so grouping genuinely merges across input rows.
    */
  private def mapFn(k: String, v: Int): IterableOnce[(String, Int)] =
    (v.abs % 3) match {
      case 0 => Iterator.empty
      case 1 => Iterator.single((k.toLowerCase, v))
      case _ => Iterator((k.toLowerCase, v), ((v.abs % 7).toString, 1))
    }

  /** Order-insensitive reduce (sum + count). */
  private def reduceFn(k: String, vs: Iterator[Int]): IterableOnce[(String, Long)] = {
    var sum = 0L
    var n = 0L
    vs.foreach { v => sum += v; n += 1 }
    Iterator.single((k, sum * 1000 + n))
  }

  private def sequentialSpec(in: Seq[(String, Int)]): Seq[(String, Long)] =
    in.flatMap { case (k, v) => mapFn(k, v) }
      .groupBy(_._1)
      .toSeq
      .flatMap { case (k, kvs) => reduceFn(k, kvs.iterator.map(_._2)) }
      .sortBy(_._1)

  property("kernel ≡ sequential fold") = Prop.forAllNoShrink(genInput) { in =>
    import spark.implicits._
    val got = MapReduce.run(in.toDS().repartition(3))(mapFn)(reduceFn)
      .collect().toSeq
    got == sequentialSpec(in)
  }
}
