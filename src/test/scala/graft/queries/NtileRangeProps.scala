package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[RelOps.rangeDecile]]: on random
  * multi-group inputs with HEAVY ties (tiny price domains force most
  * decile cuts inside tie runs) the range-assignment path must equal
  * `ntile(10)` row-for-row — the property that licenses sharing
  * agg_ntile's value oracle. Random group sizes also sweep the n < 10
  * and n mod 10 != 0 remainder rules.
  */
object NtileRangeProps extends Properties("RelOps.rangeDecile") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  // (prio, cents, okey): 1-3 groups, cents from a 1..4-value domain so
  // ties dominate; okey unique within the dataset.
  private val genRows: Gen[List[(String, Long, Long)]] = for {
    nGroups <- Gen.chooseNum(1, 3)
    domain <- Gen.chooseNum(1, 4)
    sizes <- Gen.listOfN(nGroups, Gen.chooseNum(1, 60))
    cents <- Gen.listOfN(sizes.sum, Gen.chooseNum(1, domain))
  } yield {
    val groups = sizes.zipWithIndex.flatMap { case (sz, g) => List.fill(sz)(s"G$g") }
    groups.lazyZip(cents).lazyZip(1 to groups.size).map {
      case (g, c, i) => (g, c.toLong * 100L, i.toLong)
    }.toList
  }

  property("equals ntile(10) under arbitrary ties, groups, and remainders") =
    Prop.forAll(genRows) { rows =>
      import spark.implicits._
      val base = rows.toDF("prio", "cents", "okey")
      val w = Window.partitionBy("prio").orderBy(desc("cents"), asc("okey"))
      val want = base.withColumn("decile", ntile(10).over(w).cast("long"))
        .select("okey", "decile").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = RelOps.rangeDecile(base)
        .select("okey", "decile").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(got == want) :| s"got=$got want=$want"
    }
}
