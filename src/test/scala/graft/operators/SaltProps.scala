package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[Salt.saltedJoin]]: for ARBITRARY probe
  * multisets (duplicates, missing keys, hot keys), build tables and salt
  * factors, the salted join is row-for-row the plain inner join — the
  * invariant the registered `join_salted` query's oracle (the unsalted
  * SQL) relies on.
  */
object SaltProps extends Properties("Salt.saltedJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val genCase: Gen[(List[(Long, Long)], List[(Long, Long)], Int)] = for {
    probe <- Gen.listOfN(40, for {
      k <- Gen.chooseNum(0L, 6L) // few keys → duplicates and hot keys
      v <- Gen.chooseNum(0L, 1000L)
    } yield (k, v))
    build <- Gen.listOfN(8, for { // distinct build keys, some unmatched
      k <- Gen.chooseNum(0L, 9L)
      v <- Gen.chooseNum(0L, 1000L)
    } yield (k, v)).map(_.distinctBy(_._1))
    factor <- Gen.chooseNum(1, 9)
  } yield (probe, build, factor)

  property("equals the plain inner join for any inputs and factor") =
    Prop.forAllNoShrink(genCase) { case (probe, build, factor) =>
      import spark.implicits._
      val p = probe.toDF("k", "v")
      val d = build.toDF("dk", "dv")
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
        df.select("k", "v", "dv").as[(Long, Long, Long)].collect().sorted.toSeq
      val plain = rows(p.join(d, p("k") === d("dk")))
      val salted = rows(Salt.saltedJoin(p, d, "k", "dk", factor))
      plain == salted
    }
}
