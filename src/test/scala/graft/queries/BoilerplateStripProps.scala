package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Random-corpus drill of the boilerplate STRIP transform: the
  * distributed formulation (indexed chunk explode, df≥2 template
  * election, anti-join, ordered reassembly + tail) must equal a
  * sequential model on arbitrary corpora — repeated chunks WITHIN one
  * document (df counts distinct documents, so a within-doc repeat is
  * NOT boilerplate), chunk-boundary-straddling repeats (not caught by
  * design — the model encodes the same window alignment), all-template
  * documents, sub-window documents, and empty documents.
  */
object BoilerplateStripProps extends Properties("TextOps.boilerplateStrip") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val C = TextOps.ChunkTokens

  // Documents assemble from a tiny pool of C-token blocks plus a
  // random sub-window tail, so cross-document repeats are frequent.
  private val genDocs: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(1, 8)
    docs <- Gen.listOfN(nDocs, for {
      nBlocks <- Gen.chooseNum(0, 4)
      blocks <- Gen.listOfN(nBlocks, Gen.chooseNum(0, 3))
      tailLen <- Gen.chooseNum(0, C - 1)
    } yield {
      val body = blocks.flatMap(b => (1 to C).map(i => s"b${b}w$i"))
      val tail = (1 to tailLen).map(i => s"t$i")
      (body ++ tail).mkString(" ")
    })
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def model(docs: List[(Long, String)]): Seq[(Long, Long, Long, Long, String)] = {
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    def chunks(t: String) = toks(t).grouped(C).filter(_.size == C)
      .map(_.mkString(" ")).toSeq
    val shared = docs.flatMap { case (id, t) => chunks(t).distinct.map(id -> _) }
      .groupBy(_._2).filter(_._2.size >= 2).keySet
    docs.map { case (id, t) =>
      val tk = toks(t)
      val ch = chunks(t)
      val kept = ch.filterNot(shared)
      val tail = tk.drop(ch.size * C).mkString(" ")
      val cleaned = (kept :+ tail).filter(_.nonEmpty).mkString(" ")
      (id, ch.size.toLong, kept.size.toLong, (ch.size - kept.size).toLong, cleaned)
    }.sortBy(_._1)
  }

  property("distributed strip equals the sequential model") =
    Prop.forAll(genDocs) { docs =>
      import spark.implicits._
      val got = TextOps.boilerplateStripOf(docs.toDF("doc_id", "text"))
        .select("doc_id", "n_chunks", "kept_chunks", "dropped_chunks", "cleaned")
        .as[(Long, Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
      val want = model(docs)
      if (got != want)
        println(s"MISMATCH\n got=$got\n want=$want\n docs=$docs")
      got == want
    }
}
