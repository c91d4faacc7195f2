package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[DedupOps.cdcChunkHashes]]' single-pass
  * fold: on random token streams (small alphabet, so boundary tokens,
  * runs of boundaries, boundary-final and boundary-free documents all
  * occur), the production aggregate() derivation must equal a
  * sequential chunker — same chunk count, same order, same 62-bit
  * double-fold hashes. Complements DedupOpsSpec's real-corpus pin with
  * adversarial shapes (empty-ish docs, all-boundary docs, one-token
  * docs) the corpus cannot guarantee.
  */
object CdcChunkProps extends Properties("DedupOps.cdcChunkHashes") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  // ~40 distinct tokens => boundary tokens (hash % 8 == 0) are common,
  // and repeated tokens make duplicate chunks possible.
  private val genDoc: Gen[List[String]] =
    Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 39).map(i => s"w$i")))

  private val genDocs: Gen[List[List[String]]] =
    Gen.chooseNum(1, 8).flatMap(k => Gen.listOfN(k, genDoc))

  private def p64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Sequential reference: hash each token once, close a chunk at every
    * boundary token, emit the double modular fold per chunk.
    */
  private def reference(tk: Seq[String]): Seq[Long] = {
    def fold(hs: Seq[Long], mix: Long, mod: Long): Long =
      hs.foldLeft(0L)((acc, h) => (acc * mix + h) % mod)
    // Fold 2 runs over a DIFFERENT prime so a single-token hash delta
    // cannot cancel both folds (the production constants).
    def chunkHash(hs: Seq[Long]): Long =
      fold(hs, 1000003L, 2147483647L) * (1L << 31) + fold(hs, 1000033L, 2147483629L)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var cur = scala.collection.mutable.ArrayBuffer[Long]()
    tk.map(p64).foreach { h =>
      cur += h
      if (h % DedupOps.CdcBoundaryMod == 0) {
        out += chunkHash(cur.toSeq)
        cur = scala.collection.mutable.ArrayBuffer[Long]()
      }
    }
    if (cur.nonEmpty) out += chunkHash(cur.toSeq)
    out.toSeq
  }

  property("single-pass fold equals the sequential chunker on random docs") =
    Prop.forAllNoShrink(genDocs) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case (tk, i) => (i.toLong, tk.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = DedupOps.cdcChunkHashes(df)
        .as[(Long, Seq[Long])].collect().toMap
      val want = docs.zipWithIndex
        .map { case (tk, i) => i.toLong -> reference(tk) }
        .filter(_._2.nonEmpty).toMap
      got == want
    }
}
