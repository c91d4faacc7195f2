package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit tests of the typed L1 kernel against the reference's observable
  * semantics (SURVEY.md §2.2 / §4.3). The scalacheck executable
  * specification lives in MapReduceProps.
  */
class MapReduceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wordCount(in: Seq[(String, String)]): Seq[(String, Long)] =
    MapReduce.run(in.toDS()) { (_, text) =>
      text.split(' ').iterator.filter(_.nonEmpty).map(w => (w, 1))
    } { (w, ones) => Iterator.single((w, ones.size.toLong)) }
      .collect().toSeq

  test("empty input yields empty output, no error") {
    // Reference: zero dirs / unopenable dirs degrade to empty output
    // (Search.cpp:210, MapReduceFramework.cpp:394-405).
    assert(wordCount(Seq.empty) === Seq.empty)
  }

  test("flatMap fan-out 0..N and group merge across input rows") {
    val out = wordCount(Seq(("d1", "a b a"), ("d2", "b c"), ("d3", "")))
    assert(out === Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("duplicate input rows double the counts (duplicate-dir semantics)") {
    val once  = wordCount(Seq(("d1", "x y")))
    val twice = wordCount(Seq(("d1", "x y"), ("d1", "x y")))
    assert(once === Seq(("x", 1L), ("y", 1L)))
    assert(twice === Seq(("x", 2L), ("y", 2L)))
  }

  test("grouping is case-sensitive (std::string operator< semantics)") {
    val out = wordCount(Seq(("d1", "File file FILE")))
    assert(out === Seq(("FILE", 1L), ("File", 1L), ("file", 1L)))
  }

  test("output is globally sorted ascending by k3") {
    val out = wordCount(Seq(("d1", "zeta alpha mu alpha")))
    assert(out.map(_._1) === out.map(_._1).sorted)
    assert(out === Seq(("alpha", 2L), ("mu", 1L), ("zeta", 1L)))
  }

  test("reduce may emit 0..N pairs per group") {
    val in = Seq(("k", 1), ("k", 2), ("other", 3)).toDS()
    val out = MapReduce.run(in) { (k, v) => Iterator.single((k, v)) } {
      (k, vs) =>
        val s = vs.sum
        if (k == "other") Iterator.empty // 0 emissions
        else Iterator((k + "_sum", s.toLong), (k + "_dup", s.toLong)) // 2
    }.collect().toSeq
    assert(out === Seq(("k_dup", 3L), ("k_sum", 3L)))
  }
}
