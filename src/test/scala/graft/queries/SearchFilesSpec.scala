package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The §2.2 edge semantics of the reference Search client
  * (/root/reference/Search.cpp:203-241,271-307), exercised through
  * [[RefOps.searchFiles]] over an in-memory `(dir, name)` relation —
  * FIXTURES.md §A.
  */
class SearchFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def files(rows: (String, String)*): DataFrame =
    rows.toDF("dir", "name")

  private def run(df: DataFrame, word: String): Seq[(String, Long)] =
    RefOps.searchFiles(df, word).as[(String, Long)].collect().toSeq

  test("empty relation yields empty output") {
    assert(run(files(), "x") === Seq.empty)
  }

  test("no match yields empty output") {
    assert(run(files(("d1", "alpha.txt")), "zzz") === Seq.empty)
  }

  test("dot entries are excluded") {
    // Search.cpp:213-216.
    assert(run(files(("d1", "."), ("d1", ".."), ("d1", "a.b")), ".") ===
      Seq(("a.b", 1L)))
  }

  test("same name under different dirs merges into one group") {
    // SURVEY §2.2: same name in different dirs MERGES.
    assert(run(files(("d1", "hit"), ("d2", "hit"), ("d3", "other-hit")), "hit") ===
      Seq(("hit", 2L), ("other-hit", 1L)))
  }

  test("duplicate dir argument counts twice") {
    assert(run(files(("d1", "hit"), ("d1", "hit")), "hit") === Seq(("hit", 2L)))
  }

  test("substring match is case-sensitive") {
    // std::string::find, Search.cpp:220.
    assert(run(files(("d1", "Hit"), ("d1", "hit")), "hit") === Seq(("hit", 1L)))
  }

  test("contains is literal, not a pattern") {
    assert(run(files(("d1", "a%b"), ("d1", "axb")), "%") === Seq(("a%b", 1L)))
    assert(run(files(("d1", "a.*b"), ("d1", "aXXb")), ".*") === Seq(("a.*b", 1L)))
  }

  test("output sorted ascending by name") {
    val out = run(files(("d", "cc"), ("d", "aa"), ("d", "bb")), "")
    assert(out.map(_._1) === Seq("aa", "bb", "cc"))
  }
}
