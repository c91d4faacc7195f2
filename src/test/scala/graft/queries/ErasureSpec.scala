package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** governance_erasure mechanics beyond the oracle: erased users vanish
  * from every bucket, untouched buckets are not rewritten, and a
  * request that would EMPTY a bucket fails loudly (dynamic overwrite
  * cannot express a partition delete — serving stale rows silently
  * would be an RTBF violation).
  */
class ErasureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evFrame(users: Seq[Long]) =
    users.flatMap(u => Seq((u, 1.0), (u, 2.5))).toDF("user_id", "value")

  test("erased users vanish; surviving stats equal the full recompute") {
    // Users 3 and 20 are erased (≡3 mod 17); their buckets 3 and 4
    // keep survivors 19 (19 mod 16 = 3) and 36 (36 mod 16 = 4), so no
    // bucket empties; bucket 1 (users 1, 33) is untouched.
    val rows = AuditOps.erasureOn(spark,
        evFrame(Seq(1L, 3L, 19L, 20L, 33L, 36L)),
        graft.Scratch.dir("erasure_spec_ok"))
      .select("user_id", "n_events", "refreshed")
      .as[(Long, Long, Long)].collect()
    assert(!rows.exists(r => r._1 == 3L || r._1 == 20L), "erased users must vanish")
    assert(rows.map(_._1).toSet === Set(1L, 19L, 33L, 36L))
    assert(rows.forall(_._2 == 2L), "survivors keep their full stats")
    val refreshed = rows.map(r => r._1 -> r._3).toMap
    assert(refreshed(19L) == 1L && refreshed(36L) == 1L)
    assert(refreshed(1L) == 0L && refreshed(33L) == 0L)
  }

  test("a request that would empty a bucket fails loudly") {
    // User 37 (≡3 mod 17) is ALONE in bucket 5 (37 mod 16 = 5): the
    // refresh would write nothing for the bucket and the stale
    // partition would survive — the drill must refuse.
    val e = intercept[IllegalArgumentException] {
      AuditOps.erasureOn(spark, evFrame(Seq(1L, 37L)),
        graft.Scratch.dir("erasure_spec_empty"))
    }
    assert(e.getMessage.contains("EMPTY a bucket"))
  }
}
