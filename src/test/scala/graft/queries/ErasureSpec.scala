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

  test("negative ids round-trip through bucket partition dirs under truncated %") {
    // Spark's BIGINT % truncates toward zero exactly like DuckDB's
    // (-21 % 16 = -5 on both engines), so negative users land in
    // literal `bucket=-5` partition directories. A negative id can
    // never be ERASED under the residue predicate (a negative u gives
    // u % 17 ≤ 0, never 3) nor share a bucket with an erased user
    // (u % 16 ≥ 0 requires u ≥ 0), so negative buckets are always
    // untouched — the pin here is that the dynamic-overwrite refresh
    // leaves those negative partition dirs intact and readable.
    val rows = AuditOps.erasureOn(spark,
        evFrame(Seq(-5L, -21L, 3L, 19L)),
        graft.Scratch.dir("erasure_spec_neg"))
      .select("user_id", "bucket", "n_events", "refreshed")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet === Set(-5L, -21L, 19L),
      "erased user 3 vanishes; negative users survive")
    val byUser = rows.map(r => r._1 -> r).toMap
    assert(byUser(-5L)._2 === -5L && byUser(-21L)._2 === -5L,
      "negative buckets must round-trip through the partition dir")
    assert(byUser(19L)._2 === 3L && byUser(19L)._4 === 1L)
    assert(rows.filter(_._1 < 0).forall(r => r._3 == 2L && r._4 == 0L),
      "negative-bucket users keep full stats, unrefreshed")
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
