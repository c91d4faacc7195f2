package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Explain.normalize]] — the rewrite that makes two
  * regenerations of docs/PLANS.md on an unchanged tree diff empty. The
  * properties that matter: session-offset erasure (expression IDs and
  * plan_id counters renumber from 1 in first-appearance order),
  * DISTINCTNESS preservation (two different source IDs never collapse
  * into one), pid/UUID/lambda/identity-hash scrubbing, the tightened
  * identity-hash mask leaving decimal-after-@ literals alone, and
  * idempotence (a normalized plan re-normalizes to itself, so a stale
  * PLANS.md passed back through the generator cannot churn).
  */
class ExplainSpec extends AnyFunSuite {

  test("expression IDs renumber by first appearance, preserving distinctness") {
    val plan = "Project [o_orderkey#731L, rev#9L]\n" +
      "+- Filter (o_orderkey#731L > 5) AND (rev#9L < o_custkey#12L)"
    val n = Explain.normalize(plan)
    assert(n === "Project [o_orderkey#1L, rev#2L]\n" +
      "+- Filter (o_orderkey#1L > 5) AND (rev#2L < o_custkey#3L)")
  }

  test("plan_id counters renumber independently of expression IDs") {
    val plan = "Scan parquet [a#44] plan_id=207\n+- Reuse plan_id=207 then plan_id=9"
    val n = Explain.normalize(plan)
    assert(n === "Scan parquet [a#1] plan_id=1\n+- Reuse plan_id=1 then plan_id=2")
  }

  test("scrubs scratch pids, staged partition pids, UUIDs and lambda addresses") {
    val pid = ProcessHandle.current().pid()
    val plan = s"Scan parquet /tmp/graft_scratch_$pid/t/a=${pid}_3/" +
      "part-00000-1f2e3d4c-5b6a-4789-9abc-def012345678.parquet " +
      "Lambda$4711/0x00007f3a2c041840"
    val n = Explain.normalize(plan)
    assert(n === "Scan parquet /tmp/graft_scratch_PID/t/a=PID_3/" +
      "part-00000-UUID.parquet Lambda$N/0xADDR")
  }

  test("identity hashes mask only after a letter anchor") {
    assert(Explain.normalize("TopKAgg@3f2a9bc1 and $anon@deadbeef") ===
      "TopKAgg@IDHASH and $anon@IDHASH")
    // All-decimal identity hashes mask too (a regeneration churned on
    // TopKAgg@45188301), including the post-lambda-mask 0xADDR form.
    assert(Explain.normalize("TopKAgg@45188301") === "TopKAgg@IDHASH")
    assert(Explain.normalize("Lambda$7/0xdeadbeef@16810696") ===
      "Lambda$N/0xADDR@IDHASH")
    // A bare @ with no identifier character before it stays verbatim.
    assert(Explain.normalize("filter (note = 'seen @2024 window')") ===
      "filter (note = 'seen @2024 window')")
  }

  test("normalize is idempotent") {
    val pid = ProcessHandle.current().pid()
    val plan = s"Agg [k#88L, v#88L, w#7L] plan_id=31 plan_id=2 " +
      s"graft_scratch_$pid Obj@ab12cd34 " +
      "file-0aa1bb2c-c3d4-4e5f-8901-234567890abc Lambda$9/0xdeadbeef"
    val once = Explain.normalize(plan)
    assert(Explain.normalize(once) === once)
  }
}
