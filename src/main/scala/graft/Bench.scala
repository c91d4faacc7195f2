package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  *
  * Queries execute through the noop data-source writer, which runs the
  * registered plan EXACTLY as written — a `count()` on top would let
  * Catalyst prune columns and eliminate sorts, silently skipping the
  * work global-sort/projection queries exist to measure.
  *
  * Steady-state measurement: each query's FIRST run absorbs the
  * one-shot janino/JIT compilation of its generated stages (hundreds of
  * ms to seconds for the wide sketch plans), which at production scale
  * amortizes to nothing over a 1000-executor job — the quantity under
  * test is per-scale-factor throughput, not first-compile latency. The
  * first run is timed too: if even that COLD run finishes under
  * `FastPathSec`, the query cannot meaningfully regress and its cold
  * time is reported directly, skipping the second execution — that
  * funds the ~6-minute wall budget at a 150+-query registry (one run
  * for the fast majority, two for the heavy tail). Otherwise the
  * second, warm run is the measurement; it re-reads the data and
  * re-runs every exchange, only JVM/codegen warmth carries over.
  *
  * Attribution: each timed run starts from a clean block manager
  * (cached relations cleared, persisted/localCheckpoint'd RDDs
  * unpersisted) and a collected heap — System.gc() runs OUTSIDE the
  * timed window, so GC debt from a memory-heavy predecessor is never
  * billed to the query that happens to run next (round 4 reported the
  * alphabetically-first query at 24.6s against 1.3s measured in
  * isolation). Still not median-of-k — k timed runs per query would
  * blow the wall budget — so two spike guards re-run suspect cases
  * once (clean state, min reported): a timed run above BOTH 2× the
  * `SpikeFloorSec` absolute floor and 2× its own warm wall is a
  * one-off JIT/GC/IO hiccup (round 6: neardup_containment 9.19s vs
  * 2.56s isolated), and ANY timed run above `ReRunCeilingSec` re-runs
  * UNCONDITIONALLY — the warm-relative condition alone fails when the
  * warm run was itself polluted by a heavy predecessor's heap debris
  * (round 7: agg_ntile_range reported 20.3s vs 2.85s isolated because
  * its warm run inherited the 276s phash monster's wake). The heavy
  * tail above the ceiling is a handful of queries, so the extra runs
  * cost seconds while making every reported outlier a reproduced one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Local relations (literal fixture frames, dimension seeds) are
      // control-plane data: the default leaf parallelism (= all cores)
      // splits a 1000-row frame into `cpus` tasks, so every tiny write
      // job pays `cpus` parquet-writer inits and commits and every
      // commit stamps `cpus` footer reads — the small-files anti-
      // pattern (guide §6) created by the engine itself. A fixed small
      // value keeps literal-frame layouts identical at any core count
      // (the driver benches several `SPARK_GRAFT_CPUS` values).
      // Parquet-scanned tables are unaffected.
      .config("spark.sql.leafNodeDefaultParallelism", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Release everything the previous execution left in the block
    // manager: cached relations and free-floating persisted RDDs
    // (localCheckpoint rounds). Runs before every timed execution so no
    // query is billed for a predecessor's cached state or pays to
    // recompute around it.
    def cleanState(): Unit = {
      graft.operators.BandedPairs.releaseCached()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    // Cold runs under this report their first-run time directly (no
    // second execution); a first run inflated past it by a
    // predecessor's state simply falls through to the clean timed path,
    // so the shortcut is self-correcting.
    val FastPathSec = 0.3
    // A timed run above BOTH 2× this floor and 2× its own warm wall
    // re-runs once (min reported) — the one-off-spike guard.
    val SpikeFloorSec = 0.75
    // Any timed run above this re-runs once UNCONDITIONALLY (min
    // reported): the relative guard above is blind when the warm run
    // is polluted too, and every genuinely-heavy query should report a
    // reproduced number, not a single sample.
    val ReRunCeilingSec = 5.0

    // A query that throws is NOT silently absorbed into a plausible
    // wall-time: the failure surfaces as a "failed" array in BOTH
    // output JSON lines — empty in the good case — so a crash is
    // visible in the committed artifact, not just in the correctness
    // gate. The flag is derived from the run whose time is REPORTED:
    // each run carries its own error (null = clean), the selection
    // ladder prefers clean runs over failed ones BEFORE comparing
    // times (a crash that aborts early must not win min-of-two and
    // then masquerade as a fast clean measurement), and the chosen
    // run's error — or its absence — is what lands in the artifact.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    def timed(name: String): (Double, String) = {
      val t0 = System.nanoTime()
      val err =
        try { exec(name); null } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          e.toString.takeWhile(_ != '\n').take(200)
        }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // Clean beats failed; among equals, faster wins.
    def better(a: (Double, String), b: (Double, String)): (Double, String) =
      if ((a._2 == null) != (b._2 == null)) { if (a._2 == null) a else b }
      else if (a._1 <= b._1) a else b

    // Cached relations or persisted RDDs left by a predecessor (lazy
    // persists whose cleanup the harness owns) can make the NEXT
    // query's cold run spuriously fast — the one hole in the fast-path
    // shortcut. Detecting leftovers is a metadata check, so the
    // clean re-run only triggers for the rare fast-query-after-
    // persisting-query case instead of doubling the whole registry.
    def stateDirty(): Boolean =
      !org.apache.spark.sql.GraftBridge.cacheIsEmpty(spark) ||
        spark.sparkContext.getPersistentRDDs.nonEmpty

    // MACHINE-STATE markers for the artifact: the variance envelope
    // (docs/SCALE.md) attributes ±10% uniform drift to ambient machine
    // state (a just-finished JVM-heavy harness), but a bench artifact
    // without load/uptime forces every reader to re-derive that from
    // context. Load average (1-min) at start AND end, the count of
    // live JVMs sharing the box, this JVM's uptime at exit, and the
    // order seed make the drift attributable from the JSON alone.
    def load1(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    def jvmCount(): Long =
      ProcessHandle.allProcesses().filter(p =>
        p.info().command().map[Boolean](_.contains("java")).orElse(false))
        .count()
    val loadStart = load1()

    // Session warmup (scheduler + codegen framework), then per query:
    // cold run (fast path may end here, after a clean re-run if a
    // predecessor left cached state) → clean state → timed run →
    // spike guard.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // Dev-only subset filter (comma-separated names), mirroring
    // Verify's: lets a local run re-time just the queries a change
    // touched. The driver never sets it, so round benches are complete.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Variance-attribution knob: SPARK_GRAFT_BENCH_SEED=<long> times
    // the registry in a seeded-shuffled order instead of alphabetical.
    // Memoized session artifacts (shared indexes/fixtures) are built by
    // whichever family member runs FIRST, so per-family wall time
    // depends on order; comparing a shuffled run against the
    // alphabetical one attributes run-to-run family drift to build
    // placement vs a real regression (docs/SCALE.md records the
    // measured envelope). Seeded runs never overwrite the tracked
    // bench_full.json.
    val seed = sys.env.get("SPARK_GRAFT_BENCH_SEED").map(_.toLong)
    val names0 = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val names = seed.fold(names0)(s => new scala.util.Random(s).shuffle(names0))
    val results = names.map { name =>
      val cold = timed(name)
      val warm =
        if (cold._1 <= FastPathSec && stateDirty()) { cleanState(); timed(name) }
        else cold
      val chosen =
        if (warm._1 <= FastPathSec && warm._2 == null) warm
        else {
          cleanState()
          val t1 = timed(name)
          if (t1._2 != null || t1._1 > ReRunCeilingSec ||
              (t1._1 > 2 * SpikeFloorSec && t1._1 > 2 * warm._1)) {
            cleanState()
            better(t1, timed(name))
          } else t1
        }
      if (chosen._2 == null) failures.remove(name) else failures(name) = chosen._2
      name -> chosen._1
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedArr = failures.keys.toSeq.sorted
      .map(n => "\"" + n + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val machine =
      s"""{"load1_start":$loadStart,"load1_end":${load1()},""" +
        s""""jvms":${jvmCount()},""" +
        s""""jvm_uptime_sec":${java.lang.management.ManagementFactory
          .getRuntimeMXBean.getUptime / 1000.0},""" +
        s""""order_seed":${seed.map(_.toString).getOrElse("null")}}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedArr,"machine":$machine,"sf":"$sfDir"}"""
    // The driver captures only the tail of the build output; with 120+
    // per-query entries the full line alone can push its own
    // "metric":"total" prefix out of that window (round 5 lost the
    // headline number this way). Persist the full JSON to a file and
    // print it FIRST, then a compact total-only line LAST so the gate
    // metric always survives any tail truncation. bench_full.json at
    // the repo root is TRACKED (committed per round) so the audit
    // trail of per-query timings survives even when the captured tail
    // truncates — round 7's committed artifact kept only 65 of 166
    // entries and the headline evidence was unreproducible from git.
    // bench_full.json is the TRACKED full-registry audit trail: a
    // dev-subset run (SPARK_GRAFT_ONLY) must not overwrite it with a
    // partial line that would masquerade as a round's numbers.
    val artifacts = java.nio.file.Paths.get("target", "bench.json") ::
      (if (only.isEmpty && seed.isEmpty)
        List(java.nio.file.Paths.get("bench_full.json")) else Nil)
    for (path <- artifacts) {
      try {
        Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(path, full.getBytes("UTF-8"))
      } catch {
        // Never fail the bench over the artifact, but never be silent
        // either: a cwd-relative write from the wrong directory would
        // otherwise leave a STALE committed artifact masquerading as
        // this run's audit trail.
        case e: Throwable =>
          System.err.println(
            s"[bench] WARNING: could not write $path (cwd=${System.getProperty("user.dir")}): $e")
      }
    }
    println(full)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"failed":$failedArr,"machine":$machine,"sf":"$sfDir"}""")
    spark.stop()
  }
}
