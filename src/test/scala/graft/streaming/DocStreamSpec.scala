package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.DocStream.Doc

/** Golden drills for the streaming near-dup ingest loop: candidates
  * against the seeded index, candidates against a PRIOR batch (the
  * index append made it history), no self/same-batch pairs, and
  * replay idempotency of one micro-batch step.
  */
class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Long repeated-token texts so identical content is guaranteed to
  // collide in every band (identical signature); distinct content has
  // distinct shingles.
  private def text(tag: String): String =
    (1 to 40).map(i => s"tok$i-$tag").mkString(" ")

  test("golden: stream batches probe the seed, then each other, idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("docstream").toString
    val (indexDir, candDir, ckpt) =
      (s"$root/index", s"$root/cands", s"$root/ckpt")

    DocStream.seedIndex(
      Seq(1L -> text("alpha"), 2L -> text("beta")).toDF("doc_id", "text"),
      indexDir)

    val in = MemoryStream[Doc]
    val q = DocStream.neardupIngest(in.toDS(), indexDir, candDir, ckpt).start()
    try {
      // Batch 0: doc 10 duplicates seeded doc 1; doc 11 is new content.
      in.addData(Doc(10L, text("alpha")), Doc(11L, text("gamma")))
      q.processAllAvailable()
      // Batch 1: doc 20 duplicates BATCH-0 doc 11 (visible only because
      // batch 0 appended to the index); doc 21 is unique.
      in.addData(Doc(20L, text("gamma")), Doc(21L, text("delta")))
      q.processAllAvailable()
    } finally q.stop()

    val cands = spark.read.parquet(candDir)
      .select("batch_id", "new_doc", "old_doc")
      .as[(Long, Long, Long)].collect().toSet
    assert(cands === Set((0L, 10L, 1L), (1L, 20L, 11L)))

    // Replaying batch 1 (a restart re-delivering the same data under the
    // same id) overwrites its own partitions byte-identically: same
    // candidates, same index size, and the probe never sees the replay's
    // own rows as history.
    val indexRows = spark.read.parquet(indexDir).count()
    DocStream.probeAndAppend(
      Seq(20L -> text("gamma"), 21L -> text("delta")).toDF("doc_id", "text"),
      batchId = 1L, indexDir, candDir)
    val candsAfter = spark.read.parquet(candDir)
      .select("batch_id", "new_doc", "old_doc")
      .as[(Long, Long, Long)].collect().toSet
    assert(candsAfter === cands)
    assert(spark.read.parquet(indexDir).count() === indexRows)

    // The stream's index is the batch query's artifact: a batch-mode
    // probe of the final index finds the same duplicate relationships.
    val batchProbe = graft.queries.DedupOps.probeIndex(
      spark.read.parquet(indexDir).filter($"batch_id" < 0).select("doc_id", "band", "bucket"),
      graft.queries.DedupOps.minhashBands(
        Seq(30L -> text("beta")).toDF("doc_id", "text"),
        DocStream.NBands, DocStream.RowsPerBand))
      .as[(Long, Long)].collect().toSet
    assert(batchProbe === Set((30L, 2L)))
  }

  test("golden: kill and restart from checkpoint loses no batch and doubles none") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("docstream_restart").toString
    val (indexDir, candDir, ckpt) =
      (s"$root/index", s"$root/cands", s"$root/ckpt")

    DocStream.seedIndex(
      Seq(1L -> text("alpha"), 2L -> text("beta")).toDF("doc_id", "text"),
      indexDir)

    // First query instance: batch 0 commits, then the query is killed.
    val in = MemoryStream[Doc]
    val q1 = DocStream.neardupIngest(in.toDS(), indexDir, candDir, ckpt).start()
    try {
      in.addData(Doc(10L, text("alpha")), Doc(11L, text("gamma")))
      q1.processAllAvailable()
    } finally q1.stop()

    // Data arrives while the query is DOWN, then a NEW query instance
    // resumes from the same checkpoint. The restart must deliver the
    // pending data as the NEXT batch id (a query that ignored the
    // checkpoint would restart at id 0 and both overwrite batch 0's
    // partitions and miss doc 11 as history), and must not re-deliver
    // batch 0.
    in.addData(Doc(20L, text("gamma")), Doc(21L, text("delta")))
    val q2 = DocStream.neardupIngest(in.toDS(), indexDir, candDir, ckpt).start()
    try q2.processAllAvailable() finally q2.stop()

    val cands = spark.read.parquet(candDir)
      .select("batch_id", "new_doc", "old_doc")
      .as[(Long, Long, Long)].collect().toSet
    assert(cands === Set((0L, 10L, 1L), (1L, 20L, 11L)),
      "restart continues at batch 1 against batch 0's appended history")
    // Index holds exactly one NBands-row group per ingested doc (2
    // seeded + 2 per batch): nothing doubled across the restart
    // boundary, nothing lost.
    assert(spark.read.parquet(indexDir).count() === 6L * DocStream.NBands)
  }

  test("golden: chunk-level stream seeded from the BATCH chunk index, idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("docstream_cdc").toString
    val (indexDir, reportDir, ckpt) =
      (s"$root/chunks", s"$root/reports", s"$root/ckpt")

    // History written by the BATCH path: the seed is cdcChunkHashes'
    // own output — the same derivation dedup_cdc runs — so this drill
    // pins batch/stream index interchangeability at the chunk level.
    DocStream.seedChunkIndex(
      Seq(1L -> text("alpha"), 2L -> text("beta")).toDF("doc_id", "text"),
      indexDir)

    val in = MemoryStream[Doc]
    val q = DocStream.chunkIngest(in.toDS(), indexDir, reportDir, ckpt).start()
    try {
      // Batch 0: doc 10 repeats seeded doc 1's text -> every passage is
      // history (fresh_ppm 0); doc 11 is new content (fresh_ppm 1e6).
      in.addData(Doc(10L, text("alpha")), Doc(11L, text("gamma")))
      q.processAllAvailable()
      // Batch 1: doc 20 repeats BATCH-0 doc 11 (history only because
      // batch 0 appended its chunks); doc 21 is unique.
      in.addData(Doc(20L, text("gamma")), Doc(21L, text("delta")))
      q.processAllAvailable()
    } finally q.stop()

    val reports = spark.read.parquet(reportDir)
      .select("batch_id", "doc_id", "fresh_ppm")
      .as[(Long, Long, Long)].collect().toSet
    assert(reports === Set(
      (0L, 10L, 0L), (0L, 11L, 1000000L),
      (1L, 20L, 0L), (1L, 21L, 1000000L)))

    // Replaying batch 1 under the same id overwrites its own partitions
    // byte-identically: same reports, same index size, and the probe
    // never counts the replay's own rows as history.
    val indexRows = spark.read.parquet(indexDir).count()
    DocStream.chunkProbeAndAppend(
      Seq(20L -> text("gamma"), 21L -> text("delta")).toDF("doc_id", "text"),
      batchId = 1L, indexDir, reportDir)
    assert(spark.read.parquet(reportDir)
      .select("batch_id", "doc_id", "fresh_ppm")
      .as[(Long, Long, Long)].collect().toSet === reports)
    assert(spark.read.parquet(indexDir).count() === indexRows)

    // Interchange, the other direction: the stream-built index IS the
    // batch artifact — a batch-mode probe (cdcIncremental's join shape)
    // of the final index re-derives a seeded doc as fully-known and
    // never-seen content as fully-fresh.
    val probeInst = graft.queries.DedupOps.cdcChunkHashes(
        Seq(30L -> text("beta"), 31L -> text("omega")).toDF("doc_id", "text"))
      .select($"doc_id", org.apache.spark.sql.functions.explode($"hs").as("h"))
    val hist = spark.read.parquet(indexDir).select("h").distinct()
    val fresh = probeInst.join(hist.withColumn("seen", org.apache.spark.sql.functions.lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when($"seen".isNull, 1L).otherwise(0L)).as("fresh"))
      .as[(Long, Long)].collect().toMap
    assert(fresh(30L) === 0L, "seeded content fully known to the stream-built index")
    assert(fresh(31L) > 0L, "unseen content fresh")
  }

  test("fmt contract: stale partitions fail loudly; the watermark scopes the check") {
    import spark.implicits._
    val root = Files.createTempDirectory("fmtdrill").toString
    val (indexDir, reportDir) = (s"$root/index", s"$root/reports")
    def probe(id: Long): Unit = DocStream.chunkProbeAndAppend(
      Seq((100 + id, text("alpha"))).toDF("doc_id", "text"), id, indexDir, reportDir)
    def plantStale(batchId: Long): Unit =
      Seq((999L, 12345L, 999L, batchId)).toDF("doc_id", "h", "fmt", "batch_id")
        .write.mode("append").partitionBy("batch_id").parquet(indexDir)

    DocStream.resetFmtValidation()
    DocStream.seedChunkIndex(
      Seq(1L -> text("alpha")).toDF("doc_id", "text"), indexDir)
    probe(0L) // validates the whole index (fresh process), watermark = -1
    // A stale-format partition ABOVE the watermark is caught on the
    // next trigger, before any probe uses it.
    plantStale(batchId = 7L)
    val e = intercept[IllegalArgumentException](probe(1L))
    assert(e.getMessage.contains("re-seed"), s"wrong failure: ${e.getMessage}")
    // Remove it; the stream proceeds and the watermark advances.
    val stale = new java.io.File(s"$indexDir/batch_id=7")
    stale.listFiles().foreach(_.delete()); stale.delete()
    probe(1L); probe(2L) // watermark now 1
    // Below-watermark tampering is OUTSIDE the single-writer contract —
    // the steady-state delta check deliberately skips it...
    plantStale(batchId = 0L)
    probe(3L)
    // ...but a restart (fresh process = cleared watermark) re-validates
    // the full index and catches it loudly.
    DocStream.resetFmtValidation()
    val e2 = intercept[IllegalArgumentException](probe(4L))
    assert(e2.getMessage.contains("re-seed"))
  }

  test("value-gated ingest queries bind BOTH history arms at the gate's scale") {
    import org.apache.spark.sql.functions._
    import graft.queries.{DedupOps, SampleOps}
    val dir = "/root/testdata/sf0.01"
    val nTags = DedupOps.StreamIngestBatches + 1
    // stream_neardup: candidates must include seed hits AND hits whose
    // old_doc entered the index as an EARLIER STREAM BATCH — the
    // growing-index arm a train/non-train layout left vacuously green.
    val cands = DedupOps.streamNeardup(spark, dir)
      .withColumn("old_tag", pmod(SampleOps.bucketOf(col("old_doc")), lit(nTags)))
      .collect()
    assert(cands.nonEmpty)
    assert(cands.map(_.getLong(0)).toSet ===
      (0 until DedupOps.StreamIngestBatches).map(_.toLong).toSet,
      "every micro-batch must produce candidates")
    assert(cands.exists(_.getAs[Long]("old_tag") === 0L), "no seed hit")
    assert(cands.exists(_.getAs[Long]("old_tag") >= 1L),
      "growing-index arm vacuous: no candidate from an earlier stream batch")
    // stream_chunks: some batch ≥ 1 document must report NON-fresh
    // chunks (history binds), and the fixture must hold chunks whose
    // first sighting is an earlier STREAM batch (not just the seed).
    val rpt = DedupOps.streamChunks(spark, dir).collect()
    assert(rpt.map(_.getLong(0)).toSet ===
      (0 until DedupOps.StreamIngestBatches).map(_.toLong).toSet)
    assert(rpt.exists(r => r.getLong(0) >= 1L &&
      r.getAs[Long]("fresh_chunks") < r.getAs[Long]("n_chunks")))
    val inst = DedupOps.cdcChunkHashes(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .withColumn("bt", pmod(SampleOps.bucketOf(col("doc_id")), lit(nTags)) - 1)
    val first = inst.groupBy("h").agg(min(col("bt")).as("t0"))
    val crossStream = inst.join(first, "h")
      .filter(col("bt") >= 1 && col("t0") >= 0 && col("t0") < col("bt"))
      .count()
    assert(crossStream >= 1L,
      "growing-index arm vacuous: no chunk first seen in an earlier stream batch")
  }

  test("golden: trending words maintain a Misra-Gries summary across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    // One shard so the golden arithmetic below is the whole state.
    val q = DocStream.trendingWords(in.toDS(), k = 3, shards = 1)
      .writeStream.format("memory").queryName("trends").outputMode("update")
      .start()
    try {
      // Batch 0: counts {a:3, b:2, c:1} — fits in k=3, kept exactly.
      in.addData(Doc(1L, "a a a b b c"))
      q.processAllAvailable()
      val afterB0 = spark.table("trends")
        .as[(Int, String, Long)].collect().toSet
      assert(afterB0 === Set((0, "a", 3L), (0, "b", 2L), (0, "c", 1L)))
      // Batch 1: 4×d. Combined {a:3,b:2,c:1,d:4} overflows k=3 → the
      // mergeable-summaries cut subtracts the 4th-largest (1):
      // {d:3, a:2, b:1}, c cancelled. True heavies (count > N/(k+1) =
      // 10/4) are a and d — both must survive, and do.
      in.addData(Doc(2L, "d d d d"))
      q.processAllAvailable()
      val finalRows = spark.table("trends")
        .as[(Int, String, Long)].collect().toSet -- afterB0
      assert(finalRows === Set((0, "d", 3L), (0, "a", 2L), (0, "b", 1L)))
    } finally q.stop()
  }
}
