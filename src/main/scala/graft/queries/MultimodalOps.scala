package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AudioCodec, ImageCodec, Multimodal}

/** Registered multimodal queries. The harness has no binary media table,
  * so document text bytes stand in as the opaque payload (UTF-8 cast to
  * binary) — the schema/plumbing is payload-agnostic by construction.
  */
object MultimodalOps {

  val FrameBytes = 256

  /** Frame-sampling arithmetic as a pure relational query (oracle-able):
    * one row per 256-byte frame of each payload.
    */
  def frames(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .withColumn("n_frames",
        greatest(lit(1L), ceil(col("byte_len") / lit(FrameBytes.toDouble)).cast("long")))
      .select(col("doc_id"), col("byte_len"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_off", col("frame_idx") * FrameBytes)
      .orderBy("doc_id", "frame_idx")

  /** The full decode path through [[Multimodal.extractFrames]] with the
    * stub decoder. The fake features (byte-histogram moments of each
    * frame slice) are unpacked to scalar columns — and because they are
    * pure byte arithmetic, DuckDB can recompute them exactly from the
    * blob via `get_bit`, so this takes a full value oracle despite the
    * "stub" decoder. All four moments divide exact integer sums by exact
    * counts, so the doubles are bit-identical across engines.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"))
      .as[Multimodal.MediaRow]
    Multimodal.extractFrames(media, Multimodal.FakeDecoder, FrameBytes)(spark)
      .toDF()
      .select(col("media_id"), col("byte_len"),
        col("frame_idx").cast("long").as("frame_idx"), col("frame_off"),
        element_at(col("features"), 1).as("f_mean"),
        element_at(col("features"), 2).as("f_meansq"),
        element_at(col("features"), 3).as("f_min"),
        element_at(col("features"), 4).as("f_max"))
      .orderBy("media_id", "frame_idx")
  }

  /** Downsample factor for [[resized]]. */
  val ResizeStride = 4

  /** The resize stage: stride-resample every payload through
    * [[Multimodal.resample]], then feature-extract the resized payload
    * as one frame — decode → resize → re-featurize, the standard media
    * preprocessing chain, all per-partition with zero shuffle. The
    * moments are byte arithmetic over deterministically selected bytes,
    * so DuckDB recomputes them exactly from the original blob.
    */
  def resized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"))
      .as[Multimodal.MediaRow]
    Multimodal.resample(media, ResizeStride)(spark)
      .map { r =>
        val f = Multimodal.FakeDecoder.decodeFrame(r.payload, 0, r.payload.length)
        (r.media_id, r.payload.length.toLong, f(0), f(2), f(3))
      }
      .toDF("media_id", "resized_len", "f_mean", "f_min", "f_max")
      .orderBy("media_id")
  }

  /** Signature width (bits) for the aHash. Block boundaries are
    * PROPORTIONAL — byte i lands in block `⌊i·60/n⌋` via
    * [[Multimodal.aHashGrid]] — so all 60 bits carry signal whenever
    * the payload has ≥ 60 bytes, and shorter payloads spread their
    * populated bits across the full band range (a fixed width left the
    * high bits structurally zero for short payloads and collapsed the
    * LSH bands; round-7 verdict).
    */
  val PhashBits = 60

  /** Media-level near-dup via perceptual hash: every payload collapses
    * to a 60-bit [[Multimodal.aHashGrid]] signature (per-block mean vs
    * whole-payload mean, cross-multiplied integer compare), and
    * duplicate GROUPS are signature-equal payloads — the media twin of
    * `dedup_hash_count`, robust to the low-order byte jitter an exact
    * content hash is defeated by (a real image pipeline computes the
    * same signature from decoded pixels; the byte-domain stub keeps the
    * plumbing and the oracle exact). One scan, constant-size signature
    * per payload, one group-by — the same shape at any corpus size;
    * Hamming-banded NEAR-equality composes on top exactly as
    * `neardup_simhash_pairs` does for text.
    */
  /** (media_id, phash) for every payload — the constant-size signature
    * relation [[phashGroups]] and [[phashNearPairs]] both derive from.
    */
  private def phashSignatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) => (id, Multimodal.aHashGrid(p, PhashBits)) }
      .toDF("media_id", "phash")
  }

  /** [[phashGroups]]' grid precision. At the full [[PhashBits]] the
    * exact-signature groups are VACUOUS on this corpus (no two media
    * payloads are byte-identical, and 60 bits never collide at fixture
    * scale — the gate would bind an empty frame on both engines, the
    * q22 lesson), so the GROUPING query buckets at coarse precision:
    * the perceptual candidate-group semantics (a dedup pipeline's
    * bucketing pass), while full-precision pairing stays
    * `multimodal_phash_near`'s job.
    */
  val PhashGroupBits = 12

  def phashGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) => (id, Multimodal.aHashGrid(p, PhashGroupBits)) }
      .toDF("media_id", "phash")
      .groupBy("phash")
      .agg(count(lit(1)).as("dup_cnt"), min(col("media_id")).as("rep_media"))
      .filter(col("dup_cnt") > 1)
      .orderBy(desc("dup_cnt"), asc("phash"))
  }

  /** Banding layout and Hamming cut for [[phashNearPairs]]: 4 chunks of
    * 15 bits. By pigeonhole any pair within Hamming distance 3 shares
    * at least one exact chunk (banded-LSH recall); the exact cut below
    * then keeps pairs within [[PhashMaxHamming]] bits.
    */
  val PhashBands = 4
  val PhashChunkBits: Int = PhashBits / PhashBands
  val PhashMaxHamming = 8

  /** Bucket-size cap for the banded pair expansion (the
    * [[DedupOps.JaccardMaxDf]] move at the signature level): a (band,
    * chunk) bucket holding more than this many media is dropped before
    * pair generation, bounding the worst bucket's pair count at
    * cap²/2 REGARDLESS of corpus size or signature pathology. Mirrored
    * in the DuckDB oracle, so it is a recall/cost knob, not a
    * correctness risk. Without it a single hot bucket is quadratic in
    * whatever lands there (round-7 verdict: the fixed-width signature
    * put all 5000 sf0.1 docs in one bucket = 12.5M pairs in one array).
    */
  val PhashMaxBucket = 100

  /** Media near-dup PAIRS via Hamming-banded perceptual hashes — the
    * composition [[phashGroups]]' scaladoc promises: exactly
    * [[DedupOps.simhashPairsOf]]'s band→bucket→pair shape applied to
    * the media signature. Explode each signature to its 4 (band,
    * 15-bit chunk) keys, keep buckets with 2..[[PhashMaxBucket]]
    * members, and self-join members on the bucket key (`a < b`) so
    * candidate pairs distribute across tasks — no per-bucket array is
    * ever materialized, so there is no single-row blow-up mode even on
    * an adversarial corpus. Then one codegen'd `bit_count(xor)` per
    * candidate and the exact Hamming cut. One scan, constant-size
    * signatures, shuffles only on (band, chunk): pair volume is
    * bounded by buckets × cap²/2, and at 100 TB the cap (not the
    * corpus) sets the worst task's work.
    */
  def phashNearPairs(spark: SparkSession, dir: String): DataFrame =
    phashNearPairsOf(phashSignatures(spark, dir))

  /** [[phashNearPairs]] over an arbitrary `(media_id, phash)` frame
    * (exposed so property tests can drive planted payloads through the
    * production plan and compare against brute force; `maxBucket`
    * defaults to the production cap and is overridable only so tests
    * can exercise the cap with small planted corpora).
    */
  def phashNearPairsOf(sig: DataFrame, maxBucket: Int = PhashMaxBucket): DataFrame =
    graft.operators.BandedPairs.pairs(sig, "media_id", "phash",
      PhashBands, PhashChunkBits, maxBucket, PhashMaxHamming)

  /** Planted-image count for [[decoded]] (ids 0..199 exist at every
    * harness SF) and the size formulas — shared with the oracle SQL.
    */
  val DecodeMaxId = 200L

  /** REAL image decode end-to-end through the JDK's own codecs: plant
    * [[DecodeMaxId]] deterministic images (gray PNG / RGB PNG / RGB BMP
    * round-robin by id, pixel channels from [[ImageCodec]]'s integer
    * formulas), PNG/BMP-encode them with `javax.imageio`, then DECODE
    * the real bytes back ([[ImageCodec.lumaRaster]]) and extract
    * features — dimensions, exact luma sum, and the
    * [[Multimodal.aHashGrid]] signature over the decoded pixel luma.
    * The oracle never touches a codec: it recomputes every feature
    * ANALYTICALLY from the planted pixel formulas, so any decoder
    * defect (band order, row order, colorspace remap, lossy roundtrip)
    * breaks the exact value compare. Encode and decode are both
    * scan-local `mapPartitions` — zero shuffle, the standard media
    * ingest shape at any corpus size.
    */
  def decoded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") < DecodeMaxId)
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 24).toInt
        val h = (8 + id % 16).toInt
        val fmt = (id % 3) match {
          case 0 => "png-gray"
          case 1 => "png-rgb"
          case _ => "bmp-rgb"
        }
        Multimodal.MediaRow(id, ImageCodec.encodePlanted(id, w, h, fmt), fmt)
      })
    ImageCodec.decodeFeatures(media, PhashBits)(spark).toDF()
      .orderBy("media_id")
  }

  /** REAL audio decode end-to-end through the JDK's own WAV codec —
    * [[decoded]]'s contract for the audio modality: plant
    * [[DecodeMaxId]] deterministic 16-bit mono PCM clips (samples from
    * [[AudioCodec.plantedSample]]'s integer formula, spanning the full
    * signed range so endianness/sign misreads fail loudly), WAV-encode
    * them with `javax.sound.sampled`, decode the real bytes back, and
    * report exact integer sample statistics. The oracle recomputes
    * everything analytically from the sample formula — no codec on the
    * DuckDB side. With this, only VIDEO decode remains byte-domain
    * (the JDK ships no video codec).
    */
  def audioDecoded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") < DecodeMaxId)
      .as[Long]
      .mapPartitions(_.map { id =>
        val n = (200 + (id % 5) * 50).toInt
        Multimodal.MediaRow(id, AudioCodec.encodePlanted(id, n), "audio/wav")
      })
    AudioCodec.decodeFeatures(media)(spark).toDF()
      .orderBy("media_id")
  }

  /** REAL animated-GIF multi-frame decode — the VIDEO-shaped modality
    * through an actual JDK codec: plant [[DecodeMaxId]] animated GIFs
    * (2–5 full-size indexed-gray frames from
    * [[ImageCodec.plantedFrameGray]]'s integer formula), encode them
    * with `javax.imageio`'s sequence writer, then enumerate and decode
    * every REAL frame back (`ImageReader.getNumImages` / `read(i)` —
    * the API `ImageIO.read` truncates to frame 0) and report per-frame
    * dimensions, exact luma sum, and the temporal feature a video
    * pipeline actually computes: the summed per-pixel |Δ| against the
    * previous frame. The planted shift makes that delta analytically
    * two-valued (41 below the mod-256 wrap, 215 across it), so the
    * oracle recomputes everything from the formulas — a decoder that
    * drops frames, reorders them, or remaps the palette fails the
    * exact compare. With this, the byte-domain stand-in remains only
    * for payloads no JDK codec exists for (compressed video streams).
    * Scan-local mapPartitions, zero shuffle.
    */
  def gifFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") < DecodeMaxId)
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 13).toInt
        val h = (8 + id % 11).toInt
        val n = (2 + id % 4).toInt
        Multimodal.MediaRow(id, ImageCodec.encodePlantedGif(id, w, h, n), "image/gif")
      })
    media.mapPartitions(_.flatMap { r =>
      val fs = ImageCodec.frameRasters(r.payload).getOrElse(Seq.empty)
      fs.zipWithIndex.map { case ((w, h, luma), i) =>
        val lsum = ImageCodec.lumaSum(luma)
        var dsum = 0L
        if (i > 0) {
          val prev = fs(i - 1)._3
          var k = 0
          while (k < luma.length) {
            dsum += math.abs((luma(k) & 0xff) - (prev(k) & 0xff)); k += 1
          }
        }
        (r.media_id, i.toLong, w.toLong, h.toLong, lsum, dsum)
      }
    }).toDF("media_id", "frame_idx", "width", "height", "luma_sum", "delta_sum")
      .orderBy("media_id", "frame_idx")
  }

  /** Media ingest quarantine — `src_json_corrupt`'s contract for binary
    * payloads: a 100 TB media crawl always contains blobs that are
    * garbage or truncated mid-stream, and the decode stage must ROUTE
    * them to a quarantine report, never crash the task or silently
    * drop them. The planted set mixes valid PNG/WAV payloads with two
    * corruption classes — pure garbage (no codec magic) and REAL
    * encodes truncated to 24 bytes (magic matches, body fails
    * mid-stream, the case that throws inside a codec rather than
    * returning null). Every payload is classified by ACTUALLY
    * attempting both decodes (image first, then audio); the oracle
    * knows which residue class each planted id is in, so the per-status
    * counts are analytic — a decoder that crashes, misroutes, or
    * half-decodes a truncated payload breaks the compare. Scan-local
    * mapPartitions, one group-by on the tiny status key.
    */
  def quarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") < DecodeMaxId)
      .as[Long]
      .mapPartitions(_.map { id =>
        val payload: Array[Byte] =
          if (id % 5 == 4) Array.tabulate(32)(i => ((id * 7 + i) % 251).toByte)
          else {
            val full =
              if (id % 2 == 0) ImageCodec.encodePlanted(id, 8 + (id % 8).toInt, 8, "png-rgb")
              else AudioCodec.encodePlanted(id, 100 + (id % 4).toInt * 25)
            if (id % 5 == 3) full.take(24) else full
          }
        Multimodal.MediaRow(id, payload, "application/octet-stream")
      })
    media.mapPartitions(_.map { r =>
      val status =
        if (ImageCodec.lumaRaster(r.payload).isDefined) "image"
        else if (AudioCodec.samples(r.payload).isDefined) "audio"
        else "quarantined"
      (r.media_id, status)
    }).toDF("media_id", "status")
      .groupBy("status")
      .agg(count(lit(1)).as("n_media"), min("media_id").as("first_id"))
      .orderBy("status")
  }

  /** The composed MEDIA-modality pipeline — [[SampleOps.corpusPipeline]]
    * for payloads, in ONE Spark DAG: (1) perceptual dedup — every
    * payload collapses to its [[Multimodal.aHashGrid]] signature and each
    * signature group elects min(media_id) as its representative (hash
    * group-by + membership join, the `dedup_exact` shape on the
    * perceptual key); (2) frame-sampling arithmetic over the survivors
    * ([[frames]]' formula); (3) the per-language ingest report a
    * pipeline owner reads: total vs kept media, surviving frame and
    * byte volumes. Signatures are constant-size, the election is one
    * shuffle on `phash`, the membership join one shuffle on `media_id` —
    * no stage touches payload bytes twice, and every constant (block
    * width, signature bits, frame bytes) is the SAME Scala value its
    * standalone query uses, so the composed oracle cannot drift from
    * the per-stage ones.
    */
  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    val keep = phashSignatures(spark, dir)
      .groupBy("phash").agg(min("media_id").as("media_id"))
      .select(col("media_id"), lit(1L).as("k"))
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), col("lang"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .withColumn("n_frames",
        greatest(lit(1L), ceil(col("byte_len") / lit(FrameBytes.toDouble)).cast("long")))
      .join(keep, Seq("media_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("total_media"),
        sum(coalesce(col("k"), lit(0L))).as("kept_media"),
        sum(when(col("k").isNotNull, col("n_frames")).otherwise(0L)).as("frames"),
        sum(when(col("k").isNotNull, col("byte_len")).otherwise(0L)).as("bytes"))
      .orderBy("lang")
  }

  /** Active-frame energy cut for [[audioVad]]: a [[AudioCodec.SegWindow]]-
    * sample frame is ACTIVE when its abs-sum exceeds this (quiet planted
    * frames bound at 100·50 = 5 000; loud ones at ≥ 8 000·50 = 400 000 —
    * the cut sits between with a 10× margin each way).
    */
  val VadThreshold = 50000L

  /** Windowed-energy VAD segmentation — the silence-trim / speech-
    * segmentation pass an audio training-data pipeline runs before
    * transcription or packing, end-to-end through the REAL JDK WAV
    * codec: plant [[DecodeMaxId]] segmented clips
    * ([[AudioCodec.plantedSegSample]]'s quiet/loud integer formula),
    * decode the actual bytes back, frame into [[AudioCodec.SegWindow]]-
    * sample windows with exact abs-sum energies (decode + framing +
    * energy all scan-local — only tiny per-frame rows leave the scan),
    * threshold into active/quiet, and report per clip: frame count,
    * active frames, active ppm, longest active run, and segment count
    * (gaps-and-islands over the per-clip frames — ≤ 8 rows per clip).
    * The oracle recomputes the whole chain from the sample formula —
    * a decoder defect or framing off-by-one breaks the exact compare.
    */
  def audioVad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") < DecodeMaxId)
      .as[Long]
      .mapPartitions(_.map { id =>
        val n = (200 + (id % 5) * 50).toInt
        Multimodal.MediaRow(id, AudioCodec.encodePlantedSegments(id, n), "audio/wav")
      })
    // The tiny per-frame energy rows materialize ONCE (localCheckpoint —
    // the spanIncremental discipline): the islands branch and the
    // totals branch would otherwise each re-run the decode scan.
    val act = AudioCodec.windowEnergies(media)(spark).toDF()
      .withColumn("active", col("abs_sum") > VadThreshold)
      .localCheckpoint()
    val isl = act.filter(col("active"))
      .withColumn("grp", col("w") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("media_id").orderBy("w")))
    val seg = isl.groupBy("media_id", "grp").agg(count(lit(1)).as("len"))
    val per = seg.groupBy("media_id")
      .agg(count(lit(1)).as("n_segments"), max("len").as("longest_run"),
        sum("len").as("act"))
    act.groupBy("media_id").agg(count(lit(1)).as("n_windows"))
      .join(per, Seq("media_id"), "left")
      .select(col("media_id"), col("n_windows"),
        coalesce(col("act"), lit(0L)).as("active_windows"),
        expr("(coalesce(act, 0L) * 1000000) div n_windows").as("active_ppm"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"))
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_frames" -> (frames _),
    "multimodal_features" -> (features _),
    "multimodal_resize" -> (resized _),
    "multimodal_phash" -> (phashGroups _),
    "multimodal_phash_near" -> (phashNearPairs _),
    "multimodal_decode" -> (decoded _),
    "multimodal_audio" -> (audioDecoded _),
    "multimodal_audio_vad" -> (audioVad _),
    "multimodal_gif_frames" -> (gifFrames _),
    "multimodal_quarantine" -> (quarantine _),
    "pipeline_media" -> (mediaPipeline _),
  )

  /** Byte-exact aHash CTE chain ending in `all_sig(media_id, phash)`:
    * reconstruct bytes from the blob's bits, grid each payload into
    * [[PhashBits]] proportional blocks (`(i * PhashBits) // n` — the
    * exact integer arithmetic [[Multimodal.aHashGrid]] uses), block
    * sums vs the whole-payload sum by cross-multiplied integer
    * compare, bits assembled with shifts — all constants shared. The
    * LEFT JOIN back to every payload matters: an empty blob has no
    * byte rows but still hashes (to 0) on the Spark side. Shared by
    * the dup-group and banded-pair oracles so the two stay one
    * signature definition.
    */
  private val duckPhashCtes: String = duckPhashCtesAt(PhashBits)

  /** The aHash CTE chain at an arbitrary grid precision — shared by the
    * full-precision near-pair oracle and the coarse grouping oracle.
    */
  private def duckPhashCtesAt(bits: Int): String =
    s"""d AS (
       |  SELECT doc_id AS media_id, encode(text)::BIT bb,
       |         octet_length(encode(text)) n
       |  FROM documents),
       |bytes AS (
       |  SELECT media_id, i, CAST(n AS BIGINT) AS n,
       |         get_bit(bb, CAST(8*i   AS INT))*128 + get_bit(bb, CAST(8*i+1 AS INT))*64 +
       |         get_bit(bb, CAST(8*i+2 AS INT))*32  + get_bit(bb, CAST(8*i+3 AS INT))*16 +
       |         get_bit(bb, CAST(8*i+4 AS INT))*8   + get_bit(bb, CAST(8*i+5 AS INT))*4 +
       |         get_bit(bb, CAST(8*i+6 AS INT))*2   + get_bit(bb, CAST(8*i+7 AS INT)) AS v
       |  FROM d, LATERAL unnest(range(n)) t(i)),
       |tot AS (SELECT media_id, CAST(sum(v) AS BIGINT) AS total FROM bytes GROUP BY media_id),
       |blk AS (
       |  SELECT media_id, (i * $bits) // n AS b, n,
       |         CAST(sum(v) AS BIGINT) AS s, count(*) AS blen
       |  FROM bytes
       |  GROUP BY media_id, (i * $bits) // n, n),
       |sig AS (
       |  SELECT blk.media_id,
       |         CAST(sum(CASE WHEN s * n > total * blen
       |                       THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS phash
       |  FROM blk JOIN tot USING (media_id)
       |  GROUP BY blk.media_id),
       |all_sig AS (
       |  SELECT d.media_id, coalesce(sig.phash, 0) AS phash
       |  FROM d LEFT JOIN sig USING (media_id))""".stripMargin

  /** DuckDB twin of [[phashNearPairs]] (bands generated from the same
    * constants; `bit_count(xor)` matches Spark's `bit_count(^)`; `okb`
    * mirrors the [[PhashMaxBucket]] bucket cap).
    */
  private val duckPhashPairsSql: String = {
    val mask = (1L << PhashChunkBits) - 1
    val bandSelects = (0 until PhashBands).map { b =>
      s"  SELECT media_id, phash, CAST($b AS BIGINT) AS band, " +
        s"(phash >> ${b * PhashChunkBits}) & $mask AS chunk FROM all_sig"
    }.mkString("\n  UNION ALL\n")
    s"""WITH $duckPhashCtes,
       |bands AS (
       |$bandSelects),
       |okb AS (
       |  SELECT band, chunk FROM bands GROUP BY band, chunk
       |  HAVING count(*) > 1 AND count(*) <= $PhashMaxBucket)
       |SELECT DISTINCT x.media_id AS a, y.media_id AS b,
       |  CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
       |FROM bands x
       |JOIN okb ON x.band = okb.band AND x.chunk = okb.chunk
       |JOIN bands y
       |  ON x.band = y.band AND x.chunk = y.chunk AND x.media_id < y.media_id
       |WHERE bit_count(xor(x.phash, y.phash)) <= $PhashMaxHamming
       |ORDER BY hamming, a, b""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "multimodal_phash" ->
      s"""WITH ${duckPhashCtesAt(PhashGroupBits)}
         |SELECT phash, count(*) AS dup_cnt, min(media_id) AS rep_media
         |FROM all_sig GROUP BY phash HAVING count(*) > 1
         |ORDER BY dup_cnt DESC, phash""".stripMargin,
    "multimodal_phash_near" -> duckPhashPairsSql,
    // The planted-image decode twin never runs a codec: pixel channels
    // are the shared integer formulas, luma is the same exact Rec.601
    // integer division, and the signature is the same proportional-grid
    // cross-multiplied compare as duckPhashCtes — over ANALYTIC pixel
    // values, so the Spark side's encode→decode roundtrip is what's
    // under test.
    "multimodal_decode" ->
      s"""WITH planted AS (
         |  SELECT doc_id AS media_id,
         |         8 + doc_id % 24 AS w, 8 + doc_id % 16 AS h,
         |         CASE doc_id % 3 WHEN 0 THEN 'png-gray'
         |                         WHEN 1 THEN 'png-rgb'
         |                         ELSE 'bmp-rgb' END AS fmt
         |  FROM documents WHERE doc_id < $DecodeMaxId),
         |lum AS (
         |  SELECT media_id, fmt, w, h, i,
         |    CASE WHEN fmt = 'png-gray'
         |      THEN (7*(i % w) + 13*(i // w) + 31*media_id) % 256
         |      ELSE (299*((7*(i % w) + 13*(i // w) + 31*media_id) % 256)
         |          + 587*((11*(i % w) + 17*(i // w) + 29*media_id) % 256)
         |          + 114*((5*(i % w) + 19*(i // w) + 23*media_id) % 256)) // 1000
         |    END AS v
         |  FROM planted, LATERAL unnest(range(w*h)) t(i)),
         |tot AS (
         |  SELECT media_id, CAST(sum(v) AS BIGINT) AS luma_sum,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM lum GROUP BY media_id),
         |blk AS (
         |  SELECT media_id, (i * $PhashBits) // (w * h) AS b,
         |         CAST(sum(v) AS BIGINT) AS s, count(*) AS blen
         |  FROM lum GROUP BY media_id, (i * $PhashBits) // (w * h)),
         |sig AS (
         |  SELECT blk.media_id,
         |         CAST(sum(CASE WHEN s * n > luma_sum * blen
         |                  THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
         |                  ELSE 0 END) AS BIGINT) AS phash
         |  FROM blk JOIN tot USING (media_id)
         |  GROUP BY blk.media_id)
         |SELECT p.media_id, p.fmt,
         |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |       CAST(w * h AS BIGINT) AS n_px, tot.luma_sum, sig.phash
         |FROM planted p
         |JOIN tot USING (media_id)
         |JOIN sig USING (media_id)
         |ORDER BY media_id""".stripMargin,
    // Analytic twin of the animated-GIF roundtrip: per-frame luma and
    // temporal delta recomputed from the planted formulas (the |Δ| is
    // two-valued because consecutive frames differ by the constant
    // shift mod 256), never a codec.
    "multimodal_gif_frames" -> {
      val shift = ImageCodec.GifFrameShift
      val wrap = 256 - shift
      s"""WITH planted AS (
         |  SELECT doc_id AS media_id,
         |         8 + doc_id % 13 AS w, 8 + doc_id % 11 AS h,
         |         2 + doc_id % 4 AS nf
         |  FROM documents WHERE doc_id < $DecodeMaxId),
         |px AS (
         |  SELECT media_id, w, h, f,
         |         (7*(i % w) + 13*(i // w) + 31*media_id + $shift*f) % 256 AS v
         |  FROM planted, LATERAL unnest(range(nf)) ft(f),
         |       LATERAL unnest(range(w*h)) t(i))
         |SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
         |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |       CAST(sum(v) AS BIGINT) AS luma_sum,
         |       CAST(CASE WHEN f = 0 THEN 0 ELSE
         |         sum(CASE WHEN (v + $wrap) % 256 < $wrap
         |                  THEN $shift ELSE $wrap END) END AS BIGINT) AS delta_sum
         |FROM px GROUP BY media_id, f, w, h
         |ORDER BY media_id, frame_idx""".stripMargin
    },
    // Analytic twin of the WAV roundtrip: sample statistics recomputed
    // from the shared generating formula, never a codec.
    "multimodal_audio" ->
      s"""WITH planted AS (
         |  SELECT doc_id AS media_id, 200 + (doc_id % 5) * 50 AS n
         |  FROM documents WHERE doc_id < $DecodeMaxId),
         |s AS (
         |  SELECT media_id, n, ((31*media_id + 17*i) % 65536) - 32768 AS v
         |  FROM planted, LATERAL unnest(range(n)) t(i))
         |SELECT media_id, 'audio/wav' AS fmt, CAST(n AS BIGINT) AS n_samples,
         |       CAST(sum(v) AS BIGINT) AS sum_s,
         |       CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
         |       CAST(min(v) AS BIGINT) AS s_min, CAST(max(v) AS BIGINT) AS s_max
         |FROM s GROUP BY media_id, n
         |ORDER BY media_id""".stripMargin,
    // VAD twin: the segmented sample formula, framing, threshold, and
    // gaps-and-islands segmentation all regenerate from the same
    // constants — no codec on the DuckDB side.
    "multimodal_audio_vad" -> {
      val sw = AudioCodec.SegWindow
      s"""WITH planted AS (
         |  SELECT doc_id AS media_id, 200 + (doc_id % 5) * 50 AS n
         |  FROM documents WHERE doc_id < $DecodeMaxId),
         |s AS (
         |  SELECT media_id, i, i // $sw AS w,
         |    CASE WHEN ((i // $sw) + media_id) % 3 = 0
         |         THEN (7 * media_id + 13 * i) % 201 - 100
         |         ELSE CASE WHEN i % 2 = 0
         |                   THEN (31 * media_id + 17 * i) % 20000 + 8000
         |                   ELSE -((31 * media_id + 17 * i) % 20000 + 8000) END
         |    END AS v
         |  FROM planted, LATERAL unnest(range(n)) t(i)),
         |e AS (SELECT media_id, w, sum(abs(v)) AS ab FROM s GROUP BY 1, 2),
         |isl AS (
         |  SELECT media_id, w,
         |         w - row_number() OVER (PARTITION BY media_id ORDER BY w) AS grp
         |  FROM e WHERE ab > $VadThreshold),
         |seg AS (SELECT media_id, grp, count(*) AS len FROM isl GROUP BY 1, 2),
         |per AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_segments,
         |               CAST(max(len) AS BIGINT) AS longest_run,
         |               CAST(sum(len) AS BIGINT) AS act
         |        FROM seg GROUP BY 1),
         |tot AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_windows
         |        FROM e GROUP BY 1)
         |SELECT t.media_id, t.n_windows,
         |  coalesce(p.act, 0) AS active_windows,
         |  (coalesce(p.act, 0) * 1000000) // t.n_windows AS active_ppm,
         |  coalesce(p.longest_run, 0) AS longest_run,
         |  coalesce(p.n_segments, 0) AS n_segments
         |FROM tot t LEFT JOIN per p USING (media_id)
         |ORDER BY media_id""".stripMargin
    },
    // The quarantine twin classifies each planted id by its residue
    // class — the ground truth the Spark side must REDISCOVER by
    // actually decoding: id%5 in {3,4} corrupt (truncated / garbage),
    // otherwise image when even, audio when odd.
    "multimodal_quarantine" ->
      s"""WITH planted AS (
         |  SELECT doc_id AS media_id,
         |         CASE WHEN doc_id % 5 IN (3, 4) THEN 'quarantined'
         |              WHEN doc_id % 2 = 0 THEN 'image'
         |              ELSE 'audio' END AS status
         |  FROM documents WHERE doc_id < $DecodeMaxId)
         |SELECT status, count(*) AS n_media, min(media_id) AS first_id
         |FROM planted GROUP BY status ORDER BY status""".stripMargin,
    // Composed pipeline: perceptual-dedup election over the SAME
    // signature CTE chain, frame arithmetic from the same FrameBytes
    // constant as multimodal_frames.
    "pipeline_media" ->
      s"""WITH $duckPhashCtes,
         |rep AS (SELECT min(media_id) AS media_id FROM all_sig GROUP BY phash),
         |base AS (
         |  SELECT doc_id AS media_id, lang,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         |    greatest(1, CAST(ceil(octet_length(encode(text)) / $FrameBytes.0) AS BIGINT)) AS n_frames
         |  FROM documents)
         |SELECT base.lang,
         |  count(*) AS total_media,
         |  CAST(sum(CASE WHEN rep.media_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS kept_media,
         |  CAST(sum(CASE WHEN rep.media_id IS NOT NULL THEN n_frames ELSE 0 END) AS BIGINT) AS frames,
         |  CAST(sum(CASE WHEN rep.media_id IS NOT NULL THEN byte_len ELSE 0 END) AS BIGINT) AS bytes
         |FROM base LEFT JOIN rep USING (media_id)
         |GROUP BY base.lang ORDER BY base.lang""".stripMargin,
    "multimodal_frames" ->
      s"""SELECT doc_id, byte_len,
         |  unnest(generate_series(0, n_frames - 1)) AS frame_idx,
         |  unnest(generate_series(0, n_frames - 1)) * $FrameBytes AS frame_off
         |FROM (
         |  SELECT doc_id,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         |    greatest(1, CAST(ceil(octet_length(encode(text)) / $FrameBytes.0) AS BIGINT)) AS n_frames
         |  FROM documents) t
         |ORDER BY doc_id, frame_idx""".stripMargin,
    // Same byte reconstruction as multimodal_features, restricted to the
    // stride-selected bytes (i % stride = 0) — exactly the bytes the
    // resampler keeps.
    "multimodal_resize" ->
      s"""WITH d AS (
         |  SELECT doc_id AS media_id, encode(text)::BIT bb,
         |         octet_length(encode(text)) n
         |  FROM documents),
         |bytes AS (
         |  SELECT media_id,
         |         get_bit(bb, CAST(8*i   AS INT))*128 + get_bit(bb, CAST(8*i+1 AS INT))*64 +
         |         get_bit(bb, CAST(8*i+2 AS INT))*32  + get_bit(bb, CAST(8*i+3 AS INT))*16 +
         |         get_bit(bb, CAST(8*i+4 AS INT))*8   + get_bit(bb, CAST(8*i+5 AS INT))*4 +
         |         get_bit(bb, CAST(8*i+6 AS INT))*2   + get_bit(bb, CAST(8*i+7 AS INT)) AS v
         |  FROM d, LATERAL unnest(range(n)) t(i)
         |  WHERE i % $ResizeStride = 0),
         |agg AS (
         |  SELECT media_id, count(*) AS rn,
         |         CAST(sum(v) AS DOUBLE) / count(*) AS f_mean,
         |         CAST(min(v) AS DOUBLE) AS f_min,
         |         CAST(max(v) AS DOUBLE) AS f_max
         |  FROM bytes GROUP BY media_id)
         |SELECT d.media_id, CAST(coalesce(agg.rn, 0) AS BIGINT) AS resized_len,
         |       coalesce(f_mean, 0.0) AS f_mean,
         |       coalesce(f_min, 255.0) AS f_min, coalesce(f_max, 0.0) AS f_max
         |FROM d LEFT JOIN agg USING (media_id)
         |ORDER BY media_id""".stripMargin,
    // Byte-exact twin of the stub decoder: reconstruct each payload byte
    // from the blob's bits (DuckDB has get_bit but no get_byte), bucket
    // bytes into 256-byte frames, and aggregate the same four moments.
    "multimodal_features" ->
      s"""WITH d AS (
         |  SELECT doc_id AS media_id, encode(text)::BIT bb,
         |         octet_length(encode(text)) n
         |  FROM documents),
         |frames AS (
         |  SELECT media_id, CAST(n AS BIGINT) AS byte_len,
         |         unnest(range(greatest(1, CAST(ceil(n / $FrameBytes.0) AS BIGINT)))) AS f
         |  FROM d),
         |bytes AS (
         |  SELECT media_id, i // $FrameBytes AS f,
         |         get_bit(bb, CAST(8*i   AS INT))*128 + get_bit(bb, CAST(8*i+1 AS INT))*64 +
         |         get_bit(bb, CAST(8*i+2 AS INT))*32  + get_bit(bb, CAST(8*i+3 AS INT))*16 +
         |         get_bit(bb, CAST(8*i+4 AS INT))*8   + get_bit(bb, CAST(8*i+5 AS INT))*4 +
         |         get_bit(bb, CAST(8*i+6 AS INT))*2   + get_bit(bb, CAST(8*i+7 AS INT)) AS v
         |  FROM d, LATERAL unnest(range(n)) t(i)),
         |agg AS (
         |  SELECT media_id, f,
         |         CAST(sum(v) AS DOUBLE) / count(*) AS f_mean,
         |         CAST(sum(v*v) AS DOUBLE) / count(*) AS f_meansq,
         |         CAST(min(v) AS DOUBLE) AS f_min,
         |         CAST(max(v) AS DOUBLE) AS f_max
         |  FROM bytes GROUP BY media_id, f)
         |SELECT frames.media_id, byte_len, CAST(f AS BIGINT) AS frame_idx,
         |       CAST(f * $FrameBytes AS BIGINT) AS frame_off,
         |       coalesce(f_mean, 0.0) AS f_mean, coalesce(f_meansq, 0.0) AS f_meansq,
         |       coalesce(f_min, 255.0) AS f_min, coalesce(f_max, 0.0) AS f_max
         |FROM frames LEFT JOIN agg USING (media_id, f)
         |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
