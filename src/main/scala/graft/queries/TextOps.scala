package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.RollingHash

/** Text-analysis operators for an LLM-data pipeline (SURVEY.md §2.4):
  * tokenization + word counting, per-document quality scoring,
  * language-marker statistics, and rolling-hash fingerprinting.
  *
  * All token math uses whitespace splitting written identically in the
  * Spark and DuckDB twins (`split`/`string_split` both keep empty tokens
  * on runs of spaces, so both sides filter them). Ratios surface as
  * floor-scaled BIGINTs (parts-per-million) rather than rounded doubles:
  * floor of a bit-identical double quotient is engine-independent,
  * whereas round()'s half-way tie-breaking is not.
  */
object TextOps {

  /** Non-empty whitespace tokens of a text column. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Word frequency over the whole corpus (lower-cased): the direct
    * generalization of the reference's search-count pipeline.
    */
  def wordCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(lower(col("text")))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Keywords reported per document by [[tfidf]]. */
  val TfidfTopK = 3

  /** TF-IDF-style keyword extraction, integer-exact: each document's
    * tokens ranked by tf/df, surfaced as the scaled integer
    * `tf·10⁶ div df`. Two deliberate departures from the textbook
    * tf·ln(N/df): ln() would hand the compare to each engine's libm
    * (Java Math.log and DuckDB's C log may differ in the last ulp), and
    * the corpus-size factor N is CONSTANT within a ranking, so tf·N/df
    * and tf/df order every document's keywords identically — dropping N
    * keeps the score inside int64 at any corpus size (tf ≤ document
    * tokens, so tf·10⁶ is bounded by document length, never corpus
    * size), where tf·N·10⁶ would overflow ANSI BIGINT math near
    * N ~ 10¹⁰.
    *
    * Shapes for 100 TB: tf is one explode + (doc, token) group-by (the
    * wordcount shuffle); df aggregates the tf rows (distinct by
    * construction — no second corpus scan); the tf⋈df join shuffles on
    * the token key, the same scale class as the wordcount itself; the
    * corpus size joins as a broadcast scalar; and the per-doc top-k
    * window partitions by doc_id — bounded by a document's distinct
    * tokens, never corpus-sized. The doc_id < 20 report slice prunes
    * BEFORE the window but after df, so weights reflect the full corpus.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame =
    tfidfOf(Tables.documents(spark, dir))

  /** [[tfidf]] over an arbitrary documents frame (tests plant a tiny
    * corpus with hand-computed weights).
    */
  def tfidfOf(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("t"))
    tf.join(df, "t")
      .withColumn("score", expr("tf * 1000000 DIV df"))
      .filter(col("doc_id") < 20)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TfidfTopK)
      .select(col("doc_id"), col("rank"), col("t").as("token"),
        col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Quality scoring per document: token count, chars-per-token and
    * stopword ratio as floor-scaled ppm integers.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val stop = filter(toks, t => t.isin("the", "a", "of", "and"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("n_chars"),
        size(toks).cast("long").as("tok_cnt"),
        size(stop).cast("long").as("stop_cnt"))
      .withColumn("chars_per_tok_ppm",
        floor(col("n_chars") * lit(1000000.0) / col("tok_cnt")).cast("long"))
      .withColumn("stop_ppm",
        floor(col("stop_cnt") * lit(1000000.0) / col("tok_cnt")).cast("long"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic scaffolding: per tagged language, how many
    * documents carry the English stopword marker (the real n-gram model
    * would replace the marker CASE; the aggregation shape is the same).
    */
  def langMarkers(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("text").contains(" the "), 1L).otherwise(0L)).as("en_marker"))
      .orderBy("lang")

  /** Stopword profiles of the language-ID classifier — the textbook
    * closed-class-marker heuristic (a production system swaps in
    * character n-gram profiles; the scoring and argmax shape is
    * identical). Declaration ORDER is the deterministic tie-break, and
    * the lists are the single source both the Spark expressions and
    * the generated oracle SQL render from. Profiles deliberately
    * overlap (fr/es share articles) exactly as real ones do.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist", "nicht"),
    "es" -> Seq("el", "la", "que", "los", "una", "y"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "et"))

  /** Per-document language prediction — the actual classifier the
    * `text_langid` scaffolding stands in front of: count each
    * profile's marker tokens in one pass over the exploded tokens,
    * predict the highest-scoring language (ties to profile declaration
    * order, zero hits → "und"), and report the per-prediction corpus
    * histogram with total marker mass. One wordcount-class shuffle on
    * doc_id, constant per-doc state (one counter per profile), a
    * profiles-sized output — the shape that classifies 100 TB in one
    * scan. Exact value oracle: the same membership CASEs and ordered
    * argmax, generated from [[LangProfiles]].
    */
  def langidPredict(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("w"))
    val profileSums = LangProfiles.map { case (lang, ws) =>
      sum(when(col("w").isin(ws: _*), 1L).otherwise(0L)).as(s"s_$lang")
    }
    val scores = tok.groupBy("doc_id").agg(profileSums.head, profileSums.tail: _*)
    // Ordered argmax: the first profile whose score equals the max and
    // is positive wins; all-zero predicts "und".
    val maxScore = greatest(LangProfiles.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = LangProfiles.foldRight(lit("und")) { case ((l, _), rest) =>
      when(col(s"s_$l") === maxScore && maxScore > 0, lit(l)).otherwise(rest)
    }
    // foldRight keeps declaration order: en's WHEN is outermost.
    scores
      .select(col("doc_id"), predicted.as("predicted_lang"), maxScore.as("hits"))
      .groupBy("predicted_lang")
      .agg(count(lit(1)).as("docs"), sum("hits").as("marker_hits"))
      .orderBy("predicted_lang")
  }

  /** Token counting two ways per document: whitespace tokens and a
    * BPE-ish regex segmentation (letter runs / digit runs / single
    * punctuation — the shape a byte-pair pre-tokenizer produces). The
    * pattern sticks to ASCII classes, where Java and RE2 regex agree.
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .cast("long").as("bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Document fingerprint via the native rolling-hash expression. Exact
    * value oracle: DuckDB replays the polynomial as a HUGEINT
    * `list_reduce` with an explicit mod-2^64 per step (the corpus is
    * ASCII, so `ord(substr(...))` equals the UTF-8 byte the expression
    * hashes).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), RollingHash(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Email-shaped spans. ASCII classes only, where Java regex (Spark)
    * and RE2 (DuckDB) agree; both sides replace globally.
    */
  private val EmailPat = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"

  /** International-ish phone spans: `+C[C]-NNN-NNNN`. */
  private val PhonePat = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Masks email and phone spans in a text column. The building block a
    * training pipeline runs before anything leaves the ingest boundary.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPat, "<EMAIL>"),
      PhonePat, "<PHONE>")

  /** PII redaction audit per document. The synthetic corpus carries no
    * PII, so the query first PLANTS a deterministic email + phone per
    * document (derived from `doc_id`, identically in the oracle SQL) and
    * then redacts — exercising match counting and masking with an exact
    * value oracle. `red_len < raw_len` for every row because `<EMAIL>` /
    * `<PHONE>` are shorter than any planted span.
    */
  def redact(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    Tables.documents(spark, dir)
      .withColumn("planted", planted)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("planted"), lit(EmailPat), lit(0)))
          .cast("long").as("email_cnt"),
        size(regexp_extract_all(col("planted"), lit(PhonePat), lit(0)))
          .cast("long").as("phone_cnt"),
        length(col("planted")).cast("long").as("raw_len"),
        length(redactPii(col("planted"))).cast("long").as("red_len"))
      .orderBy("doc_id")
  }

  /** Repetition quality signals per document (the Gopher-style filters a
    * corpus pipeline keys on): duplicate-token fraction and the share of
    * the document consumed by its single most frequent bigram, both as
    * floor-scaled ppm. The bigram mode needs per-(doc, bigram) counts, so
    * it runs as explode → two-level aggregate — one shuffle on
    * (doc_id, bigram), partial-combined map-side; the distinct-token side
    * stays entirely inside expressions.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
    val stats = docs.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("tok_cnt"),
      size(array_distinct(col("toks"))).cast("long").as("uniq_cnt"))
    val topBigram = docs
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max(col("cnt")).as("top_cnt"))
    stats.join(topBigram, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("tok_cnt"), col("uniq_cnt"),
        floor((col("tok_cnt") - col("uniq_cnt")) * lit(1000000.0)
          / greatest(col("tok_cnt"), lit(1L))).cast("long").as("dup_tok_ppm"),
        coalesce(col("top_cnt"), lit(0L)).as("top_bigram_cnt"),
        floor(coalesce(col("top_cnt"), lit(0L)) * lit(1000000.0)
          / greatest(col("tok_cnt") - 1, lit(1L))).cast("long").as("top_bigram_ppm"))
      .orderBy("doc_id")
  }

  /** Support threshold (per-mille) and summary size for
    * [[heavyHitters]]. The Misra-Gries guarantee needs
    * k >= 1/φ - 1 = 999 for the candidate set to provably contain every
    * φ-heavy hitter; 1024 gives slack.
    */
  private val HeavyPerMille = 1L
  private[queries] val MgSummarySize = 1024

  /** Corpus-wide frequent tokens (≥ 0.1% of all tokens), computed the
    * 100 TB way: a bounded Misra-Gries summary (O(k) state per
    * partition, mergeable map-side) produces a provably-superset
    * candidate list, and a second pass counts ONLY the candidates
    * (semi-join pruned) exactly. The result is therefore exact — the
    * sketch bounds memory, not accuracy — and oracle-checks against a
    * plain GROUP BY ... HAVING in DuckDB. Compare `text_wordcount`,
    * which shuffles the full vocabulary; this shape shuffles ≤ k
    * candidate groups no matter how large the vocabulary grows.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val mg = udaf(new graft.functions.MisraGries(MgSummarySize),
      org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("w", StringType)))))
    val words = Tables.documents(spark, dir)
      .select(explode(tokens(lower(col("text")))).as("w"))
    val cand = words.agg(mg(col("w")).as("mg"))
      .select(explode(col("mg.words")).as("w"))
    val totals = words.agg(count(lit(1)).as("total"))
    words.join(broadcast(cand), Seq("w"), "leftsemi")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals))
      .filter(col("cnt") * lit(1000L) >= col("total") * lit(HeavyPerMille))
      .select(col("w"), col("cnt"))
      .orderBy("w")
  }

  /** Summary size for [[heavyHittersIncr]] — deliberately SMALLER than
    * the fixture vocabulary so both the per-split prunes and the merge
    * prune genuinely subtract at the gate scale (with
    * [[MgSummarySize]], nothing would prune and the drill would
    * degenerate to a wordcount).
    */
  private[queries] val MgIncrK = 16

  /** Incremental heavy-hitter maintenance via mergeable Misra-Gries
    * summaries — the [[ScalarOps.approxDistinctIncr]] (HLL) /
    * `approx_percentile_incr` (KLL) contract for FREQUENT ITEMS,
    * completing the incremental-sketch trio: history (train split) and
    * the incoming batch each collapse to an O(k) summary, and the
    * corpus-wide candidates come from merging the TWO SUMMARIES —
    * never from re-scanning history. In production the history summary
    * is a PERSISTED artifact (≤ k (token, count) pairs regardless of
    * corpus size) and each batch merges in.
    *
    * Each summary is the DETERMINISTIC mergeable-summaries
    * construction (Agarwal et al., "Mergeable Summaries"): exact
    * per-part counts pruned to ≤ k survivors by subtracting the
    * (k+1)-th largest count — a value defined by the count MULTISET
    * alone, so arrival and aggregation order cannot perturb it (unlike
    * the one-pass streaming fold, whose summary content is
    * order-dependent; `stream_trending` exercises exactly this
    * count-prune-merge cycle as LIVE stream state). The merge is
    * combine + the same prune ([[graft.functions.MisraGries.mergeMaps]]'
    * semantics, unrolled relationally), which keeps the merged error
    * ≤ N_total/(k+1) by the mergeable-summaries theorem. That
    * determinism is what buys the FULL VALUE ORACLE: the DuckDB twin
    * unrolls both prunes and the merge from the same [[MgIncrK]].
    * Estimates are under-counts within the band; SketchAccuracySpec
    * pins the band and the φ-heavy-hitter superset guarantee.
    */
  def heavyHittersIncr(spark: SparkSession, dir: String): DataFrame = {
    val k = MgIncrK
    // Prune exact (w, c) counts to an MG summary: subtract the
    // (k+1)-th largest count (0 when ≤ k entries). TakeOrdered keeps
    // the cut computation distributed; ties at the boundary do not
    // matter because only the VALUE of the (k+1)-th count is used.
    def prune(counts: DataFrame): DataFrame = {
      val cut = counts.orderBy(desc("c")).limit(k + 1)
        .agg(coalesce(when(count(lit(1)) === (k + 1).toLong, min("c")), lit(0L))
          .as("cut"))
      counts.crossJoin(broadcast(cut))
        .filter(col("c") > col("cut"))
        .select(col("w"), (col("c") - col("cut")).as("c"))
    }
    // Each stage's exact counts localCheckpoint before pruning: prune
    // references its input TWICE (cut + filter), so without the pin
    // the corpus-sized tokenize+count subtree would re-execute per
    // reference — the Spark analog of the oracle's AS MATERIALIZED
    // CTEs. The pinned frames are vocabulary-sized.
    def summarize(toks: DataFrame): DataFrame =
      prune(toks.groupBy("w").agg(count(lit(1)).as("c")).localCheckpoint())
    val words = SampleOps.withSplit(Tables.documents(spark, dir))
      .select(col("split"), explode(tokens(lower(col("text")))).as("w"))
    val hist = summarize(words.filter(col("split") === "train"))
    val batch = summarize(words.filter(col("split") =!= "train"))
    prune(hist.unionByName(batch).groupBy("w").agg(sum("c").as("c"))
        .localCheckpoint())
      .select(col("w"), col("c").as("est_cnt"))
      .orderBy(desc("est_cnt"), asc("w"))
  }

  /** Doc-frequency ceiling for a token to count as rare ([[rarity]]). */
  val RareMaxDf = 2

  /** Rare-token rate per document: the share of token occurrences whose
    * corpus doc-frequency is ≤ [[RareMaxDf]] — the integer-exact stand-in
    * for LM-perplexity quality scoring (gibberish and boilerplate-free
    * unique content both surface as high-rarity; log-prob scoring would
    * rank the same way but floats last-ulp-differ across engines).
    * Shape: per-(doc, token) counts shuffle once on (doc_id, t); the
    * doc-frequency table aggregates that by token and the rare-token
    * inner join is co-partitioned on t; per-doc totals come straight off
    * the scan (no shuffle). The rare set is Zipf-tail-sized, so the join
    * is the standard shuffle-on-key — no broadcast assumption that a
    * growing vocabulary would break.
    */
  def rarity(spark: SparkSession, dir: String): DataFrame =
    rarityOf(Tables.documents(spark, dir))

  /** [[rarity]] over an arbitrary documents frame (tests plant docs
    * with known shared/unique tokens).
    */
  def rarityOf(docs: DataFrame): DataFrame = {
    val toks = tokens(lower(col("text")))
    val stats = docs.select(col("doc_id"), size(toks).cast("long").as("tok_cnt"))
    val occ = docs
      .select(col("doc_id"), explode(toks).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val rare = occ.groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df") <= RareMaxDf)
      .select("t")
    val rareCnt = occ.join(rare, "t")
      .groupBy("doc_id").agg(sum("c").as("rare_cnt"))
    stats.join(rareCnt, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("tok_cnt"),
        coalesce(col("rare_cnt"), lit(0L)).as("rare_cnt"),
        floor(coalesce(col("rare_cnt"), lit(0L)) * lit(1000000.0)
          / greatest(col("tok_cnt"), lit(1L))).cast("long").as("rare_ppm"))
      .orderBy("doc_id")
  }

  /** Tokens per non-overlapping chunk for [[boilerplate]]. */
  val ChunkTokens = 8

  /** Training-chunk geometry for [[trainingChunks]]: window and overlap
    * in tokens (tiny for the harness corpus; production uses the model
    * context length and the identical arithmetic).
    */
  val ChunkSize = 32
  val ChunkOverlap = 8

  /** Intra-document chunking — the op that turns documents into fixed-
    * length training rows: sliding [[ChunkSize]]-token windows at
    * stride [[ChunkSize]]−[[ChunkOverlap]], each row carrying its token
    * span and materialized text. The overlap is what keeps context from
    * being severed at chunk boundaries (every token pair within
    * [[ChunkOverlap]] of a boundary co-occurs in some chunk). Shape:
    * scan-local arithmetic + one `sequence`/`explode` per document —
    * no shuffle at all before the report's sort, and the expansion
    * factor is n/stride, bounded by construction. A document shorter
    * than the window yields exactly one chunk of its full length;
    * empty documents yield none. The report slices to `doc_id < 100`
    * ([[lmScore]]'s convention) — the chunk arithmetic itself is
    * corpus-general.
    */
  def trainingChunks(spark: SparkSession, dir: String): DataFrame = {
    val stride = ChunkSize - ChunkOverlap
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("nc",
        greatest(lit(1L),
          ceil((col("n") - ChunkOverlap) / lit(stride.toDouble)).cast("long")))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("nc") - 1)).as("chunk_idx"))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("tok_len", least(lit(ChunkSize.toLong), col("n") - col("tok_start")))
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"), col("tok_len"),
        concat_ws(" ", slice(col("toks"),
          (col("tok_start") + 1).cast("int"), col("tok_len").cast("int"))).as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Sequence-packing capacity in tokens ([[packChunks]]): tiny for the
    * harness corpus; production uses the model context length with the
    * identical arithmetic.
    */
  val PackCapacity = 512L

  /** Partition count for [[packChunks]]' global prefix sum. */
  val PackPartitions = 32

  /** Concat-and-chunk SEQUENCE PACKING — the pretraining batch-prep
    * step that concatenates the tokenized corpus in a deterministic
    * document order and cuts it into fixed-[[PackCapacity]] training
    * sequences, so no context window is wasted on padding: each
    * document occupies the global token span [cum − n, cum) and lands
    * in chunks floor(start/C) .. floor((end−1)/C). The report is
    * per-chunk: how many documents touch it, how many lie WHOLLY
    * inside it (the rest are boundary-crossing continuations the
    * loader masks or lets attend), its token fill (= C everywhere but
    * the final chunk — packing leaves no holes by construction), and
    * its first document.
    *
    * Scale shape: the only corpus-wide state is the global running
    * token count, computed with the [[graft.operators.PrefixSum]]
    * two-pass range-partition shape (no single-task window at any
    * corpus size); the chunk expansion is one scan-local
    * `sequence`/`explode` bounded by n/C + 1 rows per document, and
    * the final aggregate shuffles on chunk_id — wordcount-class. The
    * oracle re-derives the identical spans from a window cumsum over
    * the same token counts.
    */
  def packChunks(spark: SparkSession, dir: String): DataFrame =
    packChunksOf(Tables.documents(spark, dir))

  /** [[packChunks]] over an arbitrary documents frame (tests plant
    * docs with hand-computed spans).
    */
  def packChunksOf(docsIn: DataFrame): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("tok_cnt"))
      .filter(col("tok_cnt") > 0)
    val cum = graft.operators.PrefixSum.withRunningTotal(
      docs, Seq(col("doc_id")), col("tok_cnt"), PackPartitions)
    cum
      .select(col("doc_id"), col("tok_cnt"),
        (col("cum") - col("tok_cnt")).as("strt"), col("cum"))
      .select(col("doc_id"), col("tok_cnt"), col("strt"), col("cum"),
        explode(sequence(expr(s"strt div $PackCapacity"),
          expr(s"(cum - 1) div $PackCapacity"))).as("chunk_id"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("strt") >= col("chunk_id") * PackCapacity &&
            col("cum") <= (col("chunk_id") + 1) * PackCapacity, 1L)
          .otherwise(0L)).as("n_whole_docs"),
        sum(least(col("cum"), (col("chunk_id") + 1) * PackCapacity) -
          greatest(col("strt"), col("chunk_id") * PackCapacity)).as("tok_fill"),
        min("doc_id").as("first_doc"))
      .orderBy("chunk_id")
  }

  /** Cross-document boilerplate signal: the share of each document made
    * of non-overlapping [[ChunkTokens]]-token chunks that appear in ≥ 2
    * documents — the hashed-paragraph dedup a crawl pipeline runs to
    * strip shared headers/footers/templates before training. Chunks are
    * NON-overlapping (tokens/[[ChunkTokens]] per doc, vs every-position
    * shingles), so the exploded volume is a fraction of the shingle
    * queries'; doc frequency comes from distinct (doc, chunk) rows and
    * joins back on the chunk key, co-partitioned after the aggregate.
    * Production would compare 64-bit chunk hashes, not chunk strings —
    * same plan, narrower shuffle.
    */
  def boilerplate(spark: SparkSession, dir: String): DataFrame =
    boilerplateOf(Tables.documents(spark, dir))

  /** The ordered per-doc [[ChunkTokens]]-token chunk instances shared by
    * [[boilerplateOf]] (detection) and [[boilerplateStripOf]]
    * (removal): one row per full window, position-indexed. explode_outer
    * + isNotNull (not plain explode) keeps InferFiltersFromGenerate
    * from re-inlining the tokenize+chunk tree into a scan-level filter
    * — see DedupOps.shingleSetWithSize.
    */
  private def chunkOccurrences(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) >= ChunkTokens,
          expr(s"""transform(sequence(1, size(toks) div $ChunkTokens),
                  |  i -> array_join(slice(toks, (i-1)*$ChunkTokens + 1, $ChunkTokens), ' '))""".stripMargin))
          .otherwise(expr("array()").cast("array<string>")).as("chunks"))
      .select(col("doc_id"), posexplode_outer(col("chunks")).as(Seq("idx", "chunk")))
      .filter(col("chunk").isNotNull)

  /** The cross-document template chunks ([[boilerplateOf]]'s df ≥ 2
    * rule) — ONE definition so detect and strip cannot drift.
    */
  private def sharedChunks(occ: DataFrame): DataFrame =
    occ.select("doc_id", "chunk").distinct()
      .groupBy("chunk").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)

  /** [[boilerplate]] over an arbitrary documents frame (tests plant a
    * shared template block).
    */
  def boilerplateOf(docs: DataFrame): DataFrame = {
    val occ = chunkOccurrences(docs).select("doc_id", "chunk")
    val shared = sharedChunks(occ).select(col("chunk"), lit(1L).as("hit"))
    // One left join carries both totals and hits into a single per-doc
    // aggregate; zero-chunk (short) docs re-enter via a doc_id-only
    // right branch, which column-prunes text out of that scan entirely.
    val per = occ.join(shared, Seq("chunk"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("hit"), lit(0L))).as("boiler_chunks"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("boiler_chunks"), lit(0L)).as("boiler_chunks"),
        floor(coalesce(col("boiler_chunks"), lit(0L)) * lit(1000000.0)
          / greatest(coalesce(col("n_chunks"), lit(0L)), lit(1L))).cast("long").as("boiler_ppm"))
      .orderBy("doc_id")
  }

  /** The TRANSFORM half of [[boilerplate]]: emit each document's
    * CLEANED text with the cross-document template chunks removed —
    * what the detector only reports, the strip actually does (the
    * training-corpus "remove headers/footers/navigation" pass).
    * Shares [[chunkOccurrences]] and [[sharedChunks]] with the
    * detector so the two cannot disagree about what boilerplate IS.
    * Surviving chunks rejoin IN ORDER (position index through the
    * anti join), and the sub-window tail — genuine content, never
    * df-testable — is always kept. The full cleaned text is in the
    * compared output, so the oracle gates the reconstruction
    * byte-for-byte, not just the counts.
    *
    * Scale shape: chunking is scan-local; the df count and the
    * chunk-keyed anti join are wordcount-class shuffles; the per-doc
    * reassembly groups by doc_id with state bounded by document
    * length (the sessionization bound).
    */
  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame =
    boilerplateStripOf(Tables.documents(spark, dir))

  /** [[boilerplateStrip]] over an arbitrary documents frame (tests
    * plant a template block and pin the reassembled text).
    */
  def boilerplateStripOf(docs: DataFrame): DataFrame = {
    val occ = chunkOccurrences(docs)
    val shared = sharedChunks(occ).select("chunk")
    val keptAgg = occ.join(shared, Seq("chunk"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_chunks"),
        expr("transform(array_sort(collect_list(struct(idx, chunk))), s -> s.chunk)")
          .as("segs"))
    val tails = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        expr(s"size(toks) div $ChunkTokens").as("n_chunks"),
        expr(s"""array_join(slice(toks, (size(toks) div $ChunkTokens) * $ChunkTokens + 1,
                |  size(toks) - (size(toks) div $ChunkTokens) * $ChunkTokens), ' ')""".stripMargin)
          .as("tail"))
    tails.join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_chunks"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        (col("n_chunks") - coalesce(col("kept_chunks"), lit(0L))).as("dropped_chunks"),
        expr("""array_join(filter(
               |  concat(coalesce(segs, cast(array() as array<string>)), array(tail)),
               |  s -> s != ''), ' ')""".stripMargin).as("cleaned"))
      .orderBy("doc_id")
  }

  /** URL canonicalization for crawl dedup ([[urlNorm]]): strip the
    * fragment, strip `utm_*` tracking params in ANY position (including
    * a leading `?utm_...`, renormalizing the `?` onto the next surviving
    * param or dropping it when none survives), lowercase. The corpus
    * carries no URLs, so the query PLANTS one per document from
    * `doc_id` (mixed-case host, tracking param first for even ids and
    * mid-query for odd ids, fragment — identically in the oracle SQL,
    * the same planted-fixture move as `text_redact`): many raw variants
    * collapse onto one canonical page URL, which is the whole point of
    * canonicalizing before URL-level dedup.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noMid = regexp_replace(noFrag, "&utm_[^&#]*", "")
    val noFirst = regexp_replace(noMid, "\\?utm_[^&#]*&", "?")
    lower(regexp_replace(noFirst, "\\?utm_[^&#]*$", ""))
  }

  /** Per-host raw-vs-canonical URL counts over planted crawl URLs. */
  def urlNorm(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val query = when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit("?utm_source=s"), id, lit("&x=1")))
      .otherwise(concat(lit("?x=1&utm_source=s"), id))
    val url = concat(
      lit("https://Src"), pmod(col("doc_id"), lit(20)).cast("string"),
      lit(".Example.com/p/"), pmod(col("doc_id"), lit(50)).cast("string"),
      query,
      lit("#sec"), id)
    Tables.documents(spark, dir)
      .select(url.as("raw"))
      .select(col("raw"),
        lower(regexp_extract(col("raw"), "^https://([^/]+)/", 1)).as("host"),
        canonicalUrl(col("raw")).as("canon"))
      .groupBy("host")
      .agg(countDistinct(col("raw")).as("raw_urls"),
        countDistinct(col("canon")).as("canon_urls"))
      .orderBy("host")
  }

  /** Minimum bigram count to enter the [[ngramLm]] table. */
  val LmMinCount = 20

  /** Corpus bigram language model: P(next | prev) for every bigram seen
    * ≥ [[LmMinCount]] times, as floor-scaled ppm of exact counts — the
    * model-building aggregation behind cheap LM-based corpus filtering
    * (score a candidate doc by its bigrams' table probabilities). Two
    * aggregates: bigram counts shuffle once on (prev, next); the prefix
    * totals derive FROM the bigram table (so the denominator is exactly
    * the table's own mass) and the join back is co-partitioned on the
    * prefix key. The min-count cut bounds the published table the way a
    * real LM prunes its long tail.
    */
  def ngramLm(spark: SparkSession, dir: String): DataFrame =
    ngramLmOf(Tables.documents(spark, dir), LmMinCount)

  /** [[ngramLm]] over an arbitrary documents frame with an explicit
    * count cut (tests plant a tiny corpus with hand-computed
    * conditionals).
    */
  def ngramLmOf(docs: DataFrame, minCount: Int): DataFrame = {
    val pairs = docs
      .select(tokens(lower(col("text"))).as("toks"))
      .select(explode(expr(
        """zip_with(slice(toks, 1, greatest(size(toks)-1, 0)),
          |         slice(toks, 2, greatest(size(toks)-1, 0)),
          |  (x, y) -> named_struct('a', x, 'b', y))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val bg = pairs.groupBy("a", "b").agg(count(lit(1)).as("c"))
    val totals = bg.groupBy("a").agg(sum("c").as("tot"))
    bg.join(totals, "a")
      .filter(col("c") >= minCount)
      .select(col("a"), col("b"), col("c"),
        floor(col("c") * lit(1000000.0) / col("tot")).cast("long").as("p_ppm"))
      .orderBy("a", "b")
  }

  /** LM-based corpus scoring — the CONSUMER of [[ngramLm]]'s table:
    * each document scored by the mean table probability of its bigrams,
    * with bigrams absent from the pruned table contributing zero —
    * exactly how a cheap-LM corpus filter penalizes out-of-model text.
    * Integer-exact: score = sum(p_ppm) DIV n_bigrams, no floats in the
    * decision. Shapes: the model build is [[ngramLm]]'s corpus-wide
    * aggregation (built BEFORE the report slice filters); scoring is
    * one bigram explode over the slice and one vocabulary-keyed left
    * join — the same scale class as text_rarity's doc-frequency join
    * (deliberately not a broadcast: the LM table grows with
    * vocabulary). Documents with < 2 tokens have no bigrams and no row,
    * on both engines.
    */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lm = ngramLmOf(docs, LmMinCount).select("a", "b", "p_ppm")
    val bigrams = docs
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), explode_outer(expr(
        """zip_with(slice(toks, 1, greatest(size(toks)-1, 0)),
          |         slice(toks, 2, greatest(size(toks)-1, 0)),
          |  (x, y) -> named_struct('a', x, 'b', y))""".stripMargin)).as("p"))
      .filter(col("p").isNotNull)
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    bigrams.join(lm, Seq("a", "b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("p_ppm")).as("in_model"),
        sum(coalesce(col("p_ppm"), lit(0L))).as("s"))
      .withColumn("score", expr("s DIV n_bigrams"))
      .drop("s")
      .orderBy("doc_id")
  }

  /** Quality-gate constants, shared by [[corpusFilter]] and
    * [[SampleOps.corpusPipeline]] — and interpolated into BOTH oracle
    * twins, so the standalone gate and the composed pipeline cannot
    * drift apart.
    */
  val GateMinChars = 100
  val GateMaxChars = 2000
  val GateMinTokens = 20
  val GateMinStopPpm = 10000 // ≥1% stopwords
  val GateStopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** The keep/drop predicate of the quality gate, applied to a frame
    * carrying `n_chars`, `tok_cnt`, `stop_cnt`.
    */
  def gateKeep: Column =
    col("n_chars") >= GateMinChars && col("n_chars") <= GateMaxChars &&
      col("tok_cnt") >= GateMinTokens &&
      col("stop_cnt") * 1000000L >= col("tok_cnt") * GateMinStopPpm.toLong

  /** Adds the gate's measurement columns (`tok_cnt`, `stop_cnt`). */
  def withGateCounts(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stop = filter(toks, t => t.isin(GateStopwords: _*))
    docs.withColumn("tok_cnt", size(toks).cast("long"))
      .withColumn("stop_cnt", size(stop).cast("long"))
  }

  /** Training-corpus quality filter: the composed keep/drop decision a
    * data pipeline runs before tokenization — length bounds, token
    * minimum, stopword-ratio band — reported as survivors per language.
    */
  def corpusFilter(spark: SparkSession, dir: String): DataFrame =
    withGateCounts(Tables.documents(spark, dir))
      .filter(gateKeep)
      .groupBy("lang")
      .agg(count(lit(1)).as("kept"),
        sum(col("tok_cnt")).as("kept_tokens"))
      .orderBy("lang")

  /** The gate as oracle-SQL fragments (generated from the same
    * constants): a projection computing `tok_cnt`/`stop_cnt` and the
    * WHERE predicate over them.
    */
  val duckGateCounts: String =
    s"""CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS tok_cnt,
       |      CAST(len(list_filter(string_split(text, ' '),
       |           t -> t IN (${GateStopwords.map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS stop_cnt""".stripMargin

  val duckGateKeep: String =
    s"""n_chars BETWEEN $GateMinChars AND $GateMaxChars
       |  AND tok_cnt >= $GateMinTokens
       |  AND stop_cnt * 1000000 >= tok_cnt * $GateMinStopPpm""".stripMargin

  /** Lexical diversity per document as Simpson concentration — the
    * probability two sampled tokens differ, 1 − Σc(c−1)/(N(N−1)) — in
    * exact integer arithmetic surfaced as ppm. Shannon entropy needs
    * logs whose last-ulp behavior differs across engines; Simpson is a
    * pure rational of token counts, so the oracle compare stays exact
    * while ranking degenerate ("aaa aaa aaa") documents the same way.
    * One shuffle on (doc_id, token), map-side combined; per-group state
    * is two longs.
    */
  def diversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n"),
        sum(col("c") * (col("c") - 1)).as("coll"))
      .filter(col("n") >= 2)
      .select(
        col("doc_id"),
        col("n").as("tok_cnt"),
        // div (integer division) — exact on this all-positive domain,
        // so no float rounding can disagree with DuckDB's `//`.
        expr("(1000000 * ((n * (n - 1)) - coll)) div (n * (n - 1))")
          .as("diversity_ppm"))
      .orderBy("doc_id")

  /** Multi-term retrieval query terms: one rare discriminative token
    * (high idf) plus two common ones — the shape a real keyword query
    * has against a crawl corpus.
    */
  val SearchTerms: Seq[String] = Seq("dup", "spark", "filter")

  /** Ranked multi-term retrieval — the inverted-index search the
    * reference's flagship pipeline points at, scored: per (doc, term)
    * term frequency joined with corpus document frequency, combined as
    * Σ tf·(10⁶ div df) (the same linear, integer-exact idf weight
    * [[tfidf]] uses — monotone in the same signal as ln(N/df) with no
    * libm in the compare). Plan: one corpus scan pre-filtered to
    * documents containing ANY query term (`arrays_overlap` — at scale
    * this predicate prunes the explode to the posting lists' docs),
    * tf and df from the same grouped subtree, df (≤ |terms| rows)
    * broadcast back, and a TakeOrderedAndProject head. No driver-side
    * index: the "inverted index" IS the grouped (term, doc, tf)
    * relation, which at 100 TB would be written bucketed by term once
    * and range-probed per query.
    */
  /** Per-(doc, term) frequencies for a term set, from ONE corpus scan
    * pre-filtered to documents holding any of the terms — the scoring
    * contract [[searchRank]] and [[searchRankBatch]] share (one
    * implementation, so the retrieval paths and their oracles cannot
    * desynchronize).
    */
  private def termFreqs(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(lower(col("text"))).as("tk"))
      .filter(arrays_overlap(col("tk"), array(terms.map(lit): _*)))
      .select(col("doc_id"), explode(col("tk")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

  def searchRank(spark: SparkSession, dir: String): DataFrame = {
    val tf = termFreqs(spark, dir, SearchTerms)
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "w")
      .groupBy("doc_id")
      .agg(sum(expr("tf * (1000000 div df)")).as("score"),
        count(lit(1)).as("terms_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(15)
  }

  /** The query log for [[searchRankBatch]]: (query_id, term) rows — a
    * literal here, a small broadcast table in production.
    */
  val SearchBatch: Seq[(Long, String)] = Seq(
    1L -> "dup", 1L -> "spark",
    2L -> "window", 2L -> "stream", 2L -> "batch",
    3L -> "vector", 3L -> "dup", 3L -> "filter")

  /** Results kept per query in [[searchRankBatch]]. */
  val SearchBatchK = 5

  /** Batch retrieval — the WHOLE query log scored in ONE corpus scan,
    * the text analog of `simsearch_knn_batch`: the (query_id, term)
    * log broadcasts like a model artifact, per-(doc, term) tf rows join
    * it to score every query at once, and the bounded
    * [[graft.functions.TopKAgg]] keeps ≤ k docs per query per
    * partition across the shuffle — per-query result cost is
    * O(queries × k × partitions), never a per-query corpus sort. The
    * idf weight is the same integer-exact 10⁶ div df as
    * [[searchRank]]; the score doubles stay integer-valued (sums of
    * long products), so the compare is exact.
    */
  def searchRankBatch(spark: SparkSession, dir: String): DataFrame =
    scoreBatch(spark, termFreqs(spark, dir, SearchBatch.map(_._2).distinct))

  /** The whole-log scoring stage over a (doc_id, w, tf) relation — ONE
    * implementation shared by the scan-time path ([[searchRankBatch]])
    * and the persisted-index path ([[searchRankIndexed]]), so the two
    * registered twins (and their common oracle) cannot desynchronize.
    */
  private def scoreBatch(spark: SparkSession, tf: DataFrame): DataFrame = {
    import spark.implicits._
    val queriesDf = SearchBatch.toDF("query_id", "w")
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val topk = graft.functions.TopKAgg.asUdaf(SearchBatchK)
    // The raw score goes straight in: TopKAgg's internal order is
    // already (score desc, key asc) — exactly the oracle's
    // row_number ORDER BY score DESC, doc_id.
    val agg = tf.join(broadcast(df), "w")
      .join(broadcast(queriesDf), "w")
      .groupBy("query_id", "doc_id")
      .agg(sum(expr("tf * (1000000 div df)")).as("score"))
      .groupBy("query_id")
      .agg(topk(col("score").cast("double"), col("doc_id")).as("top"))
    graft.functions.TopKAgg.exploded(agg, "top", Seq("query_id"))
      .select(col("query_id"), col("rank"), col("key").as("doc_id"),
        col("score").cast("long").as("score"))
      .orderBy("query_id", "rank")
  }

  /** Full-vocabulary inverted index: one (w, doc_id, tf) row per
    * distinct (token, document) pair — the relation a 100 TB deployment
    * writes ONCE, bucketed by term, and serves every query from.
    * Exposed for [[searchRankIndexed]] and its spec.
    */
  def invertedIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(lower(col("text")))).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))

  /** Batch retrieval against a PERSISTED inverted index — the
    * [[DedupOps.minhashIncremental]] move applied to text search, and
    * the production completion of [[searchRankBatch]], which re-derives
    * tf from the corpus on every run: here the full-vocabulary
    * (w, doc_id, tf) index is written once as a compact parquet
    * artifact (term + id + count — never text), and query time touches
    * ONLY the probed terms' posting lists — at scale the index is
    * bucketed by term, so a query log reads its own postings and
    * nothing else, and a daily crawl appends its batch's rows without
    * re-tokenizing history. Term df falls out of the index itself
    * (posting-list length), so scoring needs no second corpus pass.
    * Scoring is [[scoreBatch]], shared with the scan-time twin — the
    * two queries return identical rows and share one oracle, which is
    * what pins index-build + probe ≡ direct computation as an exact
    * equivalence, not a rows-only claim.
    */
  def searchRankIndexed(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("invindex")
    invertedIndex(Tables.documents(spark, dir))
      .write.mode("overwrite").parquet(out)
    val terms = SearchBatch.map(_._2).distinct
    scoreBatch(spark, spark.read.parquet(out).filter(col("w").isin(terms: _*)))
  }

  /** Incremental inverted-index maintenance — the daily-crawl append:
    * HISTORY'S postings persist once (the train split standing in for
    * the historical corpus, as everywhere in the `_incr` family), the
    * incoming batch tokenizes ONLY ITSELF and appends its own
    * (w, doc_id, tf) rows, and query time scores the merged index.
    * Postings are per-(doc, term) rows, so history ∪ batch is EXACTLY
    * the full-corpus index — no merge arithmetic at all, just an
    * append — and this query shares the scan-time twins' oracle:
    * index-append + probe ≡ direct computation, gated as an exact
    * value match (the `text_search_index` contract extended to
    * incremental builds). History is never re-tokenized; batch cost
    * tracks the batch.
    */
  def searchRankIncremental(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("invindex_incr")
    val d = SampleOps.withSplit(Tables.documents(spark, dir))
    invertedIndex(d.filter(col("split") === "train"))
      .write.mode("overwrite").parquet(out)
    invertedIndex(d.filter(col("split") =!= "train"))
      .write.mode("append").parquet(out)
    val terms = SearchBatch.map(_._2).distinct
    scoreBatch(spark, spark.read.parquet(out).filter(col("w").isin(terms: _*)))
  }

  /** Phrase probed by [[searchPhrase]] (adjacent-token exact match). */
  val PhraseTerms: Seq[String] = Seq("merge", "data")

  /** Result head size for [[searchPhrase]]. */
  val PhraseTopK = 20

  /** Positional phrase search — the retrieval capability term-frequency
    * scoring cannot express: documents ranked by how often the EXACT
    * token sequence [[PhraseTerms]] occurs (overlapping occurrences
    * count, so "data data data" holds "data data" twice). Spark-first
    * shape: phrase matching is per-document LOCAL, so instead of a
    * positional posting-list self-join (position arrays shuffled once
    * per phrase term) the whole match runs INSIDE expressions on one
    * corpus scan — per phrase term j, compare the token array's
    * j-shifted slice against the term, AND the L boolean arrays
    * positionally with `zip_with` (each child array evaluates once and
    * streams — the [[graft.queries.DedupOps.shinglesOfTokens]]
    * contract), and fold the match vector to a count with `aggregate`.
    * No per-position array is ever allocated: the previous
    * `slice(tk, i, L) = phrase` form materialized an L-array and ran an
    * array equality at EVERY position. Zero shuffles before the
    * TakeOrderedAndProject head, fully inside whole-stage codegen. An
    * `arrays_overlap`-style prefilter (every phrase term present via
    * `forall`) prunes non-candidates before any positional work. At
    * 100 TB this is one embarrassingly parallel scan; the
    * persisted-index variant (probe [[invertedIndex]] postings first,
    * then slice-scan only surviving docs) drops in front without
    * changing the match expression.
    */
  def searchPhrase(spark: SparkSession, dir: String): DataFrame = {
    val L = PhraseTerms.length
    val phrase = array(PhraseTerms.map(lit): _*)
    def hits(tk: Column): Column = {
      // n-L+1 candidate start positions (empty below L tokens — the
      // greatest() guard makes every slice empty, no branch needed).
      val n = greatest(size(tk) - (L - 1), lit(0))
      val termMatches = PhraseTerms.zipWithIndex.map { case (t, j) =>
        transform(slice(tk, lit(j + 1), n), x => x === lit(t))
      }
      val matchVec = termMatches.reduce((a, b) => zip_with(a, b, (x, y) => x && y))
      aggregate(matchVec, lit(0L), (acc, m) => acc + when(m, 1L).otherwise(0L))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(lower(col("text"))).as("tk"))
      .filter(forall(phrase, t => array_contains(col("tk"), t)))
      .select(col("doc_id"), hits(col("tk")).as("hits"))
      .filter(col("hits") > 0)
      .orderBy(desc("hits"), asc("doc_id"))
      .limit(PhraseTopK)
  }

  /** [[hashingTf]] geometry: feature dimensions and the report's
    * document slice.
    */
  val HashDims = 16
  val HashDocs = 20

  /** Feature hashing (the "hashing trick" — MLlib's HashingTF with the
    * signed-collision refinement): each token maps to a FIXED-width
    * feature dimension by hash, with a second hash choosing ±1 so
    * colliding tokens cancel in expectation instead of piling up — the
    * featurization that makes bag-of-words models trainable at any
    * vocabulary, because the feature space never grows. Surfaced in the
    * tall (doc, dim, weight) form a sparse trainer consumes; the
    * doc_id slice keeps the report bounded while weights reflect each
    * document fully.
    *
    * Scale shape: scan-local hashing, one wordcount-class shuffle on
    * (doc, dim) — and the dim universe is [[HashDims]], so downstream
    * joins/aggregations on features are constant-width forever.
    * Deterministic salted hashes ⇒ exact value oracle (the count-min
    * argument applied to featurization).
    */
  def hashingTf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < HashDocs)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull)
      .select(col("doc_id"),
        pmod(graft.queries.DedupOps.portable64(concat(lit("ht:"), col("w"))),
          lit(HashDims.toLong)).as("dim"),
        when(pmod(graft.queries.DedupOps.portable64(concat(lit("hs:"), col("w"))),
          lit(2L)) === 0L, 1L).otherwise(-1L).as("sgn"))
      .groupBy("doc_id", "dim")
      .agg(sum(col("sgn")).as("weight"))
      .orderBy("doc_id", "dim")

  /** [[windowCooccurrence]] knobs: context-window radius, support
    * floor, report size.
    */
  val CoocWindow = 2
  val CoocMin = 10
  val CoocTopK = 20

  /** Skip-gram co-occurrence extraction — the word2vec/GloVe
    * preprocessing pass: count unordered word pairs appearing within
    * [[CoocWindow]] positions of each other. Pair emission is
    * scan-local (one d-shifted `zip_with` per offset over the bound
    * token array — no positional self-join), pairs canonicalize by
    * lexical (least, greatest), and the only shuffle is the
    * wordcount-class pair count. The [[CoocMin]] support floor plus the
    * top-k head bound the report; at scale the full matrix sinks to a
    * (pair → count) artifact instead, same plan minus the head.
    */
  def windowCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    def pairsAt(toks: Column, d: Int): Column = {
      val n = greatest(size(toks) - d, lit(0))
      zip_with(slice(toks, lit(1), n), slice(toks, lit(1 + d), n),
        (x, y) => struct(least(x, y).as("a"), greatest(x, y).as("b")))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(explode_outer(concat(
        (1 to CoocWindow).map(d => pairsAt(col("toks"), d)): _*)).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= CoocMin)
      .orderBy(desc("cnt"), asc("a"), asc("b"))
      .limit(CoocTopK)
  }

  /** [[collocations]] knobs: minimum pair support and report size. */
  val ColMinPair = 5
  val ColTopK = 20

  /** Collocation mining — adjacent word pairs ranked by the Dice
    * association coefficient (2·c(ab) / (c(a)+c(b)), surfaced as exact
    * integer ppm): the phrase-extraction pass that separates "machine
    * learning"-style multiword units from pairs that co-occur only
    * because both words are common. Dice is chosen over PMI
    * deliberately — PMI's log hands the compare to each engine's libm
    * (`text_tfidf`'s argument), while Dice is a pure integer ratio with
    * the same ranking power for adjacent-pair mining. The
    * [[ColMinPair]] support floor kills the noise pairs PMI-family
    * scores notoriously inflate.
    *
    * Scale shape: bigram and unigram counts are wordcount-class
    * shuffles; the two count-attach joins shuffle on the token key
    * (deliberately NOT broadcast — the vocabulary grows with the
    * corpus, the `text_rarity` argument); TakeOrderedAndProject head.
    */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val pairs = toks
      .select(explode_outer(symbolPairsOf(col("toks"))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= ColMinPair)
    val uni = toks
      .select(explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("c"))
    pairs
      .join(uni.select(col("w").as("l"), col("c").as("ca")), Seq("l"))
      .join(uni.select(col("w").as("r"), col("c").as("cb")), Seq("r"))
      .select(col("l"), col("r"), col("cab"), col("ca"), col("cb"),
        expr("(cab * 2000000) div (ca + cb)").as("dice_ppm"))
      .orderBy(desc("dice_ppm"), desc("cab"), asc("l"), asc("r"))
      .limit(ColTopK)
  }

  /** Result head for [[keyphrases]]. */
  val KeyTopK = 15

  /** RAKE-style keyphrase extraction (Rose et al. 2010) — the
    * unsupervised multiword-keyword pass next to [[collocations]]'
    * pair mining and [[tfidf]]'s unigram ranking: candidate phrases
    * are the maximal stopword-free token runs ([[GateStopwords]] as
    * the delimiter set), each word scores degree/freq (degree = summed
    * length of the phrases containing it, freq = its occurrences in
    * phrases — words that live in LONG phrases beat merely-common
    * words), and a phrase scores the sum of its words' scores. All
    * arithmetic is exact integer ppm with truncating division, so the
    * ranking carries a full value oracle (the log-free discipline of
    * the Dice choice).
    *
    * Scale shape: phrase segmentation is ONE scan-local `aggregate`
    * fold per document — the run-splitting state machine rides the
    * token array inside whole-stage codegen, no per-doc window
    * shuffle (the `dedup_cdc` chunking discipline). Everything after
    * is wordcount-class: word freq/degree counts, phrase-type counts,
    * a vocabulary-keyed count-attach join (NOT broadcast — vocabulary
    * grows with the corpus), and a TakeOrderedAndProject head.
    */
  /** The scan-local run-splitting state machine of [[keyphrases]]: fold
    * a token array into the array of its maximal stopword-free runs,
    * each joined with spaces. An open run closes on a stopword or at
    * the end of the array; leading/trailing/repeated stopwords emit
    * nothing (no empty phrases).
    */
  private[queries] def phraseFold(tokenArrayExpr: String): Column = {
    val stopList = GateStopwords.map(w => s"'$w'").mkString(", ")
    expr(
      s"""aggregate($tokenArrayExpr,
         |  named_struct('cur', cast(array() as array<string>),
         |               'out', cast(array() as array<string>)),
         |  (s, t) -> if(t in ($stopList),
         |    named_struct('cur', cast(array() as array<string>),
         |      'out', if(size(s.cur) > 0,
         |        concat(s.out, array(array_join(s.cur, ' '))), s.out)),
         |    named_struct('cur', concat(s.cur, array(t)), 'out', s.out)),
         |  s -> if(size(s.cur) > 0,
         |    concat(s.out, array(array_join(s.cur, ' '))), s.out))""".stripMargin)
  }

  def keyphrases(spark: SparkSession, dir: String): DataFrame =
    keyphrasesOf(Tables.documents(spark, dir))

  /** [[keyphrases]] over an arbitrary documents frame (tests pin
    * hand-computed degree/freq scores).
    */
  def keyphrasesOf(docs: DataFrame): DataFrame = {
    val phrases = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(explode(phraseFold("tk")).as("phrase"))
      .withColumn("len", size(split(col("phrase"), " ")))
    val wstat = phrases
      .select(explode(split(col("phrase"), " ")).as("w"), col("len"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("len").as("degree"))
    phrases.groupBy("phrase").agg(count(lit(1)).as("n"))
      .select(col("phrase"), col("n"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wstat, "w")
      .groupBy("phrase", "n")
      .agg(sum(expr("(degree * 1000000) div freq")).as("score_ppm"))
      .orderBy(desc("score_ppm"), desc("n"), asc("phrase"))
      .limit(KeyTopK)
      .select("phrase", "n", "score_ppm")
  }

  /** Count-min geometry for [[countMin]]: d hash rows × w counters.
    * Error bound: est − true ≤ e·N/w with probability 1 − e^−d over the
    * hash draw; here the "draw" is the fixed salted portable64 family,
    * so the whole sketch is DETERMINISTIC — which is what buys it an
    * exact cross-engine value oracle, unlike the randomized-compaction
    * KLL/HLL sketches that can only be rows-only checked.
    */
  val CmRows = 4
  val CmWidth = 256

  /** Words probed by [[countMin]]. */
  val CmTopQ = 20

  /** Count-min sketch frequency estimation — the bounded-memory
    * frequency table for a vocabulary too large to count exactly: the
    * sketch is d×w counters (a constant-size artifact at ANY vocabulary
    * — the point at 100 TB where the exact wordcount's key space is the
    * corpus vocabulary), each token increments one counter per row
    * (salted hash), and a word's estimate is the MIN over its d
    * counters — an over-estimate by construction, never an
    * under-estimate. The query reports the [[CmTopQ]] heaviest words'
    * exact counts next to their sketch estimates with the non-negative
    * overcount, making the bound auditable row by row.
    *
    * Scale shape: the build is one scan + a d×w-group aggregation
    * (256·4 groups — the exchange carries counter-level volume); the
    * constant-size sketch broadcasts to the probe join. The exact
    * wordcount here exists to AUDIT the sketch on the harness corpus;
    * production ships only the sketch.
    */
  def countMin(spark: SparkSession, dir: String): DataFrame = {
    def cells(w: Column): Column = array((0 until CmRows).map { j =>
      struct(lit(j.toLong).as("j"),
        pmod(graft.queries.DedupOps.portable64(concat(lit(s"cm$j:"), w)),
          lit(CmWidth.toLong)).as("idx"))
    }: _*)
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull)
    val sketch = tok
      .select(explode(cells(col("w"))).as("e"))
      .groupBy(col("e.j").as("j"), col("e.idx").as("idx"))
      .agg(count(lit(1)).as("c"))
    val q = tok.groupBy("w").agg(count(lit(1)).as("exact"))
      .orderBy(desc("exact"), asc("w"))
      .limit(CmTopQ)
    q.select(col("w"), col("exact"), explode(cells(col("w"))).as("p"))
      .select(col("w"), col("exact"), col("p.j").as("j"), col("p.idx").as("idx"))
      .join(broadcast(sketch), Seq("j", "idx"))
      .groupBy("w", "exact")
      .agg(min(col("c")).as("est"))
      .select(col("w"), col("exact"), col("est"),
        (col("est") - col("exact")).as("overcount"))
      .orderBy(desc("exact"), asc("w"))
  }

  /** Merge rounds learned by [[bpeTrain]]. */
  val BpeMerges = 6

  /** Characters of a word. Both engines' empty-separator splits emit
    * character lists; the filter drops any empty artifacts so the two
    * stay identical on every input.
    */
  private def charsOf(w: Column): Column = filter(split(w, ""), ch => ch =!= "")

  /** Adjacent symbol pairs of a BOUND sequence attribute (the shared
    * HOF perf contract — two slice refs, streamed once).
    */
  private def symbolPairsOf(s: Column): Column = {
    val n = greatest(size(s) - 1, lit(0))
    zip_with(slice(s, lit(1), n), slice(s, lit(2), n),
      (a, b) => struct(a.as("l"), b.as("r")))
  }

  /** Greedy left-to-right application of one merge (l, r) to a symbol
    * sequence: fold the sequence into a fresh array, fusing the current
    * symbol into the accumulator's tail when the tail/current pair
    * matches — so `a a a` under merge (a, a) becomes `[aa, a]`, exactly
    * the textbook BPE application order. try_element_at keeps the
    * empty-accumulator probe NULL (≠ l) under ANSI semantics.
    */
  private def mergeFold(s: Column, l: String, r: String): Column =
    aggregate(s, expr("CAST(array() AS ARRAY<STRING>)"),
      (acc, x) =>
        when(size(acc) > 0 && try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Distributed BPE tokenizer training — learn the [[BpeMerges]]
    * highest-count byte-pair merges from the corpus, the vocabulary-
    * construction step every LLM pipeline runs before tokenizing.
    * The classic two-level shape keeps it tractable: the CORPUS is
    * scanned once into a (word, count) vocabulary (the wordcount
    * shuffle), and every merge round runs over the VOCABULARY relation
    * only — pair counts weighted by word frequency, argmax selection
    * (count desc, then lexical — fully deterministic), greedy
    * re-segmentation via [[mergeFold]]. Output is the ordered merge
    * table (rank, lhs, rhs, pair_count) — the artifact a tokenizer
    * ships.
    *
    * Scale shape: corpus-sized work is the one wordcount; each round is
    * an aggregation over vocab rows (millions, not corpus-sized) whose
    * pair-count shuffle carries symbol-pair keys; the per-round driver
    * traffic is ONE row (the argmax — the convergence-probe posture of
    * `pagerankLoop`), and seqs localCheckpoint per round so lineage
    * stays flat. Adjacent-pair counts include overlaps (the textbook
    * counting); ties cannot diverge across engines because the
    * tie-break is total.
    */
  private def bpeLoop(spark: SparkSession, dir: String)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    import spark.implicits._
    val vocab = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("c"))
    var seqs = vocab
      .select(col("w"), col("c"), charsOf(col("w")).as("s"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= BpeMerges && !exhausted) {
      val top = seqs
        .select(col("c"), explode_outer(symbolPairsOf(col("s"))).as("p"))
        .filter(col("p").isNotNull)
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = top.head
        merges += ((round.toLong, l, r, cnt))
        seqs = seqs.withColumn("s", mergeFold(col("s"), l, r)).localCheckpoint()
        round += 1
      }
    }
    (merges.result(), seqs)
  }

  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeLoop(spark, dir)._1.toDF("rank", "lhs", "rhs", "pair_count")
      .orderBy("rank")
  }

  /** BPE encoding report — the trained merge table ([[bpeTrain]]'s
    * loop) applied BACK to the corpus: per language, the corpus token
    * count, raw character volume, post-merge symbol volume, and the
    * compression the learned vocabulary buys (symbols·10⁶ div chars).
    * This is the measurement a tokenizer team runs before shipping a
    * vocab — fertility/compression per language — and it exercises the
    * learned artifact end-to-end rather than just emitting it.
    *
    * Scale shape: encoding happens on the VOCABULARY (each distinct
    * word segmented once, reused for all its occurrences via the
    * (lang, word) count join — the same two-level move as training);
    * the join shuffles on the word key (wordcount class) and the report
    * is one constant-size aggregation.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (_, seqs) = bpeLoop(spark, dir)
    val lv = Tables.documents(spark, dir)
      .select(col("lang"), tokens(col("text")).as("toks"))
      .select(col("lang"), explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("lang", "w").agg(count(lit(1)).as("cl"))
    lv.join(seqs.select(col("w"), size(col("s")).cast("long").as("symlen"),
        length(col("w")).cast("long").as("wlen")), "w")
      .groupBy("lang")
      .agg(sum(col("cl")).as("tokens"),
        sum(col("cl") * col("wlen")).as("chars"),
        sum(col("cl") * col("symlen")).as("symbols"))
      .select(col("lang"), col("tokens"), col("chars"), col("symbols"),
        expr("(symbols * 1000000) div chars").as("compression_ppm"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_train" -> (bpeTrain _),
    "text_bpe_encode" -> (bpeEncode _),
    "text_countmin" -> (countMin _),
    "text_collocations" -> (collocations _),
    "text_keyphrase" -> (keyphrases _),
    "text_boilerplate_strip" -> (boilerplateStrip _),
    "text_window_cooc" -> (windowCooccurrence _),
    "text_hashing_tf" -> (hashingTf _),
    "corpus_filter" -> (corpusFilter _),
    "text_search_rank" -> (searchRank _),
    "text_search_phrase" -> (searchPhrase _),
    "text_search_batch" -> (searchRankBatch _),
    "text_search_index" -> (searchRankIndexed _),
    "text_search_incr" -> (searchRankIncremental _),
    "text_chunks" -> (trainingChunks _),
    "text_pack" -> (packChunks _),
    "text_diversity" -> (diversity _),
    "text_wordcount" -> (wordCount _),
    "text_quality" -> (quality _),
    "text_langid" -> (langMarkers _),
    "text_langid_predict" -> (langidPredict _),
    "text_tokens" -> (tokenCounts _),
    "text_fingerprint" -> (fingerprint _),
    "text_redact" -> (redact _),
    "text_repetition" -> (repetition _),
    "text_heavyhitters" -> (heavyHitters _),
    "text_heavyhitters_incr" -> (heavyHittersIncr _),
    "text_rarity" -> (rarity _),
    "text_boilerplate" -> (boilerplate _),
    "text_ngram_lm" -> (ngramLm _),
    "text_urlnorm" -> (urlNorm _),
    "text_tfidf" -> (tfidf _),
    "text_lm_score" -> (lmScore _),
  )

  private val duckTermsList: String =
    SearchTerms.map(t => s"'$t'").mkString("[", ", ", "]")

  private val duckBatchTermsIn: String =
    SearchBatch.map(_._2).distinct.map(t => s"'$t'").mkString(", ")

  private val duckBatchTermsList: String =
    SearchBatch.map(_._2).distinct.map(t => s"'$t'").mkString("[", ", ", "]")

  private val duckBatchValues: String =
    SearchBatch.map { case (q, w) => s"($q, '$w')" }.mkString(", ")

  /** Shared by `text_search_batch` and `text_search_index`: the two
    * registered paths compute the same relation (scan-time tf vs
    * persisted-index probe), so one oracle pins both — and pins their
    * equivalence.
    */
  private val duckSearchBatchSql: String =
    s"""WITH ql(query_id, w) AS (VALUES $duckBatchValues),
       |tk AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, unnest(tk) AS w FROM tk
       |  WHERE list_has_any(tk, $duckBatchTermsList)),
       |tf AS (
       |  SELECT doc_id, w, count(*) AS tf FROM m
       |  WHERE w IN ($duckBatchTermsIn)
       |  GROUP BY doc_id, w),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |sc AS (
       |  SELECT ql.query_id, tf.doc_id,
       |    CAST(sum(tf.tf * (1000000 // df.df)) AS BIGINT) AS score
       |  FROM tf JOIN df USING (w) JOIN ql USING (w)
       |  GROUP BY ql.query_id, tf.doc_id),
       |r AS (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM sc)
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       |  doc_id, score
       |FROM r WHERE rank <= $SearchBatchK ORDER BY query_id, rank""".stripMargin

  /** DuckDB twin of [[bpeTrain]], generated as [[BpeMerges]] unrolled
    * rounds (the pagerank-oracle technique applied to the merge loop):
    * each round's CTEs restate the pair count, the total-order argmax,
    * and the greedy list fold ([[mergeFold]]'s exact semantics — the
    * accumulator-tail fusion — as a list_reduce over single-element
    * lists with a list accumulator).
    */
  private val duckBpeCtes: String = {
    val rounds = (0 until BpeMerges).map { i =>
      s"""p$i AS (
         |  SELECT x.l AS l, x.r AS r, CAST(sum(c) AS BIGINT) AS cnt FROM (
         |    SELECT c, unnest(list_transform(range(1, len(s)),
         |      j -> {'l': s[j], 'r': s[j+1]})) AS x
         |    FROM seqs$i) GROUP BY x.l, x.r),
         |t$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |seqs${i + 1} AS MATERIALIZED (
         |  -- LEFT JOIN ON TRUE, not a cross join: a round with no pairs
         |  -- left (t$i empty) must KEEP the segmentation, mirroring the
         |  -- Spark loop's early stop, not collapse seqs to zero rows.
         |  SELECT w, c, CASE WHEN t.l IS NULL THEN s ELSE list_reduce(
         |    list_prepend(CAST([] AS VARCHAR[]), list_transform(s, ch -> [ch])),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.l AND x[1] = t.r
         |      THEN list_append(acc[1:len(acc)-1], t.l || t.r)
         |      ELSE list_concat(acc, x) END) END AS s
         |  FROM seqs$i LEFT JOIN t$i t ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""vocab AS MATERIALIZED (
       |  SELECT w, count(*) AS c FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |    FROM documents) GROUP BY w),
       |seqs0 AS MATERIALIZED (
       |  SELECT w, c, list_filter(string_split(w, ''), ch -> ch <> '') AS s
       |  FROM vocab),
       |$rounds""".stripMargin
  }

  private val duckBpeSql: String = {
    val union = (0 until BpeMerges)
      .map(i => s"  SELECT ${i + 1} AS rank, l AS lhs, r AS rhs, cnt AS pair_count FROM t$i")
      .mkString("\n  UNION ALL\n")
    s"""WITH $duckBpeCtes
       |SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, pair_count FROM (
       |$union) u ORDER BY rank""".stripMargin
  }

  /** DuckDB twin of [[bpeEncode]]: the SAME unrolled training CTEs,
    * final segmentation joined back to per-(lang, word) counts.
    */
  private val duckBpeEncodeSql: String =
    s"""WITH $duckBpeCtes,
       |lv AS (
       |  SELECT lang, w, count(*) AS cl FROM (
       |    SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |    FROM documents) GROUP BY lang, w)
       |SELECT lang,
       |  CAST(sum(cl) AS BIGINT) AS tokens,
       |  CAST(sum(cl * len(w)) AS BIGINT) AS chars,
       |  CAST(sum(cl * len(s)) AS BIGINT) AS symbols,
       |  (CAST(sum(cl * len(s)) AS BIGINT) * 1000000)
       |    // CAST(sum(cl * len(w)) AS BIGINT) AS compression_ppm
       |FROM lv JOIN seqs$BpeMerges USING (w)
       |GROUP BY lang ORDER BY lang""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_bpe_train" -> duckBpeSql,
    "text_bpe_encode" -> duckBpeEncodeSql,
    // Deterministic salted dimension + sign hashes ⇒ exact values.
    "text_hashing_tf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
         |  FROM documents WHERE doc_id < $HashDocs)
         |SELECT doc_id,
         |  ${graft.queries.DedupOps.duckPortable64("concat('ht:', w)")} % $HashDims AS dim,
         |  CAST(sum(CASE WHEN ${graft.queries.DedupOps.duckPortable64("concat('hs:', w)")} % 2 = 0
         |           THEN 1 ELSE -1 END) AS BIGINT) AS weight
         |FROM tok GROUP BY doc_id, dim ORDER BY doc_id, dim""".stripMargin,
    // One generated list_transform per offset; least/greatest on
    // VARCHAR is plain lexicographic on both engines.
    "text_window_cooc" -> {
      val offs = (1 to CoocWindow).map { d =>
        s"list_transform(range(1, greatest(len(tk) - $d, 0) + 1), " +
          s"i -> {'a': least(tk[i], tk[i+$d]), 'b': greatest(tk[i], tk[i+$d])})"
      }.mkString("list_concat(", ", ", ")")
      s"""WITH toks AS (
         |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS tk
         |  FROM documents),
         |pr AS (SELECT unnest($offs) AS p FROM toks)
         |SELECT p.a AS a, p.b AS b, count(*) AS cnt FROM pr
         |GROUP BY p.a, p.b HAVING count(*) >= $CoocMin
         |ORDER BY cnt DESC, a, b LIMIT $CoocTopK""".stripMargin
    },
    // Pure integer Dice ratio — no log, no doubles; the bigram list
    // mirrors symbolPairsOf's two-slice zip.
    "text_collocations" ->
      s"""WITH toks AS (
         |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(tk)),
         |    i -> {'l': tk[i], 'r': tk[i+1]})) AS p
         |  FROM toks),
         |pc AS (
         |  SELECT p.l AS l, p.r AS r, count(*) AS cab FROM bg
         |  GROUP BY p.l, p.r HAVING count(*) >= $ColMinPair),
         |uc AS (
         |  SELECT w, count(*) AS c FROM (SELECT unnest(tk) AS w FROM toks) u
         |  GROUP BY w)
         |SELECT pc.l, pc.r, cab, ca.c AS ca, cb.c AS cb,
         |  (cab * 2000000) // (ca.c + cb.c) AS dice_ppm
         |FROM pc JOIN uc ca ON pc.l = ca.w JOIN uc cb ON pc.r = cb.w
         |ORDER BY dice_ppm DESC, cab DESC, l, r LIMIT $ColTopK""".stripMargin,
    // The oracle segments runs by gaps-and-islands (pos − row_number)
    // where the Spark side uses the scan-local fold — two independent
    // formulations of the same maximal-run semantics; integer ppm
    // scoring with truncating division on both engines.
    "text_keyphrase" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, unnest(range(1, len(tk)+1)) AS pos, tk FROM toks),
         |w AS (
         |  SELECT doc_id, pos, tk[pos] AS w FROM p
         |  WHERE tk[pos] NOT IN (${GateStopwords.map(w => s"'$w'").mkString(", ")})),
         |g AS (
         |  SELECT doc_id, pos, w,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM w),
         |ph AS (
         |  SELECT doc_id, grp, string_agg(w, ' ' ORDER BY pos) AS phrase,
         |    count(*) AS len
         |  FROM g GROUP BY doc_id, grp),
         |wstat AS (
         |  SELECT w, count(*) AS freq, sum(len) AS degree
         |  FROM (SELECT unnest(string_split(phrase, ' ')) AS w, len FROM ph)
         |  GROUP BY w),
         |ty AS (SELECT phrase, count(*) AS n FROM ph GROUP BY phrase),
         |tyw AS (SELECT phrase, n, unnest(string_split(phrase, ' ')) AS w FROM ty)
         |SELECT t.phrase, CAST(t.n AS BIGINT) AS n,
         |  CAST(sum((s.degree * 1000000) // s.freq) AS BIGINT) AS score_ppm
         |FROM tyw t JOIN wstat s ON t.w = s.w
         |GROUP BY t.phrase, t.n
         |ORDER BY score_ppm DESC, n DESC, phrase LIMIT $KeyTopK""".stripMargin,
    // The sketch is deterministic (fixed salted portable64 family), so
    // the whole build+probe carries an exact value oracle; the range
    // table stands in for the d hash rows.
    "text_countmin" ->
      s"""WITH tok AS (
         |  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
         |  FROM documents),
         |cell AS (
         |  SELECT r.range AS j,
         |    ${graft.queries.DedupOps.duckPortable64(
               "concat('cm', CAST(r.range AS VARCHAR), ':', w)")} % $CmWidth AS idx,
         |    w
         |  FROM tok, range(0, $CmRows) r),
         |sketch AS (
         |  SELECT j, idx, count(*) AS c FROM cell GROUP BY j, idx),
         |q AS (
         |  SELECT w, count(*) AS exact FROM tok GROUP BY w
         |  ORDER BY exact DESC, w LIMIT $CmTopQ),
         |probe AS (
         |  SELECT q.w, q.exact, r.range AS j,
         |    ${graft.queries.DedupOps.duckPortable64(
               "concat('cm', CAST(r.range AS VARCHAR), ':', q.w)")} % $CmWidth AS idx
         |  FROM q, range(0, $CmRows) r)
         |SELECT probe.w, probe.exact, min(sketch.c) AS est,
         |  min(sketch.c) - probe.exact AS overcount
         |FROM probe JOIN sketch USING (j, idx)
         |GROUP BY probe.w, probe.exact
         |ORDER BY exact DESC, w""".stripMargin,
    "text_search_rank" ->
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, unnest(tk) AS w FROM tk
         |  WHERE list_has_any(tk, $duckTermsList)),
         |tf AS (
         |  SELECT doc_id, w, count(*) AS tf FROM m
         |  WHERE w IN (${SearchTerms.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY doc_id, w),
         |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w)
         |SELECT tf.doc_id, CAST(sum(tf.tf * (1000000 // df.df)) AS BIGINT) AS score,
         |  count(*) AS terms_hit
         |FROM tf JOIN df USING (w)
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    // Same positional-match expression replayed on DuckDB lists:
    // tk[i : i+L-1] is 1-based inclusive on both ends = Spark's
    // slice(tk, i, L); range(1, n-L+2) = Spark's sequence(1, n-L+1).
    // Both CASE arms cast to BIGINT so no engine-side widening leaks.
    "text_search_phrase" ->
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tk) >= ${PhraseTerms.length} THEN
         |      CAST(len(list_filter(range(1, len(tk) - ${PhraseTerms.length} + 2),
         |        i -> tk[i : i + ${PhraseTerms.length} - 1] =
         |          ${PhraseTerms.map(t => s"'$t'").mkString("[", ", ", "]")})) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS hits
         |  FROM tk)
         |SELECT doc_id, hits FROM h WHERE hits > 0
         |ORDER BY hits DESC, doc_id LIMIT $PhraseTopK""".stripMargin,
    // Same window/overlap constants; DuckDB list slices are 1-based
    // inclusive on both ends, matching Spark's slice(arr, start, len).
    "text_chunks" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
         |  FROM documents WHERE doc_id < 100),
         |sized AS (
         |  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
         |  FROM toks WHERE len(tk) > 0),
         |counted AS (
         |  SELECT doc_id, tk, n,
         |    greatest(1, CAST(ceil((n - $ChunkOverlap) / ${ChunkSize - ChunkOverlap}.0) AS BIGINT)) AS nc
         |  FROM sized),
         |x AS (
         |  SELECT doc_id, tk, n, unnest(range(nc)) AS chunk_idx FROM counted)
         |SELECT doc_id, chunk_idx,
         |  chunk_idx * ${ChunkSize - ChunkOverlap} AS tok_start,
         |  least($ChunkSize, n - chunk_idx * ${ChunkSize - ChunkOverlap}) AS tok_len,
         |  array_to_string(tk[chunk_idx * ${ChunkSize - ChunkOverlap} + 1 :
         |    chunk_idx * ${ChunkSize - ChunkOverlap} + least($ChunkSize, n - chunk_idx * ${ChunkSize - ChunkOverlap})], ' ')
         |    AS chunk_text
         |FROM x ORDER BY doc_id, chunk_idx""".stripMargin,
    // Same capacity constant; the window cumsum re-derives the global
    // token spans (DuckDB promotes the cumsum to HUGEINT — every
    // arithmetic consumer is CAST back to BIGINT before output).
    "text_pack" ->
      s"""WITH t AS MATERIALIZED (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS tok_cnt
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, tok_cnt,
         |    CAST(sum(tok_cnt) OVER (ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM t WHERE tok_cnt > 0),
         |s AS (SELECT doc_id, tok_cnt, cum - tok_cnt AS strt, cum FROM c),
         |e AS (
         |  SELECT doc_id, tok_cnt, strt, cum,
         |    unnest(range(strt // $PackCapacity, ((cum - 1) // $PackCapacity) + 1)) AS chunk_id
         |  FROM s)
         |SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN strt >= chunk_id * $PackCapacity
         |                 AND cum <= (chunk_id + 1) * $PackCapacity
         |            THEN 1 ELSE 0 END) AS BIGINT) AS n_whole_docs,
         |  CAST(sum(least(cum, (chunk_id + 1) * $PackCapacity) -
         |           greatest(strt, chunk_id * $PackCapacity)) AS BIGINT) AS tok_fill,
         |  CAST(min(doc_id) AS BIGINT) AS first_doc
         |FROM e GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,
    "text_search_batch" -> duckSearchBatchSql,
    // The persisted-index twin scores the same log with the same idf
    // weight from the same tf relation (built via the index instead of
    // at scan time), so its oracle IS the scan-time oracle — the
    // equivalence the twin exists to pin as an exact value match.
    "text_search_index" -> duckSearchBatchSql,
    // Postings are per-(doc, term) rows, so history-append + probe must
    // equal the direct computation exactly — same oracle a third time.
    "text_search_incr" -> duckSearchBatchSql,
    // h = h*31 + byte with 64-bit wraparound, replayed as a HUGEINT fold
    // with mod 2^64 per step, then mapped back to the signed long Spark
    // emits. Valid because the corpus is ASCII (ord == UTF-8 byte).
    "text_fingerprint" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN m >= 9223372036854775808 THEN m - 18446744073709551616
        |       ELSE m END AS BIGINT) AS fp
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN strlen(text) = 0 THEN CAST(0 AS HUGEINT)
        |    ELSE list_reduce(
        |      list_transform(range(1, strlen(text) + 1),
        |                     i -> CAST(ord(substr(text, i, 1)) AS HUGEINT)),
        |      (a, b) -> (a * 31 + b) % 18446744073709551616) END AS m
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "corpus_filter" ->
      s"""SELECT lang, count(*) AS kept,
         |  CAST(sum(tok_cnt) AS BIGINT) AS kept_tokens
         |FROM (
         |  SELECT lang, n_chars,
         |    $duckGateCounts
         |  FROM documents) t
         |WHERE $duckGateKeep
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // sum() in DuckDB widens to HUGEINT; cast back to the BIGINTs Spark
    // emits. `//` (floor) == Spark's `div` (truncate) on this
    // all-positive domain.
    "text_diversity" ->
      """SELECT doc_id, n AS tok_cnt,
        |  CAST((1000000 * ((n * (n - 1)) - coll)) // (n * (n - 1)) AS BIGINT) AS diversity_ppm
        |FROM (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(c * (c - 1)) AS BIGINT) AS coll
        |  FROM (
        |    SELECT doc_id, t, count(*) AS c FROM (
        |      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        |      FROM documents)
        |    WHERE t <> '' GROUP BY doc_id, t)
        |  GROUP BY doc_id)
        |WHERE n >= 2 ORDER BY doc_id""".stripMargin,
    "text_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(toks) AS BIGINT) AS tok_cnt,
        |  CAST(len(stop) AS BIGINT) AS stop_cnt,
        |  CAST(floor(n_chars * 1000000.0 / len(toks)) AS BIGINT) AS chars_per_tok_ppm,
        |  CAST(floor(len(stop) * 1000000.0 / len(toks)) AS BIGINT) AS stop_ppm
        |FROM (
        |  SELECT doc_id, n_chars,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks,
        |    list_filter(string_split(text, ' '),
        |                t -> t IN ('the', 'a', 'of', 'and')) AS stop
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    // Integer DIV on both sides (Spark DIV ≡ DuckDB // on positives), so
    // the score never touches a double; top-k and tie-break mirror the
    // window exactly.
    "text_tfidf" ->
      s"""WITH tk AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        |                                    x -> x <> '')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tk GROUP BY doc_id, t),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |s AS (
        |  SELECT tf.doc_id, tf.t, tf.tf, df.df,
        |    (tf.tf * 1000000) // df.df AS score
        |  FROM tf JOIN df USING (t)
        |  WHERE tf.doc_id < 20),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, t) AS rank
        |  FROM s)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, t AS token, tf, df, score
        |FROM r WHERE rank <= $TfidfTopK ORDER BY doc_id, rank""".stripMargin,
    // The lm CTEs restate text_ngram_lm's model (same floor/threshold);
    // integer // keeps the per-doc mean exact on both engines.
    "text_lm_score" ->
      s"""WITH t AS (
        |  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |bgp AS (
        |  SELECT unnest(list_transform(range(1, len(tk)),
        |    i -> {'a': tk[i], 'b': tk[i+1]})) AS p
        |  FROM t),
        |bg AS (SELECT p.a AS a, p.b AS b, count(*) AS c FROM bgp GROUP BY 1, 2),
        |uni AS (SELECT a, CAST(sum(c) AS BIGINT) AS tot FROM bg GROUP BY a),
        |lm AS (
        |  SELECT bg.a AS a, bg.b AS b,
        |    CAST(floor(bg.c * 1000000.0 / uni.tot) AS BIGINT) AS p_ppm
        |  FROM bg JOIN uni USING (a)
        |  WHERE bg.c >= $LmMinCount),
        |d AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id < 100),
        |db AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
        |    i -> {'a': tk[i], 'b': tk[i+1]})) AS p
        |  FROM d),
        |j AS (
        |  SELECT db.doc_id, lm.p_ppm
        |  FROM db LEFT JOIN lm ON db.p.a = lm.a AND db.p.b = lm.b)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  count(p_ppm) AS in_model,
        |  CAST(sum(coalesce(p_ppm, 0)) // count(*) AS BIGINT) AS score
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The MG summary only bounds memory; the reported counts come from
    // the exact verify pass, so a plain GROUP BY/HAVING is the twin.
    "text_heavyhitters" ->
      """WITH wf AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |  WHERE w <> ''),
        |c AS (SELECT w, count(*) AS cnt FROM wf GROUP BY w),
        |t AS (SELECT count(*) AS total FROM wf)
        |SELECT w, cnt FROM c, t
        |WHERE cnt * 1000 >= total * 1
        |ORDER BY w""".stripMargin,
    // Incremental twin: both per-split prunes and the merge prune
    // unrolled from the same MgIncrK — each cut is the (k+1)-th
    // largest count of its stage (0 when <= k survive), a multiset
    // property no tie order can perturb, so the merged summary
    // hash-matches the Spark side exactly.
    "text_heavyhitters_incr" -> {
      val k = MgIncrK
      def pruneCtes(src: String, out: String): String =
        s"""${out}_cut AS (
           |  SELECT CASE WHEN count(*) = ${k + 1} THEN min(c) ELSE 0 END AS cut
           |  FROM (SELECT c FROM $src ORDER BY c DESC LIMIT ${k + 1})),
           |$out AS MATERIALIZED (
           |  SELECT w, c - cut AS c FROM $src, ${out}_cut WHERE c > cut)""".stripMargin
      s"""WITH wf AS MATERIALIZED (
         |  SELECT ${SampleOps.duckSplitCase(SampleOps.duckBucket("doc_id"))} AS split, w
         |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         |        FROM documents)
         |  WHERE w <> ''),
         |hc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM wf
         |       WHERE split = 'train' GROUP BY w),
         |${pruneCtes("hc", "hs")},
         |bc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM wf
         |       WHERE split <> 'train' GROUP BY w),
         |${pruneCtes("bc", "bs")},
         |u AS (SELECT w, CAST(sum(c) AS BIGINT) AS c FROM (
         |        SELECT * FROM hs UNION ALL SELECT * FROM bs) z GROUP BY w),
         |${pruneCtes("u", "us")}
         |SELECT w, CAST(c AS BIGINT) AS est_cnt FROM us
         |ORDER BY est_cnt DESC, w""".stripMargin
    },
    // Same planted PII, same ASCII-only patterns; DuckDB needs the 'g'
    // flag to match Spark's replace-all regexp_replace.
    "text_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(planted, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+')) AS BIGINT) AS email_cnt,
        |  CAST(len(regexp_extract_all(planted, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS phone_cnt,
        |  CAST(strlen(planted) AS BIGINT) AS raw_len,
        |  CAST(strlen(regexp_replace(
        |         regexp_replace(planted, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
        |         '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS BIGINT) AS red_len
        |FROM (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |         || '@example.com or +1-555-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS planted
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS tok_cnt,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS uniq_cnt
        |  FROM t),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)),
        |                          i -> toks[i] || ' ' || toks[i + 1])) AS bg
        |  FROM t),
        |c AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |m AS (SELECT doc_id, max(cnt) AS top_cnt FROM c GROUP BY 1)
        |SELECT s.doc_id AS doc_id, tok_cnt, uniq_cnt,
        |  CAST(floor((tok_cnt - uniq_cnt) * 1000000.0 / greatest(tok_cnt, 1)) AS BIGINT) AS dup_tok_ppm,
        |  CAST(coalesce(top_cnt, 0) AS BIGINT) AS top_bigram_cnt,
        |  CAST(floor(coalesce(top_cnt, 0) * 1000000.0 / greatest(tok_cnt - 1, 1)) AS BIGINT) AS top_bigram_ppm
        |FROM s LEFT JOIN m ON s.doc_id = m.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    // Same planted URL, same four strips + lower; regexp_replace needs
    // the 'g' flag in DuckDB to match Spark's replace-all (one strip
    // site each here, but 'g' keeps the twins literally parallel).
    "text_urlnorm" ->
      """WITH u AS (
        |  SELECT 'https://Src' || CAST(doc_id % 20 AS VARCHAR)
        |      || '.Example.com/p/' || CAST(doc_id % 50 AS VARCHAR)
        |      || CASE WHEN doc_id % 2 = 0
        |           THEN '?utm_source=s' || CAST(doc_id AS VARCHAR) || '&x=1'
        |           ELSE '?x=1&utm_source=s' || CAST(doc_id AS VARCHAR) END
        |      || '#sec' || CAST(doc_id AS VARCHAR) AS raw
        |  FROM documents),
        |c AS (
        |  SELECT raw,
        |    lower(regexp_extract(raw, '^https://([^/]+)/', 1)) AS host,
        |    lower(regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
        |          '#.*$', '', 'g'),
        |          '&utm_[^&#]*', '', 'g'),
        |          '\?utm_[^&#]*&', '?', 'g'),
        |          '\?utm_[^&#]*$', '', 'g')) AS canon
        |  FROM u)
        |SELECT host, count(DISTINCT raw) AS raw_urls,
        |  count(DISTINCT canon) AS canon_urls
        |FROM c GROUP BY host ORDER BY host""".stripMargin,
    // Prefix totals come from the bigram table itself on both sides, so
    // the conditional probabilities share one denominator definition.
    "text_ngram_lm" ->
      s"""WITH t AS (
        |  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |bgp AS (
        |  SELECT unnest(list_transform(range(1, len(tk)),
        |    i -> {'a': tk[i], 'b': tk[i+1]})) AS p
        |  FROM t),
        |bg AS (SELECT p.a AS a, p.b AS b, count(*) AS c FROM bgp GROUP BY 1, 2),
        |uni AS (SELECT a, CAST(sum(c) AS BIGINT) AS tot FROM bg GROUP BY a)
        |SELECT bg.a AS a, bg.b AS b, bg.c AS c,
        |  CAST(floor(bg.c * 1000000.0 / uni.tot) AS BIGINT) AS p_ppm
        |FROM bg JOIN uni USING (a)
        |WHERE bg.c >= $LmMinCount
        |ORDER BY a, b""".stripMargin,
    // Chunk width generated from ChunkTokens; DuckDB list slices are
    // 1-based inclusive, Spark's slice() is 1-based length-counted —
    // both spell the same 8 tokens.
    "text_boilerplate" ->
      s"""WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(tk) // $ChunkTokens + 1),
        |    i -> array_to_string(tk[(i-1)*$ChunkTokens + 1 : i*$ChunkTokens], ' '))) AS chunk
        |  FROM t),
        |n AS (SELECT doc_id, CAST(len(tk) // $ChunkTokens AS BIGINT) AS n_chunks FROM t),
        |shared AS (
        |  SELECT chunk FROM (SELECT DISTINCT doc_id, chunk FROM ch)
        |  GROUP BY chunk HAVING count(*) >= 2),
        |b AS (SELECT doc_id, count(*) AS boiler FROM ch JOIN shared USING (chunk)
        |      GROUP BY doc_id)
        |SELECT n.doc_id AS doc_id, n.n_chunks AS n_chunks,
        |  CAST(coalesce(b.boiler, 0) AS BIGINT) AS boiler_chunks,
        |  CAST(floor(coalesce(b.boiler, 0) * 1000000.0
        |       / greatest(n.n_chunks, 1)) AS BIGINT) AS boiler_ppm
        |FROM n LEFT JOIN b ON n.doc_id = b.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    // The strip twin reconstructs the cleaned text itself: indexed
    // chunks, df>=2 template removal, ordered rejoin plus the always-
    // kept tail — byte-for-byte in the compared output.
    "text_boilerplate_strip" ->
      s"""WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |  FROM documents),
        |base AS (SELECT doc_id, tk, len(tk) // $ChunkTokens AS n FROM t),
        |ix AS (SELECT doc_id, unnest(range(1, n + 1)) AS i FROM base),
        |ch AS (
        |  SELECT ix.doc_id, i,
        |    array_to_string(tk[(i-1)*$ChunkTokens + 1 : i*$ChunkTokens], ' ') AS chunk
        |  FROM ix JOIN base ON ix.doc_id = base.doc_id),
        |shared AS (
        |  SELECT chunk FROM (SELECT DISTINCT doc_id, chunk FROM ch)
        |  GROUP BY chunk HAVING count(*) >= 2),
        |kept AS (
        |  SELECT doc_id, i, chunk FROM ch
        |  WHERE chunk NOT IN (SELECT chunk FROM shared)),
        |ka AS (
        |  SELECT doc_id, count(*) AS kept_chunks,
        |    list(chunk ORDER BY i) AS segs
        |  FROM kept GROUP BY doc_id),
        |tails AS (
        |  SELECT doc_id, CAST(n AS BIGINT) AS n_chunks,
        |    array_to_string(tk[n*$ChunkTokens + 1 : len(tk)], ' ') AS tail
        |  FROM base)
        |SELECT tails.doc_id AS doc_id, n_chunks,
        |  CAST(coalesce(ka.kept_chunks, 0) AS BIGINT) AS kept_chunks,
        |  CAST(n_chunks - coalesce(ka.kept_chunks, 0) AS BIGINT) AS dropped_chunks,
        |  -- DuckDB's array_to_string of an EMPTY list is NULL; Spark's
        |  -- array_join is '' — normalize.
        |  coalesce(array_to_string(list_filter(
        |    list_concat(coalesce(ka.segs, []), [tail]), s -> s <> ''), ' '), '') AS cleaned
        |FROM tails LEFT JOIN ka ON tails.doc_id = ka.doc_id
        |ORDER BY tails.doc_id""".stripMargin,
    // RareMaxDf generated from the same constant the Spark side uses.
    "text_rarity" ->
      s"""WITH tf AS (
        |  SELECT doc_id, t, count(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        |    FROM documents)
        |  WHERE t <> '' GROUP BY doc_id, t),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS tok_cnt
        |  FROM documents),
        |rare AS (
        |  SELECT t FROM (SELECT t, count(*) AS df FROM tf GROUP BY t)
        |  WHERE df <= $RareMaxDf),
        |rc AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS rare_cnt
        |  FROM tf JOIN rare USING (t) GROUP BY doc_id)
        |SELECT s.doc_id AS doc_id, s.tok_cnt AS tok_cnt,
        |  coalesce(rc.rare_cnt, 0) AS rare_cnt,
        |  CAST(floor(coalesce(rc.rare_cnt, 0) * 1000000.0
        |       / greatest(s.tok_cnt, 1)) AS BIGINT) AS rare_ppm
        |FROM stats s LEFT JOIN rc ON s.doc_id = rc.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "text_langid" ->
      """SELECT lang, count(*) AS docs,
        |  CAST(sum(CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END) AS BIGINT) AS en_marker
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // Membership CASEs, the greatest() and the ordered argmax all
    // generated from LangProfiles; token-less documents survive via the
    // LEFT JOIN (Spark's explode_outer keeps them, unnest would not).
    "text_langid_predict" -> {
      val sums = LangProfiles.map { case (l, ws) =>
        s"sum(CASE WHEN w IN (${ws.map(w => s"'$w'").mkString(", ")}) " +
          s"THEN 1 ELSE 0 END) AS s_$l"
      }.mkString(",\n    ")
      val coal = LangProfiles.map { case (l, _) =>
        s"coalesce(s_$l, 0) AS s_$l"
      }.mkString(", ")
      val m = LangProfiles.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      val argmax = LangProfiles.map { case (l, _) =>
        s"WHEN s_$l = $m AND $m > 0 THEN '$l'"
      }.mkString(" ")
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
         |  FROM documents),
         |sc0 AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM tok GROUP BY doc_id),
         |sc AS (SELECT d.doc_id, $coal
         |       FROM documents d LEFT JOIN sc0 USING (doc_id)),
         |pred AS (
         |  SELECT doc_id, $m AS hits,
         |    CASE $argmax ELSE 'und' END AS predicted_lang
         |  FROM sc)
         |SELECT predicted_lang, CAST(count(*) AS BIGINT) AS docs,
         |  CAST(sum(hits) AS BIGINT) AS marker_hits
         |FROM pred GROUP BY predicted_lang ORDER BY predicted_lang""".stripMargin
    },
  )
}
