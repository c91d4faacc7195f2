package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of registered
  * queries (`runMain graft.Explain [query ...]`; default = the heaviest
  * bench queries). Used to keep the scale audit honest: pushed filters,
  * pruned read schemas, broadcast choices and exchange counts are read
  * off the real plans, not assumed.
  */
object Explain {
  val Headline = Seq(
    "neardup_jaccard", "neardup_minhash", "neardup_pipeline",
    "neardup_embedding", "neardup_simhash", "neardup_simhash_pairs",
    "simsearch_ivf", "sample_decontam", "events_funnel",
    "join_revenue", "join_salted", "agg_corr",
    "q1_pricing", "events_asof", "search_count",
    "band_join", "band_join_auto", "topk_groups", "text_repetition",
    "q3_shipping", "agg_spearman", "simsearch_sq8", "events_sliding",
    "events_zscore", "agg_ntile", "neardup_containment", "text_rarity",
    "events_scd2", "layout_zorder", "agg_mad", "q5_local_supplier",
    "neardup_minhash_incr", "text_boilerplate", "simsearch_knn_batch",
    "text_ngram_lm", "agg_ntile_range", "agg_mad_approx", "simsearch_pq",
    "simsearch_ivfpq", "text_tfidf", "graph_pagerank", "text_search_rank",
    "neardup_edit", "meta_stats", "sample_weighted", "sample_stratified",
    "pipeline_corpus", "audit_quality", "events_scd2_lookup",
    "graph_triangles", "multimodal_phash", "agg_spearman_approx",
    "text_search_index", "simsearch_ivf_incr", "pipeline_media",
    "text_chunks", "audit_embeddings", "multimodal_phash_near",
    "text_search_phrase", "graph_bfs", "dedup_cdc", "dedup_cdc_incr",
    "sample_decontam_emb", "neardup_simhash_incr", "simsearch_pq_incr",
    "graph_pagerank_conv", "multimodal_decode", "multimodal_audio",
    "multimodal_quarantine", "neardup_embedding_incr",
    "sample_temperature", "audit_drift", "dedup_cdc_cross",
    "embed_centroids_incr", "simsearch_hybrid", "text_bpe_train",
    "text_bpe_encode", "graph_common_neighbors", "text_countmin",
    "dedup_bloom", "sample_kcenter", "events_ohlc", "text_collocations",
    "simsearch_range", "events_asof_tol", "simsearch_mmr",
    "meta_checksum", "meta_checksum_incr", "events_transitions",
    "text_search_incr", "simsearch_filtered", "text_window_cooc",
    "agg_winsorized", "text_hashing_tf", "simsearch_recall", "simsearch_cells",
    "text_langid_predict",
    "neardup_lsh_recall", "agg_pareto", "neardup_index", "src_snapshot",
    "dedup_spans", "dedup_spans_incr", "dedup_longest_span",
    "dedup_span_strip", "neardup_index_incr",
    "multimodal_gif_frames", "pipeline_retrieval", "src_snapshot_merge",
    "src_snapshot_expire", "src_snapshot_skip", "src_snapshot_skip2",
    "neardup_index_probe", "src_snapshot_optimize", "text_repetition_ngram",
    "multimodal_audio_vad", "audit_concentration", "events_trajectory",
    "src_snapshot_changes", "sql_recursive", "src_snapshot_history", "src_connector_read", "graph_sssp", "pipeline_lakehouse", "src_snapshot_mor", "src_connector_write",
    "agg_regression", "events_attribution", "src_snapshot_rollback",
    "src_snapshot_wap", "agg_ttest", "agg_chisq", "text_keyphrase",
    "text_boilerplate_strip", "src_snapshot_clone", "src_snapshot_vacuum",
    "pipeline_events", "audit_benford", "events_abtest", "dedup_weights",
    "events_locf", "simsearch_ivf_mor", "q7_volume", "q8_market_share",
    "src_connector_timetravel", "text_pack", "src_snapshot_upsert",
    "src_snapshot_evolve", "q6_forecast", "q10_returns",
    "src_snapshot_schema_evo", "src_snapshot_cdc_apply", "sample_mixture",
    "src_snapshot_segments", "dedup_canonical",
    "src_snapshot_bloomskip", "graph_kcore", "graph_lpa",
    "sample_splits_grouped", "src_catalog_sql", "src_catalog_delete",
    "src_catalog_dml", "src_provenance",
    "src_connector_decimal", "src_connector_array",
    "src_connector_struct", "src_connector_map",
    // The stream_* queries are deliberately NOT in the plan audit:
    // their registered function executes a full streaming query and
    // the DataFrame it returns is only the trivial post-hoc sink read
    // — the audit would pay the stream's wall time to print a parquet
    // scan. Their streaming plans are exercised (and their content
    // value-gated) by Verify.
    "q14_promo", "q13_custdist", "q15_top_supplier", "q18_big_orders",
    "q17_small_qty", "q19_disjunct", "q22_idle_customers")
  // join_skew_aqe is deliberately NOT audited here: the skew markers
  // are RUNTIME facts its own body require()s on every invocation (the
  // strongest form of plan assertion), and the query returns its
  // already-executed rows, so the printed plan would be a trivial
  // local relation. governance_erasure is excluded for the same
  // reason: its registered function runs the full erasure drill
  // eagerly (two partitioned writes + guard counts) and returns only
  // the post-hoc parquet read — the audit would pay the drill's wall
  // time to print a scan; its behavior is value-gated by Verify.
  // audit_leakage likewise: it localCheckpoints the verified pair
  // list eagerly, so the printed plan would be aggregates over an
  // ExistingRDD. embed_pca runs its one-pass aggregation and the
  // driver-side eigensolve eagerly and returns a constant 4-row
  // frame — nothing to audit in the printed plan. meta_observe runs
  // its observed pass through the noop sink eagerly and returns the
  // listener's one-row delivery.
  // src_connector_bloomskip and src_snapshot_bloomskip_incr likewise:
  // they execute their point lookups eagerly to read the planned-file
  // count off the EXECUTED DSv2 plan and return literal rows; the
  // pruning they prove is value-gated.
  // simsearch_ivf_trained runs its Lloyd rounds eagerly (each round's
  // tiny centroid frame localCheckpoints to keep the lineage flat),
  // so the printed plan would be the probe/score head over an
  // ExistingRDD — the per-round assignment/update plans are
  // simsearch_ivf's audited shapes, and the training loop's values
  // are oracle-gated.
  // src_catalog_proc drives the CALL statements eagerly (stored
  // procedures execute at spark.sql time) and returns a literal
  // summary frame; the procedures' effects are value-gated.
  // src_catalog_overwrite and src_connector_dpp likewise: both execute
  // their statements eagerly (the INSERT OVERWRITE + vacuum cycle; the
  // DPP join whose planned-file evidence must come from the EXECUTED
  // run) and return literal/aggregate frames; their pruning and
  // content claims are value-gated.
  // src_connector_rowgroup and src_connector_dateskip likewise (r19):
  // both execute their probes eagerly — the row-group admission audit
  // and the planned-file telemetry must come from the EXECUTED run —
  // and return literal frames; src_catalog_drop is an eager lifecycle
  // drill, and src_connector_count reads its plan shapes off three
  // executed statements. All four are value-gated.

  /** Rewrites the session-volatile tokens of a formatted plan into
    * stable, deterministic forms so two regenerations of docs/PLANS.md
    * on an unchanged tree diff empty: Catalyst expression IDs (`#76L`)
    * and `plan_id=` counters are global per-session counters whose
    * values depend on how many plans were built before this one, and
    * scratch paths carry the JVM's pid. Each is renumbered in order of
    * first appearance within ONE query's plan (so distinctness — which
    * attribute feeds which operator — is preserved; only the arbitrary
    * session offsets are erased).
    */
  private[graft] def normalize(plan: String): String = {
    def renumber(s: String, pattern: String, prefix: String): String = {
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      pattern.r.replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement(
          prefix + seen.getOrElseUpdate(m.group(1), seen.size + 1)))
    }
    val exprs = renumber(plan, "#(\\d+)", "#")
    val plans = renumber(exprs, "plan_id=(\\d+)", "plan_id=")
    // The staged-commit layer embeds the pid in partition-dir values
    // (`a=<pid>_<n>`), not just the scratch root; parquet part files
    // carry a random task UUID; Aggregator instances and lambdas print
    // identity hashes / class addresses. All session noise.
    val pid = ProcessHandle.current().pid().toString
    plans
      .replaceAll("graft_scratch_\\d+", "graft_scratch_PID")
      .replaceAll(s"=${java.util.regex.Pattern.quote(pid)}_", "=PID_")
      .replaceAll(
        "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
        "UUID")
      .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda\\$N/0xADDR")
      // Identity hashes print as `<ClassName>@<hex>` (and as
      // `0xADDR@<hex>` after the lambda mask) — anchor on a preceding
      // LETTER or `$`, which masks them even when the hash happens to
      // be all-decimal (TopKAgg@45188301 churned a regeneration), while
      // a bare `@2024` inside a plan literal — no identifier character
      // before the `@` — stays verbatim.
      .replaceAll("(?<=[A-Za-z$])@[0-9a-f]{4,16}\\b", "@IDHASH")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n===================== $name =====================")
          println(normalize(fn(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)))
        case None =>
          println(s"unknown query: $name (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
      }
    }
    spark.stop()
  }
}
