"""Plan guardrails: assert the physical plans keep the properties the
100 TB design depends on (pushdown, pruning, broadcast, no stray
cartesian). These are regression tests for `.explain()` work — a change
that silently drops a pushed filter or flips a broadcast to SMJ fails
here, not in production."""

import re

from accelerator_spark import queries as Q


def _plan(spark, name, sf_dir):
    return Q.QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    s = _plan(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in s
    m = re.search(r"FileScan parquet \[([^\]]*)\]", s)
    read_cols = {c.split("#")[0] for c in m.group(1).split(",")}
    # projection pruning: only the 6 needed columns reach the scan
    assert read_cols == {"l_quantity", "l_extendedprice", "l_discount",
                         "l_returnflag", "l_linestatus", "l_shipdate"}


def test_q5_broadcasts_all_dims(spark, sf_dir):
    s = _plan(spark, "q5_nation_revenue", sf_dir)
    assert s.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in s
    assert "CartesianProduct" not in s


def test_q6_no_shuffle_scan_agg(spark, sf_dir):
    s = _plan(spark, "q6_forecast_revenue", sf_dir)
    # single-stage partial+final agg: exactly one exchange (to the 1-row
    # final agg), no joins
    assert "Join" not in s
    assert s.count("Exchange") == 1
    # the scan carries the predicates (plan text truncates PushedFilters
    # for long filter lists; DataFilters shows the same pushdown)
    assert "DataFilters: [isnotnull(l_shipdate" in s


def test_top100_uses_take_ordered(spark, sf_dir):
    s = _plan(spark, "top100_orders", sf_dir)
    assert "TakeOrderedAndProject" in s  # no global sort materialization


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    s = _plan(spark, "cosine_topk", sf_dir)
    assert "BroadcastNestedLoopJoin" in s or "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s


def test_jaccard_no_cartesian_and_parallel_explode(spark, sf_dir):
    s = _plan(spark, "ngram_jaccard_pairs", sf_dir)
    assert "CartesianProduct" not in s
    assert "Generate explode" in s or "Generate" in s
    # set sizes ride through the explode inside the pair structs, and the
    # document-frequency prefilter is a window count in the same shuffle
    # that groups the docs — the plan is entirely join-free
    assert s.count("Join") == 0
    assert "Window" in s


def test_asof_single_shuffle(spark, sf_dir):
    s = _plan(spark, "asof_click_purchase", sf_dir)
    assert "Join" not in s  # union+window, never a join
    assert "Window" in s


def test_q7_broadcast_dims_single_fact_shuffle(spark, sf_dir):
    s = _plan(spark, "q7_volume_shipping", sf_dir)
    # customer/supplier/nation×2 all broadcast; lineitem⨝orders is the
    # only join allowed to shuffle
    assert s.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in s
    # shipdate range reaches the lineitem scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in s


def test_q9_all_dims_broadcast(spark, sf_dir):
    s = _plan(spark, "q9_product_profit", sf_dir)
    assert s.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in s
    # p_type filter prunes the broadcast build side at its own scan
    assert "EqualTo(p_type,ECONOMY)" in s


def test_q15_max_subquery_stays_distributed(spark, sf_dir):
    s = _plan(spark, "q15_top_supplier", sf_dir)
    # the max-revenue scalar joins back via broadcast, never a collect
    assert s.count("BroadcastHashJoin") >= 1 or "BroadcastNestedLoopJoin" in s
    assert "CartesianProduct" not in s


def test_q19_part_predicates_prune_build_side(spark, sf_dir):
    s = _plan(spark, "q19_disjunctive_revenue", sf_dir)
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    # the disjunction references both sides so it can't push into either
    # scan wholesale — but quantity bounds derivable for the fact scan
    # and brand/size Or-filters for the part scan should both appear
    assert "Or(" in s


def test_sequence_packing_single_exchange(spark, sf_dir):
    s = _plan(spark, "sequence_packing", sf_dir)
    # the per-sequence groupBy keys start with the window's bucket, so
    # it reuses the pack's hashpartitioning — one exchange total
    assert s.count("Exchange hashpartitioning") == 1
    assert "Window" in s


def test_repetition_signals_shuffle_free(spark, sf_dir):
    s = _plan(spark, "repetition_signals", sf_dir)
    # per-doc measurement never leaves the row: sorted-array fold, no
    # explode/groupBy — the plan has no shuffle at all
    assert s.count("Exchange hashpartitioning") == 0
    assert "Generate explode" not in s


def test_funnel_single_shuffle_no_joins(spark, sf_dir):
    s = _plan(spark, "funnel_conversion", sf_dir)
    # the stage-ordering dependency is folded inside the row — the plan
    # is one exchange on user_id, no stage-wise join-backs
    assert s.count("Exchange hashpartitioning") == 1
    assert s.count("Join") == 0


def test_pii_redaction_map_stage_only(spark, sf_dir):
    # regex inject+count+redact all evaluate in the scan stage; the only
    # exchange feeds the tiny per-source agg
    s = _plan(spark, "pii_redaction_report", sf_dir)
    assert "Join" not in s
    assert s.count("Exchange") <= 2  # partial->final agg (+AQE shuffle read)


def test_line_cleaning_map_stage_only(spark, sf_dir):
    s = _plan(spark, "line_cleaning_report", sf_dir)
    assert "Join" not in s
    assert s.count("Exchange") <= 2


def test_range_join_broadcasts_band_table(spark, sf_dir):
    s = _plan(spark, "range_join_value_buckets", sf_dir)
    # non-equi join against the bounded band table must be broadcast —
    # never a cartesian product, never a shuffled nested loop
    assert "BroadcastNestedLoopJoin" in s
    assert "CartesianProduct" not in s
    assert "ShuffleExchange" not in s.split("BroadcastNestedLoopJoin")[0]


def test_latest_event_single_window_shuffle(spark, sf_dir):
    s = _plan(spark, "latest_event_per_user", sf_dir)
    # one hash exchange on user_id for the window; no joins
    assert "Join" not in s
    assert s.count("Exchange hashpartitioning") == 1


def test_unigram_logprob_vocab_broadcast_or_token_partitioned(spark, sf_dir):
    s = _plan(spark, "unigram_logprob_quality", sf_dir)
    # the 1-row corpus total must be broadcast, never collected
    assert "BroadcastExchange" in s
    assert "CartesianProduct" not in s


def test_no_cartesian_in_any_query_plan(spark, sf_dir):
    """Global guardrail: NO query in the graded inventory may compile to
    a CartesianProduct — the one join strategy that cannot survive any
    scale-up. Plan-only (nothing executes), so the whole 90+-query sweep
    stays cheap."""
    for name, fn in Q.QUERIES.items():
        # streaming queries start a real stream drain on construction
        if name in ("streaming_hourly_counts", "streaming_session_counts"):
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


def test_window_suite_single_exchange(spark, sf_dir):
    """lag/lead/row_number share one window spec — the plan must hash-
    exchange on o_custkey exactly once (percent_rank adds a second sort
    within the same exchange, never a second shuffle)."""
    s = _plan(spark, "window_suite_orders", sf_dir)
    assert s.count("Exchange hashpartitioning(o_custkey") == 1


def test_fuzzy_pairs_blocked_equi_join(spark, sf_dir):
    """The levenshtein compare must ride an equi-join on the block key —
    never a nested-loop over the full cross product."""
    s = _plan(spark, "fuzzy_part_name_pairs", sf_dir)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


# ---------------------------------------------------------------- round-2b

def test_wide_denormalize_no_cartesian_broadcast_dims(spark, sf_dir):
    s = _plan(spark, "wide_denormalize_checksum", sf_dir)
    assert "CartesianProduct" not in s
    # all 6 dim joins are hash joins; at test scale every dim broadcasts
    assert s.count("BroadcastHashJoin") >= 5


def test_winsorize_broadcasts_cut_points(spark, sf_dir):
    s = _plan(spark, "winsorized_event_values", sf_dir)
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s


def test_bitmap_distinct_partial_aggregation(spark, sf_dir):
    s = _plan(spark, "bitmap_distinct_users", sf_dir)
    # map-side partial bitmap construction before the shuffle
    assert "partial_bitmap_construct_agg" in s or "partial" in s.lower()
    assert "bitmap_or_agg" in s


def test_row_numbering_no_single_partition_global_window(spark, sf_dir):
    s = _plan(spark, "scalable_row_numbering", sf_dir)
    # the whole point: windows are partitioned by bucket, never a
    # SinglePartition exchange feeding a Window
    import re as _re
    assert not _re.search(r"Exchange SinglePartition[^\n]*\n[^\n]*Window", s)
    assert "Window" in s


def test_mad_outliers_broadcast_and_map_flag(spark, sf_dir):
    s = _plan(spark, "mad_outlier_events", sf_dir)
    assert "SortMergeJoin" not in s
    assert s.count("BroadcastHashJoin") >= 2  # med and mad cut points


def test_ntile_quartiles_no_global_window(spark, sf_dir):
    """VERDICT r2 #5: the old ntile(4) no-partition window was a
    one-task sort. The closed-form rewrite must keep ntile out of the
    plan entirely and every row_number window partitioned (by _bkt)."""
    s = _plan(spark, "ntile_price_quartiles", sf_dir)
    assert "ntile(" not in s
    for line in s.splitlines():
        if "row_number() windowspecdefinition(" in line:
            first_arg = line.split("windowspecdefinition(")[1].split(",")[0]
            assert "ASC" not in first_arg and "DESC" not in first_arg, (
                "unpartitioned row_number window: " + line.strip()[:160])


def test_auc_report_no_global_row_window(spark, sf_dir):
    """VERDICT r2 #4: AUC ranks come from per-score aggregates; the only
    row-level window must be partitioned by score. No-partition sum
    windows are allowed only over the tiny distinct-score aggregate."""
    from accelerator_spark import queries2 as Q2
    s = (Q2.QUERIES2["classifier_auc_report"](spark, sf_dir)
         ._jdf.queryExecution().executedPlan().toString())
    assert "ntile(" not in s
    for line in s.splitlines():
        if "row_number() windowspecdefinition(" in line:
            first_arg = line.split("windowspecdefinition(")[1].split(",")[0]
            assert "ASC" not in first_arg and "DESC" not in first_arg, (
                "unpartitioned row_number window: " + line.strip()[:160])


def test_rfm_no_global_ntile(spark, sf_dir):
    """Full-plan audit r3: the per-customer frame grows with the data;
    its quintiles must come from exact_ntile, never a no-partition
    ntile window."""
    from accelerator_spark import queries2 as Q2
    s = (Q2.QUERIES2["rfm_segmentation"](spark, sf_dir)
         ._jdf.queryExecution().executedPlan().toString())
    assert "ntile(" not in s
    for line in s.splitlines():
        if "row_number() windowspecdefinition(" in line:
            first_arg = line.split("windowspecdefinition(")[1].split(",")[0]
            assert "ASC" not in first_arg and "DESC" not in first_arg, (
                "unpartitioned row_number window: " + line.strip()[:160])


def test_bench_lists_are_registry_members():
    """Review r5: nothing guarded bench.py's hand-maintained HEADLINE/
    EXTENDED lists against registry renames — a stale name used to
    crash the whole benchmark (now recorded as an error, but it should
    never get that far)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from accelerator_spark import queries as Q

    stale = [n for n in bench.HEADLINE + bench.EXTENDED
             if n not in Q.QUERIES]
    assert stale == []
    dups = [n for n in set(bench.HEADLINE) & set(bench.EXTENDED)]
    assert dups == []


def test_entry_graded_subset_is_representative_and_valid():
    """The driver grades queries()[:50]; that prefix must stay exactly
    the curated cross-section and every name must resolve (a rename in
    queries.py would otherwise KeyError at driver time)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    qs = e.queries()
    names = list(qs)
    assert names[:50] == e._GRADED_FIRST
    assert len(names) == len(set(names)) == len(e.oracle_sql())
    # ann_recall_report replaced cosine_topk in the graded 50 (r8): it
    # computes the same brute-force cosine top-k as its recall baseline;
    # r9 swapped the crawl front in (warc_pipeline_report +
    # html_extract_report) for chunk_documents / exact_substring_report;
    # r9b swapped webdataset_report + bpe_tokenize_report in for
    # corpus_line_dedup_report / token_counts (shapes stay graded via
    # url_dedup_report / sequence_packing)
    # r11 swapped near_dedup_report + near_dedup_incremental_report in
    # for dedup_components / cross_doc_duplication (the CC + survivor
    # machinery stays graded via near_dedup_report; the gram
    # inverted-index shape via decontaminate_train_set)
    cats = {"q1_pricing_summary", "ann_recall_report",
            "streaming_hourly_counts", "warc_pipeline_report",
            "html_extract_report", "sequence_packing",
            "hll_distinct_rollup", "dataset_type_menu2",
            "webdataset_report", "bpe_tokenize_report",
            "video_near_dup_pairs", "webdataset_export_roundtrip",
            "near_dedup_keep_longest_report",
            "near_dedup_incremental_report",
            "text_near_dedup_incremental_report"}
    assert cats <= set(names[:50])


# ---------------------------------------------------------------- round-9b

def test_markdown_and_bpe_gates_map_only(spark, sf_dir):
    """HTML→Markdown and BPE tokenization are per-document transforms:
    their plans must stay map-only (no join, no keyed shuffle). r12:
    the one allowed exchange is the explicit fixture-stage round-robin
    spread of the single-row-group doc scan (the
    mbox_extract_report pattern below) — the operator itself still
    introduces no exchange."""
    for name in ("html_markdown_report", "bpe_tokenize_report",
                 "rtf_extract_report", "image_dhash_report"):
        s = _plan(spark, name, sf_dir)
        assert s.count("Exchange") <= 1, name
        assert ("Exchange" not in s
                or "Exchange RoundRobinPartitioning" in s), name
        assert "Join" not in s, name
        if "Exchange" in s:
            # ADVICE r12: the allowed exchange must sit DIRECTLY above
            # the scan (the fixture-stage spread) — a repartition
            # accidentally introduced inside the operator would have
            # Python/agg/generate stages BELOW it and pass the mere
            # count check. The plans are linear chains, so the text
            # after the exchange line is exactly its subtree.
            below = s[s.index("Exchange RoundRobinPartitioning"):]
            assert "Scan" in below, name
            assert not re.search(
                r"EvalPython|InPandas|MapInArrow|Aggregate|Window"
                r"|Generate", below), name


def test_mbox_gate_fixture_repartition_only(spark, sf_dir):
    """The MIME decode itself is map-only; the gate's single exchange
    is the explicit fixture-stage repartition (sf0.1's documents table
    is one file -> one task; a real mail archive directory is already
    file-granular)."""
    s = _plan(spark, "mbox_extract_report", sf_dir)
    assert s.count("Exchange") == 1
    assert "Join" not in s


def test_webdataset_grouping_bounded_shuffles(spark, sf_dir):
    """Sample folding: the fixture repartition plus the per-ext and
    per-sample folds are the only shuffles; no join anywhere."""
    s = _plan(spark, "webdataset_report", sf_dir)
    assert s.count("Exchange") <= 3
    assert "Join" not in s


def test_corpus_inventory_single_agg_exchange(spark, sf_dir):
    s = _plan(spark, "corpus_inventory_report", sf_dir)
    # partial+final agg, plus (r12) the fixture-stage round-robin
    # spread of the single-row-group doc scan. Exact count per branch
    # (ADVICE r12: <= 2 would also pass an accidental extra exchange):
    # the spread fires iff the 1-file scan is under-parallel.
    spread = 1 if spark.sparkContext.defaultParallelism > 1 else 0
    assert s.count("Exchange") == 1 + spread
    assert "Join" not in s


def test_bloom_probe_is_join_free(spark, sf_dir):
    """The Bloom membership test must compile to pure expressions over
    the scan — no join, no shuffle. (The gate adds a broadcast
    semi-join only to LABEL true members for the report.)"""
    from accelerator_spark.operators.sketches import (
        BloomFilter, bloom_prefilter)
    from accelerator_spark.queries import _t

    bf = BloomFilter((1 << 64) - 1, 256, 3, 10)
    probe = bloom_prefilter(_t(spark, sf_dir, "orders"), bf, "o_custkey")
    s = probe._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in s
    assert "Join" not in s
    # and the gate itself: broadcast for labeling, never SMJ
    g = _plan(spark, "bloom_prefilter_report", sf_dir)
    assert "BroadcastHashJoin" in g
    assert "SortMergeJoin" not in g


def test_logreg_scoring_map_only(spark, sf_dir):
    """Scoring with a trained model is one JVM expression over the
    scan — the corpus-filter hot path must not shuffle."""
    from accelerator_spark.operators.analytics import logreg_score
    from accelerator_spark.queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    s = (logreg_score(emb, [0.1] * 64, -0.2)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in s
    assert "Join" not in s


def test_interval_join_is_equi_join(spark, sf_dir):
    """The overlap join must ride the bin equi-key — broadcast or SMJ,
    never a nested loop over the cross product."""
    s = _plan(spark, "interval_overlap_join", sf_dir)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "BroadcastHashJoin" in s or "SortMergeJoin" in s


def test_table_schema_cache_reads_identically(spark, tmp_path):
    """_read_table's schema cache is metadata-only: the second read of
    a path must carry the identical schema and rows as the inferring
    first read (a drifted cache would silently rewrite every query's
    input types), and the cache must actually be populated."""
    from pyspark.sql import functions as F

    from accelerator_spark import queries as Q

    p = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id"),
        (F.col("id") * 0.5).alias("v"),
        F.col("id").cast("string").alias("s"),
    ).write.parquet(p)
    Q._TABLE_SCHEMAS.pop(p, None)
    a = Q._read_table(spark, p)
    assert p in Q._TABLE_SCHEMAS
    b = Q._read_table(spark, p)
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
