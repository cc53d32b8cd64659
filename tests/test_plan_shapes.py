"""Physical-plan shape assertions for scale-critical operators: these
pin the 100 TB-safe plans so a regression back to nested loops or
unnecessary shuffles fails CI, not a cluster."""

from __future__ import annotations

import pytest

from protarrow_spark.queries import all_queries


def _plan(spark, sf_dir: str, name: str) -> str:
    df = all_queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_embedding_neardup_is_not_all_pairs(spark, sf_dir) -> None:
    plan = _plan(spark, sf_dir, "dedup_embedding_cosine")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_banded_lsh_is_not_all_pairs(spark, sf_dir) -> None:
    plan = _plan(spark, sf_dir, "dedup_embedding_lsh_banded")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_banded_lsh_recall_matches_closed_form(spark, sf_dir) -> None:
    """Recall vs the exact all-pairs ground truth tracks the LSH
    closed form 1-(1-(1-acos(c)/pi)^w)^b — the index is behaving like
    the math says, not silently degenerate."""
    from protarrow_spark.operators.similarity import embedding_neardup_lsh_banded
    from protarrow_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings")
    got = embedding_neardup_lsh_banded(emb, threshold=0.40)
    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in __import__("protarrow_spark.operators.similarity", fromlist=["x"])
        .embedding_neardup_pairs(emb, threshold=0.40, exact=True)
        .collect()
    }
    found = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert found <= exact_pairs  # no false positives (exact verify step)
    recall = len(found) / max(1, len(exact_pairs))
    # closed form at the observed cosine range (~0.40-0.51): per-band
    # p in [0.158, 0.24] -> recall in [0.50, 0.67]; generous envelope
    assert 0.3 <= recall <= 0.9, recall


def test_conversion_roundtrip_shuffles_at_most_once(spark, sf_dir) -> None:
    # the conversion itself is shuffle-free; the only allowed Exchange
    # is the round-robin that parallelizes the single-row-group local
    # file (a no-op at real scale — see queries/conversion.py)
    plan = _plan(spark, sf_dir, "conv_roundtrip_events")
    assert plan.count("Exchange") <= 1
    assert "hashpartitioning" not in plan.lower().replace(
        "roundrobinpartitioning", ""
    )


def test_cast_conform_is_zero_shuffle(spark, sf_dir) -> None:
    plan = _plan(spark, sf_dir, "conv_cast_conform")
    assert "Exchange" not in plan


def test_q1_pushes_filter_to_scan(spark, sf_dir) -> None:
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_sort_topk_avoids_global_sort(spark, sf_dir) -> None:
    plan = _plan(spark, sf_dir, "sort_topk_lineitems")
    assert "TakeOrderedAndProject" in plan


def test_new_ops_avoid_nested_loops(spark, sf_dir) -> None:
    """None of the sketch / probing / IVF / percentile plans may
    contain an all-pairs product — candidate generation is always an
    equi-join, cogroup, or broadcast of a bounded index."""
    for name in [
        "sketch_kmv_distinct",
        "sketch_cms_heavy_hitters",
        "dedup_simhash_hamming",
        "ann_ivf_topk",
        "agg_percentile_disc",
        "dedup_ngram_jaccard",
    ]:
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        if name not in ("ann_ivf_topk", "sketch_cms_heavy_hitters"):
            # IVF broadcasts the (tiny) probed query set and CMS its
            # one-row counter array (r13); everything else must not
            # need a nested loop at all.
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_kmv_window_group_limit_pushdown(spark, sf_dir) -> None:
    """The rank<=k filter must be pushed into a WindowGroupLimit so
    only k hashes per group survive each partition pre-shuffle."""
    plan = _plan(spark, sf_dir, "sketch_kmv_distinct")
    assert "WindowGroupLimit" in plan


def test_cms_sketch_is_broadcast_readout(spark, sf_dir) -> None:
    """Sketch readout must broadcast the d*w counter state, not
    shuffle the candidate keys: r13 shape is the one-row counter-array
    broadcast probed with element_at (no per-depth-row joins left)."""
    plan = _plan(spark, sf_dir, "sketch_cms_heavy_hitters")
    assert "__cms" in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row array
    assert "BroadcastHashJoin" not in plan  # the 4 per-depth joins are gone
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-n, never a global sort


def test_bpe_tokens_single_scan_no_shuffle(spark, sf_dir) -> None:
    """Per-document token stats are a pure projection: zero exchanges."""
    plan = _plan(spark, sf_dir, "text_token_bpe")
    assert "Exchange" not in plan


def test_decontaminate_broadcasts_eval_set(spark, sf_dir) -> None:
    """The eval shingle set is benchmark-sized; the corpus side must be
    filtered by a broadcast hash join (no corpus shuffle for candidate
    generation) and never a nested loop."""
    plan = _plan(spark, sf_dir, "text_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_filter_single_exchange(spark, sf_dir) -> None:
    """Docs are hash-partitioned by id once; both gram groupBys reuse
    that partitioning, so the exploded gram stream never shuffles."""
    plan = _plan(spark, sf_dir, "text_repetition_filter")
    assert plan.count("Exchange") == 1


def test_pack_sequences_single_exchange(spark, sf_dir) -> None:
    """Packing is one shuffle on the shard key + a window cumsum."""
    plan = _plan(spark, sf_dir, "pack_sequences")
    assert plan.count("Exchange") == 1
    assert "Window" in plan


def test_json_extract_parses_in_scan_projection(spark, sf_dir) -> None:
    """from_json must sit in the pre-aggregate projection (JVM
    codegen), with only the two needed columns read from parquet."""
    plan = _plan(spark, sf_dir, "scalar_json_extract")
    assert "from_json" in plan
    assert "ReadSchema: struct<event_type:string,props:string>" in plan


def test_zorder_stats_zero_join_single_agg_shuffle(spark, sf_dir) -> None:
    """The z-key is scan-projection arithmetic; the only exchange is
    the <=64-group aggregate."""
    plan = _plan(spark, sf_dir, "layout_zorder_lineitem")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


#: Queries whose plan deliberately contains a BroadcastNestedLoopJoin:
#: the ANN paths broadcast a bounded query set against the corpus with
#: a != predicate (linear scan by design), and the two TPC-H shapes
#: broadcast a SINGLE-ROW scalar aggregate as the comparison cutoff.
BNLJ_BY_DESIGN = {
    "ann_cosine_topk",
    "ann_int8_topk",
    "q11_important_parts",
    "q22_dormant_balance",
    # single-row scalar-aggregate combines (1-row x 1-row joins)
    "sketch_kmv_set_ops",
    "window_funnel_stages",
    # one-row bloom words-array broadcast (the filter as a broadcast var)
    "join_bloom_prefilter",
    # one-row CMS counter-array broadcast (the sketch as a broadcast var)
    "sketch_cms_heavy_hitters",
    # one-row merge-rule broadcast into the greedy-fold rewrite (x3 steps)
    "text_bpe_train",
    # same 1-row rule broadcasts (training chain) + 1-row (N, T) stats row
    "text_bpe_encode",
    "text_bm25_topk",
    # 1-row corpus-total broadcast onto the unigram dimension
    "score_unigram_surprisal",
    # 1-row corpus-total + 1-row weight-total broadcasts into the
    # source-quota dimension
    "sample_token_budget_mix",
    # 1-row (lo, hi) grid-bounds broadcast into the type dimension
    "window_gapfill_resample",
    "window_ewma_decay",
    # three 1-row count frames combined for the report row
    "dedup_lsh_recall_report",
    "dedup_lsh_recall_sampled",
    # 1-row n_orders broadcast into the rule scoring
    "mine_association_rules",
    # k-row (k=2) negatives-per-anchor fan-out broadcast
    "pairgen_contrastive_negatives",
    # 1-row weight-total broadcast into the source dimension
    "sample_temperature_mix",
    # 1-row child-row-count broadcast per FK edge (x7 edges)
    "dq_referential_integrity",
    # 1-row high-water-mark broadcast onto the per-type maxima
    "dq_freshness_lag",
    # 1-row grand-total broadcast onto the 9-row digit frame
    "dq_benford",
    # bounded query-set broadcast against the corpus (the brute-force
    # truth side of the recall audit, same shape as ann_cosine_topk)
    "ann_ivf_recall_report",
    # 1-row corpus-stats broadcast into the BM25 side of the fusion
    "retrieval_hybrid_rrf",
    # 1-row midpoint broadcast + 1-row grand-total broadcast onto the
    # per-type frame
    "dq_drift_splithalf",
    # 1-row slice-total broadcast onto the ECDF prefix frame
    "dq_ks_drift",
    # 1-row percentile-stats frame combined with the 1-row view count
    "agg_time_to_convert",
    # 1-row convergence/count metadata broadcast onto the core nodes
    "graph_kcore",
    # bounded query-set broadcast against the corpus (both rankings of
    # the quantization audit, same shape as ann_cosine_topk/ann_int8)
    "ann_quantization_error_report",
    # bounded query-slice broadcast against the corpus (margin mining,
    # same shape as ann_cosine_topk)
    "pairgen_bitext_margin",
    # bounded query-set broadcast against the corpus (the brute-force
    # truth side of the PQ recall audit, same shape as ann_ivf_recall)
    "ann_pq_recall_report",
    # 8-row checkpoint-grid broadcast onto the vocab/doc dimensions
    "report_heaps_law",
    # 1-row corpus-doc-count broadcast onto the vocabulary dimension
    "text_keyword_tfidf",
    # two 1-row model-total broadcasts (t_tgt, t_raw) onto the
    # <=4096-row hashed-bucket bits dimension (same shape as
    # score_unigram_surprisal, applied to both DSIR models)
    "sample_dsir_importance",
    # bounded eval-query broadcast against the corpus (the retrieval
    # stage is cosine_topk_bruteforce, same shape as ann_cosine_topk)
    "retrieval_eval_ndcg",
    # 2-row epoch frame broadcast onto the corpus (the pairgen ring
    # device) + 1-row doc-count scalar
    "order_epoch_shuffle",
}


def test_no_accidental_nested_loops_anywhere(spark, sf_dir) -> None:
    """Blanket guard: NO registered batch query may plan a cartesian
    product, and nested-loop joins are allowed only for the pinned
    bounded-broadcast designs above. Catches an accidental all-pairs
    regression anywhere in the registry."""
    from protarrow_spark.queries import all_queries

    offenders = {}
    for name, fn in all_queries().items():
        if name.startswith("stream_"):
            continue  # building the frame runs a streaming job
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_BY_DESIGN:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_chunk_and_pii_are_zero_shuffle(spark, sf_dir) -> None:
    # scan-stage-only ops: chunking explodes in place, PII scrubbing is
    # a per-row regex pass — any Exchange is a regression
    for name in ("text_chunk_overlap", "text_pii_redact", "sample_weighted_mix"):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange" not in plan, name


def test_stratified_sample_prunes_map_side(spark, sf_dir) -> None:
    # the per-stratum cap must push a WindowGroupLimit below the
    # shuffle (partial top-k map-side) and shuffle only on the stratum
    plan = _plan(spark, sf_dir, "sample_stratified_sources")
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_scene_cuts_single_window_shuffle(spark, sf_dir) -> None:
    # frame explode is narrow; the lag/cumsum windows share one
    # id-keyed exchange
    plan = _plan(spark, sf_dir, "mm_scene_cuts")
    assert plan.count("Exchange hashpartitioning") == 1


def test_pipeline_composition_broadcasts_eval_set(spark, sf_dir) -> None:
    # the decontamination stage must reach the corpus as a broadcast
    # hash join (the eval shingle set is benchmark-sized), and the
    # composed plan must stay free of all-pairs operators
    plan = _plan(spark, sf_dir, "pipeline_training_corpus")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_prefilter_probes_below_exact_join(spark, sf_dir) -> None:
    # the bloom bit-probes are pure literal-array arithmetic in the
    # probe side's scan stage (NO probe joins in the plan); the only
    # join is the exact verification BroadcastHashJoin above them
    # (plan text is outermost-first, so the exact join must appear
    # EARLIER in the string); a SortMergeJoin anywhere means the
    # probe side shuffled
    plan = _plan(spark, sf_dir, "join_bloom_prefilter")
    assert "SortMergeJoin" not in plan
    # one BHJ (the exact verification join) + one single-row BNLJ
    # (the bloom words array riding along as a broadcast variable)
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "__bf_words" in plan
    assert "__bf_w0" not in plan  # the old per-probe join columns
    exact = plan.find("BroadcastHashJoin [l_orderkey")
    assert exact != -1
    # double hashing: exactly two xxhash64 digests per probe row (r13:
    # native hash on the raw key replaced the md5-of-string pair),
    # derived once in a projection below the exact join
    for tag in ("bf1", "bf2"):
        assert tag in plan
    assert "xxhash64" in plan and "md5" not in plan
    assert plan.find("bf1") > exact


def test_bpe_pair_counts_single_exchange_topk(spark, sf_dir) -> None:
    # explode in the scan stage, partial agg map-side, one shuffle on
    # the bounded pair key space, top-20 as TakeOrdered (no full sort)
    plan = _plan(spark, sf_dir, "text_bpe_pair_counts")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "TakeOrderedAndProject" in plan


def test_random_projection_zero_shuffle_zero_python(spark, sf_dir) -> None:
    # quantization + sparse JL projection are scan-stage integer
    # arithmetic: any hash/range Exchange or Python eval operator is a
    # regression. The one allowed Exchange is spread()'s round-robin
    # repartition of an under-parallel local scan (a no-op at scale,
    # where the parquet scan already has thousands of splits).
    plan = _plan(spark, sf_dir, "embed_random_projection")
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Python" not in plan


def test_novelty_score_reuses_shingle_exchange(spark, sf_dir) -> None:
    # first-occurrence attribution and the join back share the shingle
    # key: the plan must stay equi-join only (no all-pairs) and within
    # the three-logical-shuffle budget (distinct, groupBy g + reused
    # side, per-doc rollup)
    plan = _plan(spark, sf_dir, "text_novelty_score")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 6


def test_oov_rate_broadcasts_vocab(spark, sf_dir) -> None:
    # the k-row vocabulary must reach the token stream as a broadcast
    # join — a SortMergeJoin would shuffle the whole corpus token
    # stream for a 1,000-row membership check
    plan = _plan(spark, sf_dir, "text_oov_rate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
