"""Generate PLANS.md: a physical-plan audit of every graded batch
query — the scale-readiness evidence behind SURVEY.md §2.3's "100 TB
shape" claims.

For each batch query in the graded window, the tool builds the
DataFrame, executes it (collect at tiny SF — this finalizes AQE in
place; streaming queries run their own jobs and are listed, not
planned), and extracts from the executed physical plan the
properties that decide whether it survives a 1000-executor scale-up:

* join strategies (broadcast hash / sort-merge / shuffled hash —
  and the red-flag nested-loop / cartesian shapes),
* exchange (shuffle) count and partitioning,
* per-scan pushed filters and read-schema width (column pruning),
* whole-stage-codegen coverage.

Run: ``python tools/plan_audit.py [sf_dir]`` (default sf0.001 — plan
shapes are data-independent; AQE may pick broadcast where runtime
stats at larger SFs choose shuffle, which the table notes).
"""

from __future__ import annotations

import re
import sys

JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|"
    r"CartesianProduct|StreamingSymmetricHashJoin)"
)
RED_FLAGS = ("BroadcastNestedLoopJoin", "CartesianProduct")
SCAN_RE = re.compile(r"FileScan parquet \S*?\[([^\]]*)\][^\n]*")
PUSHED_RE = re.compile(r"PushedFilters: \[([^\]]*)\]")


def audit_one(plan: str) -> dict:
    joins: dict[str, int] = {}
    for m in JOIN_RE.finditer(plan):
        joins[m.group(1)] = joins.get(m.group(1), 0) + 1
    scans = []
    for m in SCAN_RE.finditer(plan):
        cols = [c.split("#")[0] for c in m.group(1).split(",") if c.strip()]
        pf = PUSHED_RE.search(m.group(0))
        pushed = pf.group(1) if pf else ""
        scans.append((len(cols), pushed))
    return {
        "joins": joins,
        "exchanges": len(re.findall(r"\bExchange ", plan)),
        "reused_exchanges": len(re.findall(r"\bReusedExchange\b", plan)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": scans,
        "red_flags": [f for f in RED_FLAGS if f in plan],
        "python_eval": len(
            re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from protarrow_spark.queries import all_queries
    from protarrow_spark.queries.registry import GRADED_FIRST
    from protarrow_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=8)
    queries = all_queries()

    # Audit the graded window plus newer non-window operators whose
    # scale shape is worth pinning in the table.
    extra = [
        "join_bloom_prefilter",
        "text_bpe_pair_counts",
        "text_novelty_score",
        "text_oov_rate",
        "sketch_kmv_set_ops",
        "table_merge_upsert",
        "table_scd2_history",
        # round-6 late additions (graded from r7 on)
        "dedup_semdedup",
        "text_boilerplate_ngrams",
        "sample_temperature_mix",
        "sample_perplexity_filter",
        "window_cusum_changepoint",
        "dq_referential_integrity",
        "dq_freshness_lag",
        "embed_pca_top1",
        "embed_pca_project",
        "join_asof_nearest",
        "dedup_boundary_overlap",
        "pipeline_ccnet",
        "agg_skew_kurtosis_exact",
        "order_length_buckets",
        "graph_common_neighbors",
        # round-6 final batch (graded from r7 on)
        "mine_sequence_bigrams",
        "dq_benford",
        "window_attribution_last_touch",
        "window_rolling_median",
        "agg_hhi_concentration",
        "ann_ivf_recall_report",
        "retrieval_hybrid_rrf",
        "report_token_fertility",
        "dq_drift_splithalf",
        "mm_image_features_jpeg_color",
        "mm_thumbnail_jpeg",
        "window_seasonal_baseline",
        "agg_time_to_convert",
        "graph_kcore",
        "sketch_error_report",
        "ann_quantization_error_report",
        "pairgen_hard_negatives",
        "dedup_threshold_sweep",
        "conv_decode_corrupt_tolerance",
    ]
    rows = []
    streaming = []
    flagged = []
    for name in GRADED_FIRST + [
        n for n in extra if n in queries and n not in GRADED_FIRST
    ]:
        if name.startswith("stream_"):
            streaming.append(name)
            continue
        df = queries[name](spark, sf_dir)
        # Execute df's OWN query execution (collect, tiny SF) so AQE
        # finalizes it in place: what we audit is the plan that
        # actually ran — runtime join upgrades, coalesced shuffles,
        # and codegen annotations included. A noop-sink write would
        # finalize a separate QueryExecution and leave this one
        # un-annotated.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit_one(plan)
        if a["red_flags"]:
            flagged.append((name, a["red_flags"]))
        joins = (
            ", ".join(f"{k.replace('Join','')}x{v}" if v > 1 else k.replace("Join", "")
                      for k, v in sorted(a["joins"].items()))
            or "—"
        )
        widest = max((c for c, _ in a["scans"]), default=0)
        pushed = "yes" if any(p for _, p in a["scans"]) else "—"
        py = str(a["python_eval"]) if a["python_eval"] else "—"
        rows.append(
            f"| `{name}` | {joins} | {a['exchanges']}"
            f"{' (+' + str(a['reused_exchanges']) + ' reused)' if a['reused_exchanges'] else ''}"
            f" | {pushed} | {widest} | {a['codegen_spans']} | {py} |"
        )

    out = [
        "# PLANS — physical-plan audit of the graded window",
        "",
        f"Generated by `tools/plan_audit.py` at `{sf_dir}`. Each query is",
        "EXECUTED and the AQE-finalized physical plan audited — runtime join",
        "upgrades, coalesced shuffles, and reused exchanges included (at",
        "larger SFs AQE may demote a broadcast back to shuffle from observed",
        "sizes; the shuffle keys and operator structure are SF-independent).",
        "",
        "Columns: **joins** = physical join operators in the executed plan;",
        "**xchg** = shuffle exchanges (ReusedExchange noted); **pushed** =",
        "parquet scans carry PushedFilters; **scan w** = widest scan's read-",
        "schema column count (column pruning evidence); **wsc** = distinct",
        "whole-stage-codegen spans; **py** = Python/Arrow eval operators",
        "(multimodal + conversion batch paths only, by design).",
        "",
        "| query | joins | xchg | pushed | scan w | wsc | py |",
        "|---|---|---|---|---|---|---|",
        *rows,
        "",
        "**Red-flag scan** (BroadcastNestedLoopJoin / CartesianProduct over",
        "data-sized inputs):",
        "",
    ]
    if flagged:
        out += [f"- `{n}`: {', '.join(fl)}" for n, fl in flagged]
        out += [
            "",
            "(All flags are pinned bounded-broadcast designs — see",
            "tests/test_plan_shapes.py BNLJ_BY_DESIGN: `ann_cosine_topk`",
            "broadcasts a fixed-size query set over a linear corpus scan,",
            "`sketch_kmv_set_ops` combines three SINGLE-ROW scalar",
            "aggregates, `join_bloom_prefilter` rides its <=64 KiB bloom",
            "word array along as a ONE-ROW broadcast, `text_bpe_train`",
            "broadcasts its ONE-ROW merge rule into the fold rewrite,",
            "`dedup_lsh_recall_report`/`_sampled` combine three ONE-ROW",
            "count frames into the report row, `sample_token_budget_mix`",
            "rides two ONE-ROW totals into the quota dimension,",
            "`window_funnel_stages` broadcasts its ONE-ROW stage grid, and",
            "`pairgen_contrastive_negatives` fans out a k-row (k=2) index",
            "frame. Everything else must stay flag-free, enforced by the",
            "same test.)",
        ]
    else:
        out.append("none — every graded batch plan is free of all-pairs operators.")
    out += [
        "",
        "Streaming queries (planned by the streaming engine at run time,",
        "audited via their batch-equivalence oracles instead): "
        + ", ".join(f"`{s}`" for s in streaming) + ".",
        "",
    ]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written: {len(rows)} batch plans, {len(flagged)} flagged")
    spark.stop()


if __name__ == "__main__":
    main()
