"""Mechanical closure of the forced-broadcast hazard class.

A forced ``F.broadcast()`` hint bypasses Spark's size check, so every
site in non-test source must be a consciously classified
CONSTANT-BOUNDED table (1-row aggregate attaches, fixed query/anchor
sets, key-domain-bounded dims like nation, codebooks) — anything whose
cardinality grows with the corpus must go through
``operators.hints.broadcast_if_bounded`` instead (r8 VERDICT: the class
was fixed where flagged but not swept; this test IS the sweep, frozen).

The test walks the package AST and asserts the exact set of
``F.broadcast`` call sites equals the whitelist below. Adding a new
forced hint fails here until the author classifies it with a bound
rationale; converting a site to the gate shrinks the list.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(os.path.dirname(__file__), "..", "github_data_pipeline_spark")

# (relative file, enclosing function) -> (site count, bound rationale).
# Every rationale must name WHY the table cannot grow with the corpus.
WHITELIST: dict[tuple[str, str], tuple[int, str]] = {
    ("operators/blame.py", "blame_range_details"): (
        1, "commit-detail dim bounded by the per-repo blame scan caps"),
    ("operators/blame.py", "blame_file_rollup"): (
        1, "keep set capped at max_files rows (BLAME_FILE_LIMIT)"),
    ("operators/decontam.py", "contamination_report"): (
        1, "benchmark shingles — bounded by the benchmark contract"),
    ("operators/diagnostics.py", "key_skew_report"): (
        1, "1-row global stats aggregate"),
    ("operators/fulltext.py", "bm25_scan_topk"): (
        1, "1-row corpus stats aggregate"),
    ("operators/fulltext.py", "bm25_index_topk"): (
        2, "per-QUERY-term df rows + 1-row stats table"),
    ("operators/hints.py", "broadcast_if_bounded"): (
        1, "the gate itself — every use is bound-checked by definition"),
    ("operators/linkers.py", "find_prs_with_linked_issues"): (
        3, "per-repo issue/PR lookups — reference-domain bounded"),
    ("operators/linkers.py", "find_issues_closed_by_commits"): (
        1, "per-repo issue-author lookup — reference-domain bounded"),
    ("operators/linkers.py", "find_cross_repo_links"): (
        1, "target-repo existence probe results, bounded by distinct refs"),
    ("plans/ann_lsh_plans.py", "_topk"): (
        1, "fixed N_QUERIES query-vector set"),
    ("plans/ann_lsh_plans.py", "ann_recall"): (
        4, "query sets, k centroids, probe list, N_QUERIES*K brute truth"),
    ("plans/audit_plans.py", "partial"): (
        1, "nation — 25-row key-domain-bounded dim"),
    ("plans/classifier_plans.py", "doc_char_trigram_typicality"): (
        2, "charset^3-bounded trigram df table + 1-row corpus total"),
    ("plans/cohort_plans.py", "events_retention_cohorts"): (
        1, "per-cohort-week sizes — bounded by the observed week span"),
    ("plans/github_plans.py", "gh_issue_comments"): (
        1, "point-lookup fetch bounded by the requested key list"),
    ("plans/graph_plans.py", "events_triangle_census"): (
        3, "three 1-row scalar aggregates in the final stat assembly"),
    ("plans/graph_plans.py", "item_edges"): (
        1, "1-row (|E|,W_total) threshold attach — the shared edge "
           "builder factored out of the census/BFS entries in r11"),
    ("plans/dpp_plans.py", "pruned_fact_agg"): (
        1, "nation-region dim filtered to one region — <= 25 rows by "
           "key domain; the forced hint pins the dim as the build side "
           "so DPP's broadcast reuse exists at every SF (a fact-side "
           "build degrades the pruning subquery to the no-op fallback)"),
    ("plans/bloom_plans.py", "bloom_prejoin_report"): (
        3, "the Bloom filter itself (<= M/32 = 1024 constant-bounded "
           "word rows) broadcast onto each of the K probe joins, plus "
           "two 1-row stat attaches in the report assembly"),
    ("plans/packing_plans.py", "seq_packing_manifest"): (
        4, "four 1-row invariant aggregates (pack stats, dup/missing/"
           "phantom counts) attached onto the 1-row corpus stats"),
    ("plans/relational.py", "local_supplier_revenue_q5"): (
        2, "nation (25 rows) and region (5 rows) constant dims — "
           "customer/supplier use size-gated broadcast_if_bounded"),
    ("plans/tpch_plans.py", "volume_shipping_q7"): (
        2, "nation-x-region dims pre-filtered to the two regions "
           "(<= 25 rows by key domain) on each join side — "
           "supplier/customer use size-gated broadcast_if_bounded"),
    ("plans/tpch_plans.py", "market_share_q8"): (
        3, "nation-x-region supplier dim, nation customer dim, and the "
           "one-region filter — all <= 25 rows by key domain; "
           "part/supplier/customer use size-gated broadcast_if_bounded"),
    ("plans/tpch_plans.py", "top_supplier_q15"): (
        1, "the 1-row global-max aggregate joined back on value "
           "equality (BroadcastHashJoin on an always-1-row side)"),
    ("plans/hybrid_plans.py", "_hybrid"): (
        1, "single query vector (1 row)"),
    ("plans/lm_plans.py", "lm_kn_bigram_probs"): (
        1, "1-row type-total attach"),
    ("plans/lm_plans.py", "lm_doc_typicality"): (
        1, "1-row type-total attach"),
    ("plans/lm_plans.py", "lm_kn_trigram_probs"): (
        1, "1-row bigram-type total attach"),
    ("plans/mining_plans.py", "hard_negative_mining"): (
        1, "fixed anchor set (N_ANCHORS rows)"),
    ("plans/mining_plans.py", "lm_bigram_lift"): (
        2, "1-row unigram/bigram instance totals"),
    ("plans/mixture_plans.py", "mixture_alpha_sampling"): (
        1, "1-row scaled-total attach"),
    ("plans/pq_plans.py", "ann_pq_adc_topk"): (
        2, "M*16-row codebook + N_QUERIES*M*16 query distance table"),
    ("plans/pq_plans.py", "ann_ivfpq_topk"): (
        2, "M*16-row codebook + N_QUERIES*M*16 query distance table"),
    ("plans/pq_plans.py", "ann_pq_recall"): (
        3, "codebook, query distances, 1-row query vector"),
    ("plans/quantile_plans.py", "events_value_outliers"): (
        1, "per-event-type moment stats — type-domain bounded"),
    ("plans/relational.py", "revenue_by_nation"): (
        1, "nation — 25-row key-domain-bounded dim"),
    ("plans/relational.py", "nation_set_ops"): (
        2, "nation (25 rows) + region-filtered distinct nation keys"),
    ("plans/relational.py", "customers_above_nation_avg"): (
        1, "per-nation averages — <=25 rows by key domain"),
    ("plans/similarity_plans.py", "ann_topk"): (
        2, "fixed N_QUERIES query sets (brute + ivf variants)"),
    ("plans/similarity_plans.py", "_pca_step"): (
        1, "the power-iteration iterate — ONE row (d-element array) "
           "flowing as data so the step plan is literal-free"),
    ("plans/similarity_plans.py", "_pca_centered"): (
        1, "the 1-row (mu array, n) stats frame attached for "
           "centering — the relational replacement of the 65-column "
           "stats collect"),
    ("plans/similarity_plans.py", "_pca_frame"): (
        1, "the same 1-row stats frame attached for the final "
           "eigenvalue emission"),
    ("plans/similarity_plans.py", "pca_topk_deflation"): (
        2, "the finished component (varr, q) — ONE checkpointed row "
           "attached per deflation projection — plus the 1-row stats "
           "frame for the eigenvalue emission"),
    ("plans/sketch_plans.py", "sketch_over"): (
        3, "1-row exact/sample/sketch attaches"),
    ("plans/sketch_plans.py", "kmv_incremental_merge"): (
        2, "1-row merged/scratch/exact estimate attaches"),
    ("plans/source_overlap_plans.py", "source_shingle_overlap"): (
        2, "per-source size table — catalog-bounded source domain"),
    ("plans/split_plans.py", "leakage_safe_splits"): (
        2, "1-row leaky/naive verdict aggregates"),
    ("plans/streaming_plans.py", "approx_lineitem_stats"): (
        5, "1-row sketch/exact/rank/percentile aggregates"),
    ("plans/temporal_plans.py", "events_gap_fill_hourly"): (
        1, "1-row global hour-bounds aggregate"),
}


def _forced_broadcast_sites() -> dict[tuple[str, str], int]:
    found: dict[tuple[str, str], int] = {}
    for root, _dirs, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            tree = ast.parse(open(path).read())
            spans = [
                (n.lineno, n.end_lineno, n.name)
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "broadcast"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "F"
                ):
                    enclosing = [
                        name
                        for (a, b, name) in spans
                        if a <= node.lineno <= (b or a)
                    ]
                    key = (rel, enclosing[-1] if enclosing else "<module>")
                    found[key] = found.get(key, 0) + 1
    return found


def test_every_forced_broadcast_is_whitelisted_with_a_bound():
    found = _forced_broadcast_sites()
    want = {k: n for k, (n, _why) in WHITELIST.items()}
    new = {k: v for k, v in found.items() if k not in want}
    assert not new, (
        "unclassified forced F.broadcast site(s) — either the table is "
        "constant-bounded (add to WHITELIST with the bound rationale) or "
        f"it scales with data (use broadcast_if_bounded): {new}"
    )
    gone = {k: v for k, v in want.items() if k not in found}
    assert not gone, f"stale WHITELIST entries (sites removed/moved): {gone}"
    drift = {
        k: (found[k], want[k]) for k in found if found[k] != want[k]
    }
    assert not drift, f"site-count drift (found, whitelisted): {drift}"


def test_converted_sites_stay_converted():
    """The r8-verdict conversions must not regress to forced hints:
    these functions previously force-broadcast SF-scaling tables
    (customer, LSH candidates, dropped ids, user dims, vocab tables)
    and now have ZERO forced sites — any reappearance fails here."""
    found = _forced_broadcast_sites()
    for key in [
        ("plans/relational.py", "top_customers_by_revenue"),
        ("plans/relational.py", "shipping_priority"),
        ("curation.py", "neardup_drop_stage"),
        ("streaming/jobs.py", "enriched_rollup_stream"),
        ("operators/decontam.py", "decontaminate"),
    ]:
        assert key not in found, f"forced broadcast regressed at {key}"
    # revenue_by_nation keeps exactly ONE forced hint (nation, 25 rows);
    # the customer hint there must stay gated
    assert found[("plans/relational.py", "revenue_by_nation")] == 1
