"""Factor-scaled bench tier: per-query timings at ~30x the bench SF,
run at two core counts — the scale-visible complement to bench.py.

Why this exists (r12 verdict #3): at sf0.1 the full bench is
fixed-cost-bound — the 8-core and 32-core totals are identical (median
c8/c32 ratio 0.94), so the headline bench cannot show parallel or
shuffle wins at all. This tier times the top bench entries on a
factor-scaled corpus (documents/embeddings replicated via
scale_smoke.build_scaled_dir, plus a tpch mode for the
lineitem-bound entries), where task counts are real and a c8/c32
ratio >> 1 certifies the entry is actually data-bound. Optimization
targets for the round are chosen from THIS table, not the sf0.1 one.

Methodology matches bench.py: noop sink, one sf0.001 + one scaled-dir
untimed warm pass (artifact builds land there), two timed passes,
min-of-2, leftover RDD blocks dropped outside timed regions. Master is
``local[$SPARK_GRAFT_CPUS]`` — run once with 32 and once with 8, then
``--report`` merges the two JSONs into BENCH_SCALED.md.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/bench_scaled.py [--factor 30]
    SPARK_GRAFT_CPUS=8  python tools/bench_scaled.py [--factor 30]
    python tools/bench_scaled.py --report [--factor 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Top bench entries whose growth axis is documents/embeddings — the
# corpus the "none" mode replicates. Chosen from the sf0.1 bench map
# (top wall-clock) intersected with SCALING.md's largest t_30x rows.
DOC_TARGETS = (
    "jaccard_prefix_filter_pairs",
    "source_shingle_overlap",
    "lm_doc_typicality",
    "doc_repetition_gates",
    "doc_dup_ngram_rate",
    "minhash_lsh_candidates",
    "neardup_jaccard_pairs",
    "lsh_incremental_index",
    "lsh_capped_star_components",
    "embedding_covariance_pairs",
    "pca_topk_deflation",
    "curation_funnel_report",
)
# Top bench entries whose growth axis is lineitem/orders — the tpch
# mode's replication (facts grow, dims fixed).
TPCH_TARGETS = (
    "approx_lineitem_stats",
    "salted_priority_revenue",
)

TMP_ROOT = os.path.join(REPO, ".bench_scaled_tmp")


def _scaled_dir(spark, factor: int, skew: str) -> str:
    """Build (or reuse — the c8 run reuses the c32 run's build) the
    factor-scaled input dir. Input-layout artifact only: replicated
    rows of the SOURCE tables, no query results."""
    from tools.scale_smoke import build_scaled_dir

    out = os.path.join(TMP_ROOT, f"f{factor}_{skew}")
    marker = os.path.join(out, "_BUILT")
    if not os.path.exists(marker):
        build_scaled_dir(spark, "/root/testdata/sf0.1", factor, out, skew)
        with open(marker, "w"):
            pass
    return out


def _time_targets(spark, sf_dir: str, names) -> dict[str, float]:
    from bench import _drop_leftover_rdd_blocks

    from github_data_pipeline_spark.plans import all_plans

    registry = all_plans()
    # warm: codegen/JIT at the smallest sf, then one untimed pass at
    # the scaled dir (pays artifact builds + page-cache first touch
    # outside the timed region, same discipline as bench.py)
    for d in ("/root/testdata/sf0.001", sf_dir):
        for n in names:
            registry[n].builder(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            _drop_leftover_rdd_blocks(spark)
    out: dict[str, float] = {}
    for _ in range(2):
        for n in names:
            spark.sparkContext.setJobDescription(f"scaled:{n}")
            t0 = time.time()
            registry[n].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = round(time.time() - t0, 3)
            _drop_leftover_rdd_blocks(spark)
            out[n] = min(el, out.get(n, el))
    return out


def _result_path(factor: int, cpus: str) -> str:
    return os.path.join(TMP_ROOT, f"result_f{factor}_c{cpus}.json")


def run(factor: int) -> int:
    from github_data_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-scaled", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for skew, names in (("none", DOC_TARGETS), ("tpch", TPCH_TARGETS)):
        d = _scaled_dir(spark, factor, skew)
        timings.update(_time_targets(spark, d, names))

    res = {
        "metric": "scaled_subset_wall_seconds",
        "factor": factor,
        "cpus": int(cpus),
        "value": round(sum(timings.values()), 3),
        "queries": timings,
    }
    os.makedirs(TMP_ROOT, exist_ok=True)
    with open(_result_path(factor, cpus), "w") as f:
        json.dump(res, f)
    print(json.dumps(res))
    return 0


def report(factor: int) -> int:
    """Merge the c32 and c8 runs into BENCH_SCALED.md."""
    runs = {}
    for cpus in ("32", "8"):
        p = _result_path(factor, cpus)
        if os.path.exists(p):
            with open(p) as f:
                runs[cpus] = json.load(f)
    if "32" not in runs:
        print("no c32 result found; run the tier first", file=sys.stderr)
        return 1
    q32 = runs["32"]["queries"]
    q8 = runs.get("8", {}).get("queries", {})
    lines = [
        "# BENCH_SCALED — factor-scaled bench tier (scale-visible numbers)",
        "",
        f"`tools/bench_scaled.py --factor {factor}` on a ~{factor}x",
        "replication of sf0.1 (documents/embeddings for the corpus",
        "entries, lineitem/orders for the relational two; scale_smoke's",
        "input-layout replication — distinct ids, per-copy character",
        "rotation). Methodology = bench.py (noop sink, warm passes,",
        "min-of-2). The sf0.1 bench is fixed-cost-bound (its c8/c32",
        "ratio is ~0.94 across all 158 entries — r12 verdict), so THIS",
        "table is where parallelism and shuffle wins are visible and",
        "where optimization targets are chosen.",
        "",
        "A c8/c32 ratio >> 1 = the entry is data/parallelism-bound at",
        "this scale; ~1 = still fixed-cost-bound (driver latency,",
        "serial driver loops, streaming machinery).",
        "",
        "| query | c32 (s) | c8 (s) | c8/c32 |",
        "|---|---|---|---|",
    ]
    for n, t32 in sorted(q32.items(), key=lambda kv: -kv[1]):
        t8 = q8.get(n)
        ratio = f"{t8 / t32:.2f}" if t8 else "—"
        t8s = f"{t8:.2f}" if t8 else "—"
        lines.append(f"| {n} | {t32:.2f} | {t8s} | {ratio} |")
    lines.append("")
    body = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH_SCALED.md"), "w") as f:
        f.write(body)
    print(body)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=30)
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if args.report:
        return report(args.factor)
    return run(args.factor)


if __name__ == "__main__":
    raise SystemExit(main())
