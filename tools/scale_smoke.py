"""Scale-up smoke: measure how the data-heavy queries grow when the
corpus grows ~10x — the local stand-in for "would this plan survive
100x".

Method: build a scaled testdata dir under ``.scale_tmp/`` — documents
and embeddings replicated ``--factor`` times with offset ids and a
per-copy character ``translate`` on the text (deterministic, cheap, and
it rewrites every shingle so copies are NOT near-duplicates of each
other; corpus statistics stay comparable while honest work scales with
the factor). All other tables symlink to the base sf so registry
builders run unmodified. Then each target query is timed (noop write,
min of 2) at 1x and at the factor, and the per-query scaling exponent
``log(t_Nx / t_1x) / log(N)`` is reported:

* ~1.0 — linear, the plan scales;
* >>1 (toward 2) — a quadratic stage survived; fix before 100 TB.

Sub-linear exponents happen when fixed overhead (JIT, stream/exchange
setup) dominates the 1x time; they read as "scale-safe at this size".

Usage:  python tools/scale_smoke.py [--factor 10] [--sf /root/testdata/sf0.1]
Writes SCALING.md at the repo root.
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# data-heavy registry queries whose cost is dominated by the scaled
# tables (documents/embeddings); the TPC-H-shaped ones scale with
# lineitem/orders, which this smoke leaves fixed
TARGETS = (
    "exact_dedup_reingest",
    "neardup_jaccard_pairs",
    "minhash_lsh_candidates",
    "simhash_hamming_pairs",
    "embedding_neardup_pairs",
    "doc_token_profile",
    "doc_quality_by_source",
    "lang_id_confusion",
    "ann_topk",
    "doc_fulltext_search",
    "substring_dup_spans",
    "doc_chunk_windows",
    "ann_lsh_topk",
    "doc_pii_scrub",
)

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_scaled_dir(spark, base_sf: str, factor: int, out_dir: str) -> str:
    from pyspark.sql import functions as F

    from github_data_pipeline_spark.sources.tables import TESTDATA_TABLES

    os.makedirs(out_dir, exist_ok=True)
    for t in TESTDATA_TABLES:
        if t in ("documents", "embeddings"):
            continue
        link = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(base_sf, f"{t}.parquet"), link)

    docs = spark.read.parquet(os.path.join(base_sf, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(base_sf, "embeddings.parquet"))
    id_off = 100_000_000
    doc_copies = []
    for i in range(factor):
        rot = ALPHA[i % 26 :] + ALPHA[: i % 26]
        doc_copies.append(
            docs.select(
                (F.col("doc_id") + i * id_off).alias("doc_id"),
                F.translate(F.col("text"), ALPHA, rot).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    scaled_docs = doc_copies[0]
    for d in doc_copies[1:]:
        scaled_docs = scaled_docs.unionByName(d)
    scaled_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb_copies = []
    for i in range(factor):
        emb_copies.append(
            emb.select(
                (F.col("vec_id") + i * id_off).alias("vec_id"),
                *[c for c in emb.columns if c != "vec_id"],
            )
        )
    scaled_emb = emb_copies[0]
    for d in emb_copies[1:]:
        scaled_emb = scaled_emb.unionByName(d)
    scaled_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    return out_dir


def time_queries(spark, sf_dir: str, names: tuple[str, ...]) -> dict[str, float]:
    from github_data_pipeline_spark.plans import all_plans

    registry = all_plans()
    out: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            t0 = time.time()
            registry[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.time() - t0
            out[name] = min(el, out.get(name, el))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from github_data_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale-smoke", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = os.path.join(REPO, ".scale_tmp")
    scaled = build_scaled_dir(spark, args.sf, args.factor, os.path.join(tmp, "sfX"))

    # warm-up: JIT/codegen on the small sf so 1x isn't penalized
    time_queries(spark, "/root/testdata/sf0.001", TARGETS)
    base = time_queries(spark, args.sf, TARGETS)
    big = time_queries(spark, scaled, TARGETS)

    lines = [
        "# SCALING — measured growth of the data-heavy queries",
        "",
        f"`tools/scale_smoke.py --factor {args.factor}` on `{args.sf}`: the",
        "documents/embeddings corpus is replicated with per-copy id offsets",
        "and a per-copy character translation (copies are distinct docs, not",
        "near-dups of each other), other tables fixed. exponent =",
        f"log(t_{args.factor}x / t_1x) / log({args.factor}); ~1 is linear,",
        "~2 means a quadratic stage survived. Sub-linear = fixed overhead",
        "dominates at 1x.",
        "",
        f"| query | t_1x (s) | t_{args.factor}x (s) | exponent |",
        "|---|---|---|---|",
    ]
    worst = 0.0
    for name in TARGETS:
        e = math.log(big[name] / base[name]) / math.log(args.factor)
        worst = max(worst, e)
        lines.append(
            f"| {name} | {base[name]:.2f} | {big[name]:.2f} | {e:.2f} |"
        )
    lines += ["", f"**Worst exponent: {worst:.2f}.**", ""]
    md = "\n".join(lines)
    with open(os.path.join(REPO, "SCALING.md"), "w", encoding="utf-8") as fh:
        fh.write(md)
    print(md)
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
