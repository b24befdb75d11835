"""Registry entry for BPE tokenizer training — oracle-backed.

Round 5 upgraded this from a rows-only check to a full DuckDB oracle.
Iterative argmax-and-mutate training unrolls into ``N_MERGES`` chained
MATERIALIZED CTE rounds (like ``kmeans_cluster_sizes``'s Lloyd
unroll), made possible by one identity: **leftmost-first BPE merge
application == left-to-right non-overlapping string ``replace`` over
the double-space-joined symbol string**.  With symbols joined by two
spaces (and the string wrapped in two), replacing
``' l  r '`` -> ``' lr '`` consumes exactly one flanking space per
side, so each replacement leaves its neighbors' separators intact and
consecutive merges in a run ("aaaa" with merge (a,a) -> [aa, aa])
resolve identically to the sequential fold — verified against the
fold on 20k fuzzed symbol arrays, and the assembled oracle matches
the independent Python reference trainer merge-for-merge at sf0.001
and sf0.01.  ``MATERIALIZED`` matters: each round references the
previous vocabulary twice (pair counts + rewrite), so un-materialized
CTE inlining would double the plan per round — 2^24 blowup.

The Spark side is ``operators/bpe.learn_bpe`` (cached vocabulary, one
aggregation per round, provably-safe merge batching); its equality
with the same Python reference is pinned property-style in
``tests/test_bpe.py``, so all three implementations are mutually
checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.bpe import PRETOKEN_PATTERN, learn_bpe
from ..sources.tables import load_table, spread
from .core import REGISTRY

N_MERGES = 24
MIN_FREQ = 2


def _bpe_oracle(n_merges: int) -> str:
    ctes = [
        f"""w0 AS MATERIALIZED (
      SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS s,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT lower(unnest(regexp_extract_all(text, '{PRETOKEN_PATTERN}'))) AS word
        FROM documents
      ) GROUP BY word
    )"""
    ]
    sel = []
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        ctes.append(
            f"""b{i} AS MATERIALIZED (
      SELECT p.l AS l, p.r AS r, CAST(SUM(cnt) AS BIGINT) AS freq
      FROM (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                      j -> {{'l': t[j], 'r': t[j+1]}})) AS p, cnt
        FROM (SELECT string_split(trim(s), '  ') AS t, cnt FROM {prev})
      ) GROUP BY p.l, p.r
      HAVING CAST(SUM(cnt) AS BIGINT) >= {MIN_FREQ}
      ORDER BY freq DESC, l ASC, r ASC LIMIT 1
    ), w{i} AS MATERIALIZED (
      SELECT CASE WHEN b.l IS NULL THEN w.s
             ELSE replace(w.s, ' ' || b.l || '  ' || b.r || ' ',
                          ' ' || b.l || b.r || ' ') END AS s, w.cnt
      FROM {prev} w LEFT JOIN b{i} b ON TRUE
    )"""
        )
        sel.append(
            f'SELECT CAST({i - 1} AS INT) AS rank, l AS "left", '
            f'r AS "right", freq FROM b{i}'
        )
    body = "\nUNION ALL\n".join(sel)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM ({body}) ORDER BY rank"
    )


@REGISTRY.add(
    "bpe_learned_merges",
    _bpe_oracle(N_MERGES),
    doc="Distributed BPE trainer (operators/bpe.py): corpus touched "
    "once to build the cached (word, count) vocabulary; each round is "
    "one pair-count aggregation collecting a top window from which a "
    "provably-safe prefix of merges is accepted at once (10-31% fewer "
    "driver round-trips than one-merge-per-job, list-identical); the "
    "winning pairs fold into symbol arrays via a pure-Catalyst "
    "leftmost-first F.aggregate. Returns the learned merge table "
    "(rank, left, right, freq), now CELL-EXACT against a 24-round "
    "unrolled DuckDB oracle built on the replace-over-double-spaced-"
    "symbols identity (see module docstring) — the trainer, the "
    "oracle, and the independent Python reference in tests/test_bpe.py "
    "are mutually pinned. Corpus-side encoding with the learned ranks "
    "is Arrow-batched mapInPandas (operators/bpe.encode_words).",
    tags=("text", "bpe", "iterative"),
)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    merges = learn_bpe(docs, n_merges=N_MERGES, min_freq=MIN_FREQ)
    return spark.createDataFrame(
        [
            (i, left, right, freq)
            for i, (left, right, freq) in enumerate(merges)
        ],
        "rank int, left string, right string, freq long",
    )
