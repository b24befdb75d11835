"""Text-analysis queries over the ``documents`` table (SURVEY.md §7.9:
language-ID, quality scoring, token counting, document fingerprinting).

Everything is built-in-function Catalyst expressions (functions/text.py)
— zero Python in the hot path — and every query has an exact DuckDB
oracle: the same token pipeline re-expressed with list lambdas. Token
hashes are engine-neutral arithmetic (length/ascii polynomials or
md5-hex prefixes) rather than engine hash builtins, precisely so the
oracle can reproduce them.

Scale: per-document expressions are embarrassingly parallel (no
shuffle); the only shuffles are the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.tables import load_table, spread
from .core import REGISTRY

_add = REGISTRY.add

# DuckDB fragments shared by the oracles ----------------------------------

_TOKS = "string_split_regex(trim(text), '\\s+')"

_POLY = (
    "list_transform({toks}, t -> "
    "(length(t)*961 + ascii(substr(t,1,1))*31 + ascii(substr(t,-1,1)))::BIGINT)"
)


def _duck_marker_hits(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in markers)
    return f"len(list_filter(toks, t -> list_contains([{lst}], lower(t))))"


# --------------------------------------------------------------------------


@_add(
    "doc_token_stats",
    f"""
    SELECT
      doc_id,
      CAST(len(toks) AS BIGINT) AS token_cnt,
      CAST(len(list_distinct(toks)) AS BIGINT) AS uniq_tokens,
      CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS token_chars
    FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    """,
    doc="Per-document token statistics: whitespace tokenization, distinct "
    "count, character totals. Narrow map-only plan — reads (doc_id, "
    "text), no shuffle, scales linearly.",
    tags=("text",),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = T.tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("token_cnt"),
        F.size(F.array_distinct(toks)).cast("long").alias("uniq_tokens"),
        T.char_count(toks).cast("long").alias("token_chars"),
    )


_MARKER_SCORE_COLS = ",\n      ".join(
    f"{_duck_marker_hits(markers)} AS score_{lang}"
    for lang, markers in sorted(T.LANG_MARKERS.items())
)
_SCORE_ROWS = ", ".join(
    f"('{lang}', score_{lang})" for lang in sorted(T.LANG_MARKERS)
)


@_add(
    "lang_id_confusion",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
      {_MARKER_SCORE_COLS}
      FROM (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
    ), ranked AS (
      SELECT doc_id, lang, s.cand AS predicted,
        ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY s.score DESC, s.cand ASC
        ) AS rn
      FROM scored, UNNEST([{", ".join(f"{{'cand': '{lang}', 'score': score_{lang}}}" for lang in sorted(T.LANG_MARKERS))}]) AS u(s)
    )
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS docs
    FROM ranked WHERE rn = 1
    GROUP BY lang, predicted
    """,
    doc="Language-ID confusion matrix: marker-word argmax (ties break "
    "lexicographically) vs the labeled lang. The Spark side is a pure "
    "expression fold (functions/text.py lang_id); the oracle re-ranks "
    "per-language scores with ROW_NUMBER.",
    tags=("text", "langid"),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = T.tokens("text")
    return (
        d.select("doc_id", "lang", T.lang_id(toks).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("docs"))
    )


_EN_STOPS = ", ".join(f"'{w}'" for w in T.EN_STOPWORDS)


@_add(
    "doc_quality_by_source",
    f"""
    WITH q AS (
      SELECT
        source,
        len(toks) AS token_cnt,
        len(list_filter(toks, t -> list_contains([{_EN_STOPS}], lower(t)))) AS stop_hits,
        list_sum(list_transform(toks, t -> length(t))) AS token_chars
      FROM (SELECT source, {_TOKS} AS toks FROM documents)
    )
    SELECT
      source,
      CAST(COUNT(*) AS BIGINT) AS docs,
      CAST(SUM(token_cnt) AS BIGINT) AS tokens,
      CAST(SUM(stop_hits) AS BIGINT) AS stopword_hits,
      CAST(SUM(CASE WHEN token_cnt BETWEEN 20 AND 400
                     AND stop_hits * 10 >= token_cnt THEN 1 ELSE 0 END) AS BIGINT)
        AS quality_docs,
      CAST(SUM(token_chars) AS DOUBLE) / SUM(token_cnt) AS avg_token_len
    FROM q GROUP BY source
    """,
    doc="Quality scoring rolled up by source: length-window and "
    "stopword-ratio gates (ratio test kept in exact integer form: "
    "hits*10 >= tokens instead of hits/tokens >= 0.1). Map-side "
    "expressions + one small aggregation.",
    tags=("text", "quality"),
)
def doc_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = T.tokens("text")
    scored = d.select(
        "source",
        F.size(toks).alias("token_cnt"),
        T.stopword_hits(toks).alias("stop_hits"),
        T.char_count(toks).alias("token_chars"),
    )
    is_quality = (
        F.col("token_cnt").between(20, 400)
        & (F.col("stop_hits") * 10 >= F.col("token_cnt"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("token_cnt").alias("tokens"),
            F.sum("stop_hits").alias("stopword_hits"),
            F.sum(is_quality.cast("int")).alias("quality_docs"),
            (
                F.sum("token_chars").cast("double") / F.sum("token_cnt")
            ).alias("avg_token_len"),
        )
    )


@_add(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
      CAST(list_reduce({_POLY.format(toks=_TOKS)}, (a, b) -> (a*31 + b) % 1000003) AS BIGINT)
        AS fingerprint
    FROM documents
    """,
    doc="Order-sensitive rolling document fingerprint (Karp-Rabin fold, "
    "functions/text.py). The polynomial token hash is plain arithmetic "
    "so DuckDB folds to the identical value; production would swap in "
    "xxhash64 (fingerprint64) with no plan change.",
    tags=("text", "fingerprint"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", T.fingerprint_rolling(T.tokens("text")).alias("fingerprint")
    )


@_add(
    "bpe_ish_token_counts",
    r"""
    SELECT
      CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
        AS subword_tokens,
      CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        AS whitespace_tokens,
      CAST(SUM(length(text)) AS BIGINT) AS chars,
      CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DOUBLE)
        / SUM(length(text)) AS tokens_per_char
    FROM documents
    """,
    doc="Token counting with a BPE-ish pretokenizer regex (letter runs "
    "| digit runs | single punctuation — the GPT-2-style split shape) "
    "next to plain whitespace counts: the budget estimator a training "
    "pipeline runs before the real tokenizer. Pure regexp_extract_all, "
    "stays in codegen.",
    tags=("text", "tokens"),
)
def bpe_ish_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )
    ws = F.size(T.tokens("text"))
    return d.agg(
        F.sum(bpe).alias("subword_tokens"),
        F.sum(ws).alias("whitespace_tokens"),
        F.sum(F.length("text")).alias("chars"),
        (
            F.sum(bpe).cast("double") / F.sum(F.length("text"))
        ).alias("tokens_per_char"),
    )


@_add(
    "doc_hash_sample",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS sampled_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
    GROUP BY source
    """,
    doc="Deterministic ~10% sample via content-hash bucketing "
    "(hash(doc_id) % 10) — reproducible across runs, engines and "
    "cluster sizes, unlike rand()-based sampling; the standard way a "
    "training pipeline carves stable eval splits. Pushdown-friendly "
    "map-side filter.",
    tags=("text", "sampling"),
)
def doc_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    return (
        d.filter(bucket == 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("sampled_docs"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


@_add(
    "doc_length_top_decile",
    f"""
    SELECT source, doc_id, token_cnt FROM (
      SELECT source, doc_id, len(toks) AS token_cnt,
             NTILE(10) OVER (
               PARTITION BY source ORDER BY len(toks) DESC, doc_id ASC
             ) AS decile
      FROM (SELECT source, doc_id, {_TOKS} AS toks FROM documents)
    ) WHERE decile = 1
    """,
    doc="Quality gate by distributional position: per-source top decile "
    "of token counts via NTILE with a full deterministic ordering — "
    "the percentile-threshold filter shape (keep longest 10%% of docs "
    "per domain) a curation pipeline applies before training.",
    tags=("text", "quantile"),
)
def doc_length_top_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    token_cnt = F.size(T.tokens("text"))
    w = Window.partitionBy("source").orderBy(
        token_cnt.desc(), F.col("doc_id").asc()
    )
    return (
        d.select(
            "source",
            "doc_id",
            token_cnt.alias("token_cnt"),
            F.ntile(10).over(w).alias("decile"),
        )
        .filter(F.col("decile") == 1)
        .select("source", "doc_id", "token_cnt")
    )
