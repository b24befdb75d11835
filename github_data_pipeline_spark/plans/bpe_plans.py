"""Registry entry for BPE tokenizer training (rows-only check).

Iterative argmax-and-mutate training is not single-SQL-expressible
(same contract as ``kmeans_cluster_sizes``); the driver records the
weaker rows-only check and the real pin is ``tests/test_bpe.py``,
which compares the Spark trainer to an independent pure-Python
reference implementation property-style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.bpe import learn_bpe
from ..sources.tables import load_table, spread
from .core import REGISTRY

N_MERGES = 24


@REGISTRY.add(
    "bpe_learned_merges",
    None,
    doc="Distributed BPE trainer (operators/bpe.py): corpus touched "
    "once to build the cached (word, count) vocabulary; each merge is "
    "one pair-count aggregation + 1-row argmax collect with "
    "deterministic tie-breaks; the winning pair folds into symbol "
    "arrays via a pure-Catalyst leftmost-first F.aggregate. Returns "
    "the learned merge table (rank, left, right, freq). Corpus-side "
    "encoding with the learned ranks is Arrow-batched mapInPandas "
    "(operators/bpe.encode_words).",
    tags=("text", "bpe", "iterative"),
)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    merges = learn_bpe(docs, n_merges=N_MERGES)
    return spark.createDataFrame(
        [
            (i, left, right, freq)
            for i, (left, right, freq) in enumerate(merges)
        ],
        "rank int, left string, right string, freq long",
    )
