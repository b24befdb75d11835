"""α-temperature mixture weights: flattening semantics and integer
exactness of the fixed-point pipeline."""

from __future__ import annotations

import math

from github_data_pipeline_spark.plans import all_plans
from github_data_pipeline_spark.plans.mixture_plans import (
    PPM,
    SAMPLE_BUDGET,
    SQRT_SCALE,
)


def test_flattens_toward_uniform_and_integer_exact(spark, sf_dir):
    rows = (
        all_plans()["mixture_alpha_sampling"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert len(rows) > 1
    total_tokens = sum(r.tokens for r in rows)
    total_scaled = sum(
        math.floor(math.sqrt(r.tokens) * SQRT_SCALE) for r in rows
    )
    for r in rows:
        s = math.floor(math.sqrt(r.tokens) * SQRT_SCALE)
        # exact fixed-point arithmetic, reproduced in plain Python
        assert r.alpha_weight_ppm == s * PPM // total_scaled
        assert r.sample_tokens == SAMPLE_BUDGET * s // total_scaled
    # temperature flattening: sqrt compresses the range, so the
    # largest source's weight share sits BELOW its token share and
    # the smallest source's above (strict unless already uniform)
    big = max(rows, key=lambda r: r.tokens)
    small = min(rows, key=lambda r: r.tokens)
    if big.tokens > small.tokens:
        assert big.alpha_weight_ppm / PPM < big.tokens / total_tokens
        assert small.alpha_weight_ppm / PPM > small.tokens / total_tokens
    # allocations never exceed the budget and weights ~sum to 1
    assert sum(r.sample_tokens for r in rows) <= SAMPLE_BUDGET
    assert PPM - len(rows) <= sum(r.alpha_weight_ppm for r in rows) <= PPM
