"""Materialize the deterministic GitHub-domain fixtures as parquet under
``testdata_domain/`` (committed to the repo) so the driver's DuckDB
oracle can read the same tables the Spark domain queries read.

Regenerate with:  python tools/gen_fixture_parquet.py
(Only needed when sources/fixtures.py changes.)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata_domain",
)


def main() -> None:
    from github_data_pipeline_spark.session import get_spark
    from github_data_pipeline_spark.sources.fixtures import load_fixtures

    spark = get_spark("gen-fixtures", master="local[2]")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(OUT_DIR):
        shutil.rmtree(OUT_DIR)
    for name, df in load_fixtures(spark).items():
        # single file per table: tiny fixtures, deterministic layout
        path = os.path.join(OUT_DIR, name)
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                os.remove(os.path.join(path, f))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
