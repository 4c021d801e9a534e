"""Driver-contract guard: every queries() entry matches its DuckDB oracle
exactly at sf0.001 (the full sf0.01 sweep runs via scripts/check_oracles.py
and the driver itself)."""

import sys

sys.path.insert(0, "/root/repo")

from scripts.check_oracles import run_all

SF = "/root/testdata/sf0.001"


def test_all_queries_match_oracles(spark):
    results = run_all(spark, SF, verbose=False)
    failures = {k: v for k, v in results.items() if v}
    assert not failures, failures
    assert len(results) >= 25


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "image_id", "caption", "fmt", "w", "h", "tile_x", "tile_y", "cell_id",
    }
