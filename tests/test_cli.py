"""CLI surface: the generic `query` verb (every catalog entry runnable
by name — the spark-submit user's entry point to the full inventory)."""

from __future__ import annotations

import pytest


def test_cli_query_verb_runs_catalog_entry(spark, tmp_path):
    from linkgraph.cli import main

    out = str(tmp_path / "out")
    rc = main(
        [
            "query",
            "--name", "degrees",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out,
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(got.columns) == {"vid", "outdeg"}


def test_cli_query_verb_rejects_unknown_name(spark, tmp_path):
    from linkgraph.cli import main

    with pytest.raises(SystemExit):
        main(
            [
                "query",
                "--name", "no_such_query",
                "--sf-dir", "/root/testdata/sf0.001",
                "--out", str(tmp_path / "o"),
            ]
        )


def test_compare_oracles_json_flag_without_value_exits_with_usage():
    """ADVICE r03: `--json` as the last argument must print usage and
    return 2, not crash with IndexError (or eat the sf_dir positional)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    try:
        import importlib

        mod = importlib.import_module("compare_oracles")
        old = sys.argv
        try:
            sys.argv = ["compare_oracles.py", "--json"]
            assert mod.main() == 2
        finally:
            sys.argv = old
    finally:
        sys.path.remove("/root/repo/tools")
