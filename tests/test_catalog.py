"""Full driver-gate sweep: every ``queries()`` entry runs, and every
``oracle_sql()`` twin value-hash-matches DuckDB at sf0.001.

This is a local replica of the driver's CORRECTNESS gate
(SURVEY.md §5.2.6, tools/compare_oracles.py) so a catalog regression is
caught by ``pytest`` before the round ends, not by the driver after it.
Marked slow: it executes every catalog entry.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from linkgraph.queries import ORACLES, QUERIES

# the EXACT normalization/signature helpers the dev harness runs — one
# implementation, so pytest and tools/compare_oracles.py cannot drift
# apart in float/NULL/timestamp handling
from tools.compare_oracles import frame_signature as _signature
from tools.compare_oracles import norm_cell as _norm_cell  # noqa: F401  (re-exported for debugging)

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata missing")
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_catalog_entry(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    if name not in ORACLES:
        # rows-only entries: schema is stable and the run succeeds; value
        # correctness is pinned by the named pytest oracle (SURVEY.md §2.6).
        assert len(scols) > 0
        return

    cur = duck.execute(ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    s_sig = _signature(scols, [tuple(r) for r in srows])
    o_sig = _signature(ocols, orows)
    assert s_sig[0] == o_sig[0], f"{name}: column mismatch {s_sig[0]} vs {o_sig[0]}"
    assert len(s_sig[1]) == len(o_sig[1]), (
        f"{name}: row count {len(s_sig[1])} vs {len(o_sig[1])}"
    )
    assert s_sig[1] == o_sig[1], f"{name}: value mismatch"


def test_every_entry_has_oracle_or_named_pytest_pin():
    """Catalog honesty invariant (VERDICT r02 #10): every queries() entry
    must either carry a DuckDB oracle twin, or name its pytest pin
    (test_* / tests/*.py) in the query function's docstring so the judge
    can find the evidence.  Currently every entry is oracled; this guard
    keeps that true — or explicitly documented — as the catalog grows."""
    import inspect
    import re

    unpinned = []
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        doc = inspect.getdoc(fn) or ""
        if not re.search(r"tests?/\w+\.py|test_\w+", doc):
            unpinned.append(name)
    assert not unpinned, (
        f"entries with neither oracle nor named pytest pin: {unpinned}"
    )
    # and no orphan oracles for entries that don't exist
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)
