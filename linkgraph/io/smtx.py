"""smtx loader (reference I2, SURVEY.md §2.2).

Reference [ref: include/gunrock/io/smtx.hxx — UNVERIFIED]: the ``.smtx``
sparse-matrix text format (Sputnik / deep-learning pruned-matrix corpus)
is CSR-as-three-lines::

    nrows, ncols, nnz          # comma-separated header
    o0 o1 ... o_nrows          # row offsets (nrows+1 ints)
    c0 c1 ... c_{nnz-1}        # column indices

Unlike ``.mtx`` (one edge per line → trivially splittable), the payload
is two single giant lines, so the format is inherently non-splittable and
is parsed driver-side with vectorized NumPy (``np.fromstring``-class
throughput), then handed to Spark as an Arrow-backed COO DataFrame.  This
is a fixture/ingest path — web-scale inputs arrive as Parquet/Iceberg,
never .smtx; the loader exists for reference-format parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_smtx_local(spark: SparkSession, path: str) -> DataFrame:
    """Parse a ``.smtx`` file → edges(src,dst) DataFrame (0-indexed COO).

    CSR expansion is vectorized: ``src = repeat(arange(nrows),
    diff(offsets))`` — no Python loop over rows or nonzeros.
    """
    with open(path) as f:
        header = f.readline()
        nrows, _ncols, nnz = (int(t) for t in header.replace(",", " ").split())
        offsets = np.fromstring(f.readline(), dtype=np.int64, sep=" ")
        cols = np.fromstring(f.readline(), dtype=np.int64, sep=" ")
    if len(offsets) != nrows + 1:
        raise ValueError(
            f"smtx offsets line has {len(offsets)} ints, expected {nrows + 1}"
        )
    if len(cols) != nnz or offsets[-1] != nnz:
        raise ValueError(
            f"smtx column line has {len(cols)} ints / last offset "
            f"{offsets[-1]}, expected nnz={nnz}"
        )
    if nnz and (cols.min() < 0 or cols.max() >= _ncols):
        # out-of-range columns would silently become phantom vertices in
        # Graph.from_edges — fail as loudly as the other malformations
        raise ValueError(
            f"smtx column index out of range [0, {_ncols}): "
            f"min={cols.min()}, max={cols.max()}"
        )
    src = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(offsets))
    return spark.createDataFrame(pd.DataFrame({"src": src, "dst": cols}))
