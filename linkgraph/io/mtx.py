"""MatrixMarket loader (reference I1, SURVEY.md §2.2).

Reference [ref: include/gunrock/io/matrix_market.hxx — UNVERIFIED]: parse
``.mtx`` coordinate format into COO, symmetrizing when the header says
``symmetric``.

Two paths:

- :func:`read_mtx` — distributed: ``spark.read.text`` + DataFrame
  split/cast (scales to any file size; comments and the size header are
  filtered out by predicate);
- :func:`read_mtx_local` — driver-side parse for small fixture graphs.

Both return a raw (src, dst[, weight]) DataFrame of 0-indexed directed
edges (symmetrized if the header asks), ready for ``Graph.from_edges``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _header_flags(first_line: str) -> tuple[bool, bool]:
    """(symmetric, has_values) from the %%MatrixMarket banner."""
    toks = first_line.lower().split()
    return "symmetric" in toks, "pattern" not in toks


def read_mtx(spark: SparkSession, path: str) -> DataFrame:
    """Distributed .mtx parse → edges(src,dst[,weight]) DataFrame."""
    # banner must be read driver-side (it decides symmetrize/value layout)
    first = spark.read.text(path).limit(1).collect()[0][0]
    symmetric, has_values = _header_flags(first)
    # The size header "M N NNZ" is the first non-comment line.  Drop it
    # POSITIONALLY, not by content: for value matrices a legitimate data
    # line can be byte-identical to the header (e.g. entry (4,4) value 6
    # in a 4x4/6-nnz matrix writes "4 4 6" twice) and a content filter
    # would silently delete both.  monotonically_increasing_id orders by
    # (partition, in-partition position) and spark.read.text splits one
    # file by ascending offset, so the minimum id among non-comment lines
    # is exactly the size header.
    lines = spark.read.text(path).where(
        ~F.col("value").startswith("%") & (F.length(F.trim("value")) > 0)
    ).withColumn("_mid", F.monotonically_increasing_id())
    header_mid = lines.agg(F.min("_mid")).collect()[0][0]
    lines = lines.where(F.col("_mid") != header_mid)
    parts = F.split(F.trim("value"), r"\s+")
    # >= not ==: 'complex' matrices carry a 4th (imaginary) token per
    # line; like the driver-side parser we read the leading tokens and
    # ignore the rest, so both paths return the same edges instead of
    # this one silently filtering every data line to an empty result.
    n_data_tokens = 3 if has_values else 2
    lines = lines.where(F.size(parts) >= n_data_tokens)
    edges = lines.select(
        (parts.getItem(0).cast("long") - 1).alias("src"),
        (parts.getItem(1).cast("long") - 1).alias("dst"),
        *(
            [parts.getItem(2).cast("double").alias("weight")]
            if has_values
            else []
        ),
    )
    if symmetric:
        edges = _symmetrize(edges)
    return edges


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Union with the swapped copy, WITHOUT re-emitting the diagonal —
    symmetric MatrixMarket storage lists (i,i) once and it must stay
    a single COO entry (a duplicated diagonal double-counts in SpMV /
    weighted use; ``Graph.from_edges`` only masks it because self-loop
    dropping defaults on)."""
    cols = edges.columns
    swapped = edges.where(F.col("src") != F.col("dst")).select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        *[c for c in cols if c not in ("src", "dst")],
    )
    return edges.unionAll(swapped)


def read_mtx_local(spark: SparkSession, path: str) -> DataFrame:
    """Driver-side parse (fixture-sized graphs)."""
    with open(path) as f:
        first = f.readline()
        symmetric, has_values = _header_flags(first)
        rows = []
        header_seen = False
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            if not header_seen:
                header_seen = True  # size line
                continue
            t = line.split()
            s, d = int(t[0]) - 1, int(t[1]) - 1
            if has_values:
                rows.append((s, d, float(t[2])))
            else:
                rows.append((s, d))
    schema = (
        "src long, dst long, weight double" if has_values else "src long, dst long"
    )
    df = spark.createDataFrame(rows, schema)
    if symmetric:
        df = _symmetrize(df)
    return df
