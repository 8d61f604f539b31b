"""parallel_for — element-wise compute (reference O3, SURVEY.md §2.1).

Reference: ``operators::parallel_for::execute`` applies a lambda over
vertices/edges/frontier [ref: include/gunrock/framework/operators/for/for.hxx
— UNVERIFIED].

Spark mapping: ``withColumn`` with built-in Column expressions — stays
inside whole-stage codegen (the fusion the reference gets from folding
compute into kernels, SURVEY.md §4.8).  For genuinely NumPy-shaped math a
vectorized pandas UDF is the fallback; no per-row Python ever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def parallel_for(df: DataFrame, **cols: Column) -> DataFrame:
    """Apply one or more column computations element-wise.

    ``parallel_for(state, rank=F.col("rank") / F.col("outdeg"))``
    """
    return df.withColumns(dict(cols))
