"""Fixed schemas (reference: compile-time template types — SURVEY.md §1.1).

The reference fixes ``vertex_t``/``edge_t``/``weight_t`` at compile time; we
fix StructTypes at module scope and never rely on runtime schema inference on
hot paths.
"""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Canonical edge list (reference: coo_t — SURVEY.md §1.1).
EDGES_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
    ]
)

WEIGHTED_EDGES_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), False),
    ]
)

# Common-Crawl-style pages corpus (input_hint, BASELINE.json:15).
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

# url → dense vertex id dictionary (reference: compile-time dense vertex ids).
VERTICES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("vid", LongType(), False),
    ]
)

# Per-vertex state tables (reference: problem_t device arrays).
RANK_SCHEMA = StructType(
    [
        StructField("vid", LongType(), False),
        StructField("rank", DoubleType(), False),
    ]
)

COMP_SCHEMA = StructType(
    [
        StructField("vid", LongType(), False),
        StructField("comp", LongType(), False),
    ]
)

LABEL_SCHEMA = StructType(
    [
        StructField("vid", LongType(), False),
        StructField("label", LongType(), False),
    ]
)

FRONTIER_SCHEMA = StructType([StructField("vid", LongType(), False)])

EMBEDDING_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)
