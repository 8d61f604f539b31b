"""Dense-id dictionary encoding (SURVEY.md §4.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.dictionary import encode_urls


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_dense_ids_cover_range(spark):
    urls = [f"https://x.example/{i}" for i in range(97)]
    v = encode_urls(_urls_df(spark, urls * 2), num_partitions=4)  # dups ok
    rows = v.collect()
    assert len(rows) == 97
    assert sorted(r.vid for r in rows) == list(range(97))


def test_ids_follow_sort_order(spark):
    urls = ["b", "a", "c"]
    v = {r.url: r.vid for r in encode_urls(_urls_df(spark, urls), num_partitions=2).collect()}
    assert v["a"] < v["b"] < v["c"]


def test_deterministic_across_input_partitioning(spark):
    urls = [f"u{i:03d}" for i in range(200)]
    df = _urls_df(spark, urls)
    a = {r.url: r.vid for r in encode_urls(df.repartition(1), num_partitions=4).collect()}
    b = {r.url: r.vid for r in encode_urls(df.repartition(13), num_partitions=4).collect()}
    assert a == b
