"""Shared Spark fixtures (SURVEY.md §5.2)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark  # noqa: E402

TEST_PARALLELISM = int(os.environ.get("LINKGRAPH_TEST_CORES", "8"))


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master=f"local[{TEST_PARALLELISM}]",
        app_name="linkgraph-tests",
        shuffle_partitions=TEST_PARALLELISM,
        extra_conf={
            "spark.driver.memory": "8g",
            # keep tiny-fixture jobs fast
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        },
    )
    yield s
    s.stop()


def edges_df(spark, edges):
    """Build an edges DataFrame from a python/numpy edge list."""
    rows = [(int(s), int(d)) for s, d in edges]
    return spark.createDataFrame(rows, "src long, dst long")


@pytest.fixture(scope="session")
def chesapeake_graph(spark):
    from linkgraph.fixtures import chesapeake_edges
    from linkgraph.graph import Graph

    return Graph.from_edges(edges_df(spark, chesapeake_edges()), num_partitions=4)


@pytest.fixture(scope="session")
def crawl_graph(spark):
    from linkgraph.fixtures import synthetic_crawl
    from linkgraph.graph import Graph

    return Graph.from_edges(
        edges_df(spark, synthetic_crawl(500)), num_partitions=8
    )


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
