"""Geolocation spatial-median spread vs NumPy oracle (SURVEY.md §2.3 A15)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import edges_df
from linkgraph.algorithms.geolocation import geolocate
from linkgraph.fixtures import chesapeake_edges, synthetic_crawl
from linkgraph.graph import Graph
from oracles import geolocation_oracle


def _seed_locations(edges, frac=0.2, seed=13):
    rng = np.random.default_rng(seed)
    verts = sorted({int(v) for e in edges for v in e})
    n = max(1, int(len(verts) * frac))
    chosen = rng.choice(verts, size=n, replace=False)
    return {
        int(v): (float(rng.uniform(-90, 90)), float(rng.uniform(-180, 180)))
        for v in chosen
    }


def _run(spark, edges, locs):
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    ldf = spark.createDataFrame(
        [(v, a, b) for v, (a, b) in locs.items()], "vid long, lat double, lon double"
    )
    res = geolocate(g, ldf)
    got = {r.vid: (r.lat, r.lon) for r in res.state.collect() if r.lat is not None}
    want = geolocation_oracle(edges, locs)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-9), v
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-9), v
    return res


def test_geo_chesapeake(spark):
    edges = chesapeake_edges()
    _run(spark, edges, _seed_locations(edges))


def test_geo_crawl(spark):
    edges = synthetic_crawl(300)
    _run(spark, edges, _seed_locations(edges, frac=0.1))


def test_geo_unreachable_stays_null(spark):
    # two components, seeds only in the first: second stays unlocated
    edges = [(0, 1), (1, 2), (10, 11)]
    locs = {0: (10.0, 20.0)}
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    ldf = spark.createDataFrame([(0, 10.0, 20.0)], "vid long, lat double, lon double")
    res = geolocate(g, ldf)
    rows = {r.vid: (r.lat, r.lon) for r in res.state.collect()}
    assert rows[1] == (10.0, 20.0) and rows[2] == (10.0, 20.0)
    assert rows[10] == (None, None) and rows[11] == (None, None)
    assert res.converged


def test_geo_seed_fixed(spark):
    # a located seed never moves, even when its neighbors disagree
    edges = [(0, 1), (1, 2)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    ldf = spark.createDataFrame(
        [(0, 0.0, 0.0), (2, 50.0, 60.0)], "vid long, lat double, lon double"
    )
    res = geolocate(g, ldf)
    rows = {r.vid: (r.lat, r.lon) for r in res.state.collect()}
    assert rows[0] == (0.0, 0.0) and rows[2] == (50.0, 60.0)
    assert rows[1] == (25.0, 30.0)  # median of the two seeds
