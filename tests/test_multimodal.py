"""Multimodal plumbing: schema, batching, determinism (decode stubbed)."""

from __future__ import annotations

from linkgraph.textops.multimodal import (
    extract_media_features,
    frame_sample_plan,
)


def _media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG fake"),
        (2, "audio", "audio/wav", b"RIFF fake"),
        (3, "video", "video/mp4", b"\x00\x00ftyp fake"),
        (4, "image", "image/png", b"\x89PNG fake"),  # same bytes as 1
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, mime string, payload binary"
    )


def test_feature_extraction_schema_and_determinism(spark):
    feats = extract_media_features(_media(spark), dim=12)
    rows = {r.media_id: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3, 4}
    for r in rows.values():
        assert len(r.feature) == 12
        assert r.n_bytes > 0
    # same payload bytes → same digest and same (fake-)decoded features
    assert rows[1].digest == rows[4].digest
    assert rows[1].feature == rows[4].feature
    assert rows[1].digest != rows[2].digest


def test_partitioning_invariance(spark):
    m = _media(spark)
    a = {r.media_id: r.feature for r in extract_media_features(m.repartition(1), dim=8).collect()}
    b = {r.media_id: r.feature for r in extract_media_features(m.repartition(7), dim=8).collect()}
    assert a == b


def test_frame_sample_plan(spark):
    plan = frame_sample_plan(_media(spark), every_n=5, max_frames=4)
    rows = [(r.media_id, r.frame_index) for r in plan.collect()]
    assert sorted(rows) == [(3, 0), (3, 5), (3, 10), (3, 15)]
