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


def _pgm_bytes(width=8, height=6):
    """Binary PGM (P5) with a deterministic gradient raster."""
    import numpy as np

    px = (np.arange(width * height, dtype=np.uint8) % 251).reshape(
        height, width
    )
    return b"P5\n# test image\n%d %d\n255\n" % (width, height) + px.tobytes(), px


def _wav_bytes(n=2000, freq=5):
    """Stdlib-written 16-bit mono PCM WAV with a deterministic sine."""
    import io
    import wave

    import numpy as np

    t = np.arange(n) / n
    samples = (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    return buf.getvalue(), samples


def test_real_pgm_decode(spark):
    """P5 payloads take the REAL image decoder: features are the block
    means of the actual raster, not the hash-seeded fake."""
    import numpy as np

    from linkgraph.textops.multimodal import (
        _fake_decode,
        _pixels_to_feature,
        decode_pgm,
    )

    payload, px = _pgm_bytes()
    want = _pixels_to_feature(px.astype(np.float64) / 255.0, 6)
    got = decode_pgm(payload, 6)
    assert np.allclose(got, want)
    assert not np.allclose(got, _fake_decode(payload, 6))
    # through the Spark pass (dispatcher picks PGM by magic)
    df = spark.createDataFrame(
        [(1, "image", "image/x-portable-graymap", bytearray(payload))],
        "media_id long, kind string, mime string, payload binary",
    )
    rows = extract_media_features(df, dim=6).collect()
    assert np.allclose(rows[0].feature, want, atol=1e-6)
    # all-pixel mean is recoverable from block means of equal blocks
    assert abs(float(np.mean(rows[0].feature)) - float(px.mean() / 255.0)) < 1e-2


def test_real_wav_decode(spark):
    """RIFF/WAVE payloads take the REAL audio decoder: per-band RMS of
    the actual PCM samples."""
    import numpy as np

    from linkgraph.textops.multimodal import _fake_decode, decode_wav

    payload, samples = _wav_bytes()
    got = decode_wav(payload, 4)
    x = samples.astype(np.float64) / 32768.0
    want = [
        np.sqrt(np.mean(x[i * 500 : (i + 1) * 500] ** 2)) for i in range(4)
    ]
    assert np.allclose(got, want, atol=1e-9)
    assert not np.allclose(got, _fake_decode(payload, 4))
    # a full-scale sine's RMS ≈ amplitude/√2
    assert abs(got[0] - (20000 / 32768.0) / np.sqrt(2)) < 0.02
    df = spark.createDataFrame(
        [(7, "audio", "audio/wav", bytearray(payload))],
        "media_id long, kind string, mime string, payload binary",
    )
    rows = extract_media_features(df, dim=4).collect()
    assert np.allclose(rows[0].feature, got, atol=1e-6)


def test_corrupt_recognized_format_degrades_to_fake(spark):
    """A truncated PGM must not fail the task — it degrades to the
    deterministic fake (documented poisoned-batch policy)."""
    import numpy as np

    from linkgraph.textops.multimodal import _fake_decode, default_decode

    bad = b"P5\n8 6\n255\n\x01\x02"  # raster truncated
    got = default_decode(bad, 5)
    assert np.allclose(got, _fake_decode(bad, 5))


def test_pil_gated_decode():
    """When PIL is importable, PNG payloads are really decoded; when it
    is not (this container), the dispatcher must fall through to the
    fake rather than raise."""
    import numpy as np
    import pytest

    from linkgraph.textops.multimodal import (
        _fake_decode,
        _pil,
        _pixels_to_feature,
        default_decode,
    )

    if _pil() is None:
        png_magic_only = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
        got = default_decode(png_magic_only, 4)
        assert np.allclose(got, _fake_decode(png_magic_only, 4))
        pytest.skip("PIL not installed — fall-through verified")
    # real PIL path: build a tiny PNG and compare to the shared feature
    import io

    Image = _pil()
    px = (np.arange(64, dtype=np.uint8) * 3).reshape(8, 8)
    buf = io.BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="PNG")
    got = default_decode(buf.getvalue(), 4)
    want = _pixels_to_feature(px.astype(np.float64) / 255.0, 4)
    assert np.allclose(got, want, atol=1e-6)
