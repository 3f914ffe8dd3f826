"""Multimodal binary-column operators: metadata, stub decode,
resize, frame sampling (fgcspark/multimodal.py).

The codec is a deterministic stub (no image libs in this container);
these tests pin the Spark-side plumbing — schemas, Arrow batch
handling, per-row fan-out, JVM/Python cross-checks — plus the stub's
exact byte-determinism so oracled queries stay stable."""

from __future__ import annotations

import hashlib

import pytest

from fgcspark import multimodal as mm


@pytest.fixture(scope="module")
def pages(spark, pages_dir):
    return spark.read.parquet(f"{pages_dir}/pages.parquet")


def test_metadata_matches_python(spark, pages):
    rows = pages.select("url", "html").orderBy("url").limit(50).collect()
    got = {
        r["url"]: r
        for r in mm.media_metadata(pages).collect()
    }
    for r in rows:
        b = bytes(r["html"])
        d = hashlib.md5(b).digest()
        m = got[r["url"]]
        assert m["n_bytes"] == len(b)
        assert m["width"] == 1 + len(b) % 640
        assert m["height"] == 1 + d[0] % 480
        assert m["channels"] == 3
        assert m["fp"] == int(hashlib.md5(b).hexdigest()[:14], 16)


def test_decode_stub_matches_metadata(spark, pages):
    """The JVM metadata path and the mapInPandas decode path must agree
    exactly — they are independent implementations of the same stub."""
    meta = mm.media_metadata(pages).select("url", "width", "height", "channels")
    dec = mm.decode_image_stub(pages).select("url", "width", "height", "channels")
    assert meta.exceptAll(dec).count() == 0
    assert dec.exceptAll(meta).count() == 0


def test_decode_features_shape_and_determinism(spark, pages):
    out = mm.decode_image_stub(pages.limit(20)).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["features"]) == mm.N_FEATURES
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # repartitioning must not change any value (pure function of bytes)
    again = {
        r["url"]: r["features"]
        for r in mm.decode_image_stub(pages.limit(20).repartition(7)).collect()
    }
    for r in out:
        assert again[r["url"]] == r["features"]


def test_resize_stub(spark, pages):
    out = mm.resize_stub(mm.decode_image_stub(pages.limit(200)), max_side=256)
    for r in out.collect():
        long_side = max(r["out_width"], r["out_height"])
        assert 1 <= long_side <= 256
        if max(r["width"], r["height"]) <= 256:
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
        else:
            assert long_side == 256 or long_side == 255  # floor of scaled short side
            # aspect ratio preserved within integer floor
            assert r["out_width"] <= r["width"] and r["out_height"] <= r["height"]


def test_frame_sampling(spark, pages):
    rows = pages.select("url", "html").orderBy("url").limit(30).collect()
    got: dict[tuple, str] = {}
    for r in mm.sample_frames_stub(pages).collect():
        got[(r["url"], r["frame_idx"])] = r["frame_md5"]
    for r in rows:
        b = bytes(r["html"])
        n = min(mm.MAX_FRAMES, len(b) // mm.FRAME_BYTES)
        assert n >= 1  # every synthetic page is >= 64 bytes
        for k in range(n):
            expect = hashlib.md5(b[k * 64 : (k + 1) * 64]).hexdigest()
            assert got[(r["url"], k)] == expect
        assert (r["url"], n) not in got  # no frames past the stream end
