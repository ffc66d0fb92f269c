"""Streaming/batch parity + multimodal plumbing tests."""

from __future__ import annotations

import pytest

from kg_covid_19_spark.operators.multimodal import decode_media, media_metadata
from kg_covid_19_spark.streaming.events import (
    evt_windowed_counts,
    evt_windowed_counts_stream,
)

from conftest import SF_DIR


def test_stream_equals_batch(spark):
    batch = sorted(tuple(r) for r in evt_windowed_counts(spark, SF_DIR).collect())
    stream = sorted(
        tuple(r)
        for r in evt_windowed_counts_stream(spark, SF_DIR, "t_evt").collect()
    )
    assert batch == stream and len(batch) > 0


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG...", decoder="pil")


def test_media_metadata_deterministic(spark):
    a = sorted(tuple(r) for r in media_metadata(spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in media_metadata(spark, SF_DIR).collect())
    assert a == b and len(a) > 0
    for _doc, n_bytes, w, h, dec in a:
        assert w == (n_bytes % 640) + 1 and h == (n_bytes // 640) + 1
        assert dec == "fake-v1"


def test_multimodal_kernel_shapes(spark):
    from kg_covid_19_spark.operators.multimodal import (
        FRAME_BYTES,
        FRAME_STEP,
        media_features,
        media_frame_sample,
        media_resize,
    )
    from conftest import SF_DIR as SF

    feats = media_features(spark, SF).limit(5).collect()
    assert all(r.dim == 8 and len(r.f0.split(",")) == 8 for r in feats)
    assert all(
        0 <= int(x) <= 1_000_000 for r in feats for x in r.f0.split(",")
    )

    rs = media_resize(spark, SF).limit(5).collect()
    assert all((r.out_w, r.out_h, r.out_bytes) == (64, 64, 4096) for r in rs)

    frames = media_frame_sample(spark, SF)
    rows = frames.limit(50).collect()
    assert all(r.frame_idx % FRAME_STEP == 0 for r in rows)
    assert all(0 < r.frame_len <= FRAME_BYTES for r in rows)
