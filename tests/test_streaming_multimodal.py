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


def test_grid_neardup_has_full_recall_vs_brute_force(spark):
    """The banded-multiprobe guarantee, asserted: every pair the
    quadratic brute-force L1 join admits at L1_MAX_PPM must be emitted
    by media_grid_neardup (pigeonhole: some 4-dim band has band-L1 <=
    thr/2, so its grid indices are within +-1 and the 81-offset probe
    join cannot miss it). Precision is trivially 1.0 (shared verify),
    so this equality IS recall = 1.0."""
    from pyspark.sql import functions as F

    from kg_covid_19_spark.operators.multimodal import (
        L1_MAX_PPM,
        media_features,
        media_grid_neardup,
    )

    f = media_features(spark, SF_DIR)
    v = F.transform(F.split("f0", ","), lambda s: s.cast("long"))
    g = f.select("doc_id", v.alias("v"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("v").alias("va"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("v").alias("vb"))
    l1 = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> abs(x - y)), 0L, "
        "(acc, x) -> acc + x)"
    )
    brute = sorted(
        tuple(r)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("l1_ppm", l1)
        .filter(F.col("l1_ppm") <= L1_MAX_PPM)
        .select("id_a", "id_b", "l1_ppm")
        .collect()
    )
    got = sorted(tuple(r) for r in media_grid_neardup(spark, SF_DIR).collect())
    assert got == brute
    assert brute, "threshold admits no pairs at test scale — vacuous"
