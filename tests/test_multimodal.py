"""Multimodal binary-column plumbing: schemas, batch shapes, 1:N fan-out.

The decode layer is the deterministic FakeCodec (real libs absent in this
container — RealCodec is the clearly-marked deploy stub); everything Spark
(mapInPandas schema contracts, Arrow batching, filters) is real.
"""

from __future__ import annotations

import pytest

from dedup_spark.functions.multimodal import (
    FakeCodec,
    RealCodec,
    decode_media,
    encode_fake,
    extract_features,
    make_media_df,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    df = make_media_df(spark, n=30, seed=42)
    df.persist().count()
    return df


def test_decode_schema_and_kinds(media):
    out = decode_media(media).toPandas()
    assert len(out) == 30
    img = out[out.kind == "image"]
    assert (img.width > 0).all() and (img.height > 0).all()
    assert img.duration_ms.isna().all()
    aud = out[out.kind == "audio"]
    assert (aud.duration_ms > 0).all() and aud.width.isna().all()
    vid = out[out.kind == "video"]
    assert (vid.n_frames > 0).all()


def test_decode_deterministic(media):
    a = decode_media(media).toPandas().sort_values("media_id").reset_index(drop=True)
    b = decode_media(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)


def test_features_fixed_dim_unit_norm(media):
    import numpy as np

    out = extract_features(media, dim=16).toPandas()
    assert len(out) == 30
    for f in out.features:
        assert len(f) == 16
        assert abs(np.linalg.norm(f) - 1.0) < 1e-9


def test_resize_reencodes_header(media):
    out = resize_images(media, 64, 64)
    decoded = decode_media(out).toPandas()
    assert (decoded.width == 64).all() and (decoded.height == 64).all()
    assert len(decoded) == 10  # only images pass the filter


def test_frame_sample_fanout(media):
    frames = sample_frames(media, every_n=10).toPandas()
    decoded = decode_media(media).toPandas()
    expected = sum(
        -(-int(n) // 10) for n in decoded[decoded.kind == "video"].n_frames
    )
    assert len(frames) == expected
    assert (frames.frame_idx % 10 == 0).all()
    assert frames.frame.map(lambda b: FakeCodec.decode_header(bytes(b))[0]).eq("imag").all()


def test_real_codec_is_marked_stub():
    with pytest.raises(NotImplementedError, match="Pillow"):
        RealCodec.decode_image(b"")
    with pytest.raises(NotImplementedError):
        RealCodec.sample_video_frames(b"", 10)


def test_fake_codec_roundtrip():
    p = encode_fake("imag", 128, 256, 3, seed=9)
    kind, a, b, c, blen = FakeCodec.decode_header(p)
    assert (kind, a, b, c) == ("imag", 128, 256, 3)
    assert len(p) == blen + 24
