"""Multimodal binary-column plumbing: encode/decode round-trip,
feature extraction shape, resize metadata, and the env-gated real
decoder stub."""

from __future__ import annotations

import pytest

from breweries_data_pipeline_spark.operators.multimodal import (
    decode_dimensions,
    decode_fake_image,
    decode_image,
    decode_real_image,
    encode_fake_image,
    frame_sample_offsets,
    image_features,
    media_from_ids,
    resize_images,
)


def test_fake_codec_roundtrip():
    blob = encode_fake_image(7)
    w, h, c, pixels = decode_fake_image(blob)
    assert (w, h, c) == (16 + 7 % 17, 16 + 7 % 13, 1 + 7 % 3)
    assert len(pixels) == w * h * c
    assert encode_fake_image(7) == blob  # deterministic


def test_decode_dimensions_distributed(spark):
    ids = spark.range(20).withColumnRenamed("id", "doc_id")
    out = {r.media_id: r for r in decode_dimensions(media_from_ids(ids)).collect()}
    assert len(out) == 20
    for mid, r in out.items():
        assert r.width == 16 + mid % 17
        assert r.n_bytes == 17 + r.width * r.height * r.channels


def test_image_features_shape_and_range(spark):
    ids = spark.range(10).withColumnRenamed("id", "doc_id")
    rows = image_features(media_from_ids(ids), dim=8).collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.features) == 8
        assert all(0.0 <= v <= 1.0 for v in r.features)


def test_resize_changes_dimensions_keeps_channels(spark):
    ids = spark.range(5).withColumnRenamed("id", "doc_id")
    resized = resize_images(media_from_ids(ids), 8, 6)
    meta = {r.media_id: r for r in decode_dimensions(resized).collect()}
    for mid, r in meta.items():
        assert (r.width, r.height) == (8, 6)
        assert r.channels == 1 + mid % 3


def test_frame_sample_offsets_is_jvm_side(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3500,)], ["duration_ms"]).select(
        frame_sample_offsets(every_ms=1000).alias("offs")
    )
    assert df.collect()[0].offs == [0, 1000, 2000, 3000]


def test_decode_image_dispatches_on_magic():
    blob = encode_fake_image(3)
    assert decode_image(blob) == decode_fake_image(blob)


def test_real_decoder_raises_only_without_pil():
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_real_image(b"\x89PNG...")
    else:
        pytest.skip("PIL present; covered by test_real_decoder_decodes_png")


def test_real_decoder_decodes_png():
    Image = pytest.importorskip("PIL.Image")
    import io

    img = Image.new("RGB", (5, 3), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    w, h, c, pixels = decode_real_image(buf.getvalue())
    assert (w, h, c) == (5, 3, 3)
    assert len(pixels) == 5 * 3 * 3
    # the dispatcher routes non-FAKEIMG1 bytes to the real codec
    assert decode_image(buf.getvalue())[:3] == (5, 3, 3)
