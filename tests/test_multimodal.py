"""Multimodal operator plumbing: schemas, batch shapes, determinism,
and resize/sample semantics — with the stubbed deterministic decoder
(real codecs absent in this image by design)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from samplebatchprocessing_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_smoke):
    return mm.media_table_from_fixture(spark, sf_smoke, "image").cache()


def test_media_table_schema(media):
    d = dict(media.dtypes)
    assert d["content"] == "binary"
    assert d["meta"] == "struct<height:int,width:int>"


def test_image_features_deterministic(spark, media):
    a = {r["media_id"]: tuple(r) for r in mm.image_features(media).collect()}
    b = {r["media_id"]: tuple(r) for r in mm.image_features(media).collect()}
    assert a == b and len(a) == media.count()
    for row in a.values():
        # uint8 channel means live in [0, 255]
        assert all(0 <= row[i] <= 255 for i in (3, 4, 5, 6))


def test_image_resize_shapes(spark, media):
    out = mm.image_resize(media, out_h=8, out_w=8).collect()
    assert all(len(bytes(r["content"])) == 8 * 8 * 3 for r in out)
    assert all(r["height"] == 8 and r["width"] == 8 for r in out)


def test_resize_preserves_decoded_pixels(media):
    """Nearest-neighbor resize must sample actual decoded pixels."""
    row = media.orderBy("media_id").first()
    h, w = row["meta"]["height"], row["meta"]["width"]
    px = mm.fake_decode_image(bytes(row["content"]), h, w)
    resized = {r["media_id"]: bytes(r["content"])
               for r in mm.image_resize(media, out_h=4, out_w=4).collect()}
    got = np.frombuffer(resized[row["media_id"]],
                        dtype=np.uint8).reshape(4, 4, 3)
    yi = (np.arange(4) * h // 4)
    xi = (np.arange(4) * w // 4)
    assert (got == px[yi][:, xi]).all()


def test_frame_sample(spark, sf_smoke):
    vid = mm.media_table_from_fixture(spark, sf_smoke, "video")
    frames = mm.frame_sample(vid, every_n=10)
    rows = frames.collect()
    meta = {r["media_id"]: r["meta"]["n_frames"] for r in vid.collect()}
    import collections
    per = collections.Counter(r["media_id"] for r in rows)
    for mid, n_frames in meta.items():
        assert per[mid] == (n_frames - 1) // 10 + 1
    assert all(abs(r["timestamp_sec"] - r["frame_idx"] / 25.0) < 1e-9
               for r in rows)


def test_audio_features(spark, media):
    out = mm.audio_features(media.limit(3)).collect()
    assert len(out) == 3
    for r in out:
        assert r["duration_sec"] > 0 and r["rms_energy"] >= 0


def test_real_decoder_gate():
    """The real codec path is stubbed behind NotImplementedError
    when Pillow is absent (contractual stub, not silent fake)."""
    if mm.HAVE_PIL:
        pytest.skip("PIL present — stub gate not applicable")
    with pytest.raises(NotImplementedError):
        mm.real_decode_image(b"xx", 4, 4)
