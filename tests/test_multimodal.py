"""Multimodal column plumbing: schema, batch shapes, determinism, stubs."""

import pytest
from pyspark.sql import functions as F

from vamana_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(documents):
    return mm.attach_fake_media(documents).cache()


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,"
        "meta:struct<format:string,n_bytes:bigint>>"
    )
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_fingerprint_matches_md5(media):
    import hashlib

    rows = mm.media_fingerprint(media).limit(5).collect()
    for r in rows:
        want = hashlib.md5(f"media-{r.media_id}".encode()).hexdigest()
        assert r.content_md5 == want
        assert r.n_bytes == len(f"media-{r.media_id}")


def test_decode_image_meta_deterministic(media):
    a = {r.media_id: (r.width, r.height, r.mean_luma)
         for r in mm.decode_image_meta(media).collect()}
    b = {r.media_id: (r.width, r.height, r.mean_luma)
         for r in mm.decode_image_meta(media).collect()}
    assert a == b and len(a) > 0
    for w, h, luma in a.values():
        assert 16 <= w < 2064 and 16 <= h < 2064 and 0.0 <= luma <= 1.0
    # only image rows decoded
    n_images = media.where(F.col("kind") == "image").count()
    assert len(a) == n_images


def test_extract_features_unit_vectors(media):
    import numpy as np

    rows = mm.extract_image_features(media, dim=16).limit(10).collect()
    for r in rows:
        assert len(r.feature) == 16
        assert np.linalg.norm(np.array(r.feature)) == pytest.approx(1.0, abs=1e-5)


def test_sample_video_frames_expansion(media):
    frames = mm.sample_video_frames(media, every_n=30)
    rows = frames.collect()
    n_videos = media.where(F.col("kind") == "video").count()
    assert len(rows) >= n_videos  # 1→N expansion
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in per.values():
        assert sorted(idxs) == list(range(0, max(idxs) + 1, 30))


def test_bmp_codec_roundtrip():
    """Built-in BMP codec: encode->decode is identity on real pixel data
    (odd width exercises row padding)."""
    import numpy as np

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(13, 31, 3), dtype=np.uint8)
    back = mm.decode_bmp(mm.encode_bmp(arr))
    assert back is not None and np.array_equal(back, arr)


@pytest.fixture(scope="module")
def real_media(spark):
    """Media table whose payloads are REAL images (built-in BMP codec)."""
    import numpy as np

    rows = []
    for i in range(12):
        rng = np.random.default_rng(i)
        arr = rng.integers(0, 256, size=(8 + i, 10 + i, 3), dtype=np.uint8)
        rows.append((i, "image", bytearray(mm.encode_bmp(arr)),
                     {"format": "bmp", "n_bytes": 0}))
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_real_decode_through_spark(real_media):
    """decode_image_meta runs the REAL codec path for decodable payloads:
    true dimensions, Rec.601 luma, decoder label != 'fake'."""
    import numpy as np

    out = {r.media_id: r for r in mm.decode_image_meta(real_media).collect()}
    assert len(out) == 12
    for i, r in out.items():
        assert (r.width, r.height) == (10 + i, 8 + i)
        assert r.decoder in ("pil", "bmp")
        rng = np.random.default_rng(i)
        arr = rng.integers(0, 256, size=(8 + i, 10 + i, 3), dtype=np.uint8)
        want = float(
            np.einsum("ijk,k->", arr.astype(np.float64),
                      np.array([0.299, 0.587, 0.114]))
            / (arr.shape[0] * arr.shape[1] * 255.0)
        )
        assert r.mean_luma == pytest.approx(want, abs=1e-5)


def test_resize_images_end_to_end(real_media):
    """resize_images produces valid BMP payloads at the target size."""
    out = mm.resize_images(real_media, 6, 5).collect()
    assert len(out) == 12
    for r in out:
        arr = mm.decode_bmp(bytes(r.payload))
        assert arr is not None and arr.shape == (5, 6, 3)
        assert r.meta.format == "bmp" and r.meta.n_bytes == len(r.payload)


def test_fake_decoder_is_quarantined(media):
    """Fixture payloads (not decodable by any real codec) fall through to
    the md5 stand-in ONLY under on_undecodable='fake', and are labeled."""
    labeled = mm.decode_image_meta(media).select("decoder").distinct().collect()
    assert {r.decoder for r in labeled} == {"fake"}
    assert mm.decode_image_meta(media, on_undecodable="skip").count() == 0
    with pytest.raises(Exception):
        mm.decode_image_meta(media, on_undecodable="error").collect()
    with pytest.raises(Exception):
        mm.resize_images(media, 4, 4).collect()


@pytest.mark.skipif(not mm.HAS_PIL, reason="PIL not installed")
def test_pil_decode_png(spark):
    """When Pillow is present the PIL branch decodes real PNGs."""
    import io

    import numpy as np
    from PIL import Image

    arr = np.zeros((9, 7, 3), dtype=np.uint8)
    arr[:, :, 0] = 200
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), {"format": "png", "n_bytes": 0})],
        mm.MEDIA_SCHEMA,
    )
    r = mm.decode_image_meta(df).first()
    assert (r.width, r.height, r.decoder) == (7, 9, "pil")


def test_null_media_rows_follow_policy(spark):
    """r6 review: null payload / media_id must route through the
    on_undecodable policy, not crash the worker with a TypeError."""
    rows = [
        (1, "image", b"not-an-image", {"format": "x", "n_bytes": 12}),
        (2, "image", None, {"format": "x", "n_bytes": 0}),
        (None, "image", b"also-bad", {"format": "x", "n_bytes": 8}),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    # fake: decodable-or-fake rows emit; null media_id is skipped
    out = mm.decode_image_meta(df, on_undecodable="fake").collect()
    assert {r.media_id for r in out} == {1, 2}
    assert all(r.decoder == "fake" for r in out)
    # skip: only rows with BOTH fields non-null even reach decode
    assert mm.decode_image_meta(df, on_undecodable="skip").count() == 0
    # error: raises instead of TypeError
    with pytest.raises(Exception):
        mm.decode_image_meta(df, on_undecodable="error").collect()
    # feature extractor / frame sampler drop null rows instead of dying
    assert mm.extract_image_features(df).count() == 1
    vid = spark.createDataFrame(
        [(1, "video", None, {"format": "x", "n_bytes": 0})], mm.MEDIA_SCHEMA
    )
    assert mm.sample_video_frames(vid).count() == 0


def test_attach_fake_media_negative_ids(spark):
    """r6 review: Spark's % keeps the dividend sign — negative ids must
    still cycle kinds instead of erroring on index 0."""
    df = spark.createDataFrame(
        [(-1,), (-2,), (-3,), (0,), (1,)], "doc_id long"
    )
    kinds = {r.media_id: r.kind for r in mm.attach_fake_media(df).collect()}
    assert set(kinds.values()) <= {"image", "audio", "video"}
    assert kinds[-3] == kinds[0]  # pmod cycles consistently


def test_extract_features_filters_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "image", b"img", {"format": "x", "n_bytes": 3}),
            (2, "audio", b"aud", {"format": "x", "n_bytes": 3}),
            (3, "video", b"vid", {"format": "x", "n_bytes": 3}),
        ],
        mm.MEDIA_SCHEMA,
    )
    assert {r.media_id for r in mm.extract_image_features(df).collect()} == {1}


def test_decode_bmp_rejects_header_offset_inside_header():
    """r6 review: data_off pointing inside the header must not 'decode'
    header bytes as pixels."""
    import struct

    import numpy as np

    good = mm.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    assert mm.decode_bmp(good) is not None
    bad = bytearray(good)
    struct.pack_into("<I", bad, 10, 0)  # data_off = 0
    assert mm.decode_bmp(bytes(bad)) is None
