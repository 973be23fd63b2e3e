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


def test_resize_stub_fails_fast(media):
    if mm.HAS_PIL:
        pytest.skip("PIL present")
    with pytest.raises(NotImplementedError):
        mm.resize_images(media, 64, 64)
