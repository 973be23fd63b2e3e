"""Multimodal column operators (SURVEY.md §2b extension surface).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. Decode goes through a small codec
chain, best-real-codec first:

1. **PIL** (JPEG/PNG/...), behind an import-try — activates wherever
   Pillow is installed; absent in this container.
2. **Built-in BMP**: a dependency-free pure-NumPy 24-bit uncompressed
   BMP decoder/encoder. A real codec (round-trips real pixel data), so
   the decode/resize paths are REAL and tested even with no PIL.
3. **The md5 fake** — QUARANTINED: only reached when a payload is not
   decodable by any real codec AND the caller allowed the fallback
   (``on_undecodable="fake"``). It exists for the oracle fixtures
   (DuckDB reproduces md5-derived stats bit-for-bit) and is labeled in
   the output (``decoder='fake'``).

What is real regardless of codec: the schema convention (payload binary
+ meta struct), Arrow batch shape through ``mapInPandas`` (bytes in,
arrays out), payload-pruned projections, and the 1→N frame expansion.

At 100 TB the payload column dominates I/O; every operator here projects
the payload only where the kernel needs bytes, so Parquet column pruning
drops it everywhere else.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder, if ever present
    from PIL import Image  # noqa: F401
    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False


# --------------------------------------------------------------- codecs

def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as 24-bit uncompressed BMP.
    Pure NumPy/struct — no image library required."""
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    # BMP stores bottom-up BGR with padded rows
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> Optional[np.ndarray]:
    """Decode a 24-bit uncompressed BMP to (H, W, 3) uint8 RGB; None if
    the payload is not such a BMP."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    if data_off < 14 + hdr_size:
        # a pixel-data offset inside the header is malformed; without
        # this check, header bytes would "decode" as pixels
        return None
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if len(payload) < data_off + row_size * h:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_off
    ).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def decode_image(payload: bytes) -> "tuple[Optional[np.ndarray], str]":
    """Best-real-codec decode to ((H, W, 3) uint8 RGB, codec name);
    (None, "") if nothing real can decode it (callers then choose fail
    vs quarantined fake)."""
    if HAS_PIL:
        try:
            with Image.open(io.BytesIO(payload)) as img:
                return np.asarray(img.convert("RGB")), "pil"
        except Exception:
            pass
    arr = decode_bmp(payload)
    return (arr, "bmp") if arr is not None else (None, "")


def resize_array(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather — vectorized NumPy."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[yi[:, None], xi[None, :]]


def _is_na(v) -> bool:
    """Null check that survives pandas' int->NaN promotion: a null
    media_id arrives in the Arrow batch as float NaN, not None."""
    return v is None or (isinstance(v, float) and v != v)


MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<format:string, n_bytes:long>"
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from any id column (test fixture):
    payload = utf-8 bytes of 'media-<id>', kind cycles image/audio/video.

    Pure column expressions — reproducible in SQL on any engine.
    """
    # pmod, not %: Spark's % keeps the dividend sign, so negative ids
    # would index 0 (error) or count from the array's end
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
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


def decode_image_meta(media: DataFrame, on_undecodable: str = "fake") -> DataFrame:
    """Decode image payloads to (width, height, mean_luma, decoder).

    Real codecs first (PIL when installed, built-in BMP always); the
    mean luma is Rec.601 over the decoded pixels. Payloads no real codec
    accepts are handled per ``on_undecodable``:

    - ``"fake"`` (default): the quarantined md5-derived stand-in, marked
      ``decoder='fake'`` in the output — what the oracle fixtures use.
    - ``"error"``: raise, fail-fast pipelines.
    - ``"skip"``: drop the row.
    """
    assert on_undecodable in ("fake", "error", "skip")
    out_schema = (
        "media_id long, width int, height int, mean_luma double, decoder string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, ws, hs, ls, decs = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if _is_na(mid) or _is_na(p):
                    # nullable schema fields: route through the same
                    # undecodable policy instead of a raw TypeError
                    if on_undecodable == "error":
                        raise ValueError(
                            f"media_id={mid!r}: null media_id or payload"
                        )
                    if _is_na(mid) or on_undecodable == "skip":
                        continue
                    raw, arr, dec = b"", None, "fake"
                else:
                    raw = bytes(p)
                    arr, dec = decode_image(raw)
                if arr is not None:
                    luma = float(
                        np.einsum(
                            "ijk,k->",
                            arr.astype(np.float64),
                            np.array([0.299, 0.587, 0.114]),
                        )
                        / (arr.shape[0] * arr.shape[1] * 255.0)
                    )
                    w, h, l = arr.shape[1], arr.shape[0], round(luma, 6)
                elif on_undecodable == "error":
                    raise ValueError(
                        f"media_id={mid!r}: payload not decodable by any "
                        "real codec (PIL "
                        + ("present" if HAS_PIL else "absent")
                        + ", BMP tried)"
                    )
                elif on_undecodable == "skip":
                    continue
                else:
                    w, h, l = _fake_decode_stats(raw)
                    dec = "fake"
                ids.append(int(mid)); ws.append(int(w)); hs.append(int(h))
                ls.append(float(l)); decs.append(dec)
            if not ids:
                continue  # empty frame would emit untyped columns
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_luma": ls,
                    "decoder": decs,
                }
            )

    return media.where(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )


def extract_image_features(
    media: DataFrame, dim: int = 16, kinds: tuple = ("image",)
) -> DataFrame:
    """Fake feature extractor: payload → deterministic unit vector of
    ``dim`` floats, every component an md5 derivation (same recipe as
    the fake decode path, so a SQL oracle can replicate it bit-for-bit:
    component i is ``hex4(md5(payload || '-f' || i)) / 65535 * 2 - 1``
    in double, the vector L2-normalized with a SEQUENTIAL double sum —
    summation order pinned so engines agree to the ulp — then cast to
    float32). The real version would run an ONNX/torch encoder over
    Arrow batches — identical plumbing, identical schema
    ``(media_id, feature: array<float>)``.

    ``kinds`` filters which media kinds get encoded (default: images
    only, like the sibling image operators — an image encoder fed audio
    payloads would silently pollute a similarity index). Pass
    ``kinds=None`` for a multimodal encoder that embeds every kind."""
    out_schema = "media_id long, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, feats = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if _is_na(mid) or _is_na(p):
                    continue  # nullable fields: no feature for null media
                u = []
                for i in range(dim):
                    h = hashlib.md5(bytes(p) + b"-f%d" % i).hexdigest()
                    u.append(int(h[:4], 16) / 65535.0 * 2.0 - 1.0)
                s = 0.0
                for x in u:  # sequential: the oracle's ordered frame matches
                    s += x * x
                norm = max(math.sqrt(s), 1e-12)
                v = np.asarray([x / norm for x in u], dtype=np.float32)
                ids.append(int(mid))
                feats.append([float(x) for x in v])
            if not ids:
                continue  # empty frame would emit untyped columns
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"), "feature": feats}
            )

    if kinds is not None:
        media = media.where(F.col("kind").isin(list(kinds)))
    return media.select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )


def resize_images(
    media: DataFrame, width: int, height: int, on_undecodable: str = "error"
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (BMP out).

    A real transform end-to-end: PIL decodes when installed, the
    built-in BMP codec always works, the resize is a vectorized NumPy
    gather, and the output payload is a valid BMP any viewer opens.
    Undecodable payloads: ``"error"`` (default) raises with the
    media_id; ``"skip"`` drops the row.
    """
    assert on_undecodable in ("error", "skip")
    out_schema = (
        "media_id long, payload binary, "
        "meta struct<format:string, n_bytes:long, width:int, height:int>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, payloads, metas = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                arr = (
                    decode_image(bytes(p))[0]
                    if not (_is_na(mid) or _is_na(p))
                    else None
                )
                if arr is None:
                    if on_undecodable == "skip":
                        continue
                    raise ValueError(
                        f"media_id={mid!r}: payload not decodable by any "
                        "real codec (PIL "
                        + ("present" if HAS_PIL else "absent")
                        + ", BMP tried)"
                    )
                out = encode_bmp(resize_array(arr, width, height))
                ids.append(int(mid))
                payloads.append(out)
                metas.append(
                    {
                        "format": "bmp",
                        "n_bytes": len(out),
                        "width": width,
                        "height": height,
                    }
                )
            if not ids:
                continue  # empty frame would emit untyped columns
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.where(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )


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
                if _is_na(mid) or _is_na(p):
                    continue  # nullable fields: no frames for null media
                raw = bytes(p)
                n_frames = 30 + int(hashlib.md5(raw).hexdigest()[:4], 16) % 300
                for fi in range(0, n_frames, every_n):
                    out_ids.append(int(mid))
                    out_idx.append(fi)
                    # payload || '-' || frame_idx: engine-portable identity
                    out_md5.append(
                        hashlib.md5(raw + b"-" + str(fi).encode()).hexdigest()
                    )
            if not out_ids:
                continue  # empty frame would emit untyped columns
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return media.where(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )
