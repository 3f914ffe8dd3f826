"""Multimodal (binary media) column operators.

A 100 TB training-data pipeline carries image/audio/video payloads as
opaque `binary` columns with typed metadata beside them. The reference
has no media handling (its only binary input is the citable Zip,
reference R/finbif_geo_convert.R:80-86 via finbif); these operators are
the graft's training-data surface. The Spark-side plumbing — schemas,
Arrow batch shapes, mapInPandas iterator contract, per-row fan-out for
frame sampling — is real and tested; the *codec* step is a
deterministic stand-in because no image/audio library exists in this
container (see `_HAVE_PIL` gate below).

Design rules:
- metadata that a header parse would yield (byte length, fingerprint,
  dimensions) is derived JVM-side with built-in functions where
  possible (octet_length/md5/substring run in whole-stage codegen);
- batch-level work (decode, feature extraction, frame sampling) runs in
  `mapInPandas` so each Arrow batch of blobs is processed as one numpy
  pass — never per-row Python over the driver;
- every stub is deterministic in the blob bytes alone, so results are
  reproducible across partitionings and resumable runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

N_FEATURES = 8
FRAME_BYTES = 64
MAX_FRAMES = 8


# ---------------------------------------------------------------------------
# metadata (pure JVM-side columns — no Python at all)
# ---------------------------------------------------------------------------


def media_metadata(df: DataFrame, col: str = "html", key: str = "url") -> DataFrame:
    """Typed metadata beside an opaque binary column: byte length,
    content fingerprint, and stub-decoded dimensions.

    Everything here is built-in-function arithmetic over the blob:
    Catalyst keeps it inside whole-stage codegen, and at 100 TB the scan
    reads only (key, col) thanks to column pruning. Width/height mirror
    `decode_image_stub` exactly so the two paths cross-check."""
    md5 = F.md5(F.col(col))
    n_bytes = F.octet_length(F.col(col)).cast("long")
    return df.select(
        F.col(key),
        n_bytes.alias("n_bytes"),
        (F.lit(1) + n_bytes % F.lit(640)).cast("int").alias("width"),
        (
            F.lit(1) + F.conv(F.substring(md5, 1, 2), 16, 10).cast("long") % F.lit(480)
        ).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.conv(F.substring(md5, 1, 14), 16, 10).cast("long").alias("fp"),
    )


# ---------------------------------------------------------------------------
# decode / feature-extract (mapInPandas, Arrow-batched)
# ---------------------------------------------------------------------------

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_batch(blobs: pd.Series, urls: pd.Series) -> pd.DataFrame:
    """One Arrow batch of blobs -> decoded metadata + feature vector.

    STUB CODEC: with no real image library available, "decoding" is a
    deterministic function of the bytes (md5-seeded), shaped exactly
    like a real decoder's output. A production build flips `_HAVE_PIL`
    and replaces only the body of this function — schema, batching and
    partitioning are unchanged."""
    if _HAVE_PIL:  # pragma: no cover - real codec path, not in container
        raise NotImplementedError("real PIL decode not wired in this build")
    widths = np.empty(len(blobs), dtype=np.int32)
    heights = np.empty(len(blobs), dtype=np.int32)
    feats: list[np.ndarray] = []
    for i, b in enumerate(blobs):
        d = hashlib.md5(b).digest()
        widths[i] = 1 + len(b) % 640
        heights[i] = 1 + d[0] % 480
        feats.append(np.frombuffer(d[:N_FEATURES], dtype=np.uint8).astype(np.float32) / 255.0)
    return pd.DataFrame(
        {
            "url": urls,
            "width": widths,
            "height": heights,
            "channels": np.full(len(blobs), 3, dtype=np.int32),
            "features": feats,
        }
    )


def decode_image_stub(df: DataFrame, col: str = "html", key: str = "url") -> DataFrame:
    """Decode + feature-extract each blob (stub codec, real plumbing)."""
    src = df.select(F.col(key).alias("url"), F.col(col).alias("_blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf["_blob"], pdf["url"])

    return src.mapInPandas(run, DECODE_SCHEMA)


def resize_stub(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata transform: clamp the longer side to `max_side`
    preserving aspect ratio (integer floor, min 1). Pure column
    arithmetic — a real resize would be a mapInPandas over the pixel
    blob with this same width/height contract."""
    w, h = F.col("width"), F.col("height")
    scale = F.lit(float(max_side)) / F.greatest(w, h).cast("double")
    clamped = F.when(F.greatest(w, h) <= max_side, F.lit(1.0)).otherwise(scale)
    return decoded.withColumn(
        "out_width", F.greatest(F.floor(w * clamped), F.lit(1)).cast("int")
    ).withColumn(
        "out_height", F.greatest(F.floor(h * clamped), F.lit(1)).cast("int")
    )


# ---------------------------------------------------------------------------
# frame sampling (per-row fan-out inside mapInPandas)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames_stub(
    df: DataFrame,
    col: str = "html",
    key: str = "url",
    frame_bytes: int = FRAME_BYTES,
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Treat the blob as a frame stream: emit up to `max_frames`
    fixed-size byte windows per row as (url, frame_idx, frame_md5).

    The fan-out (one input row -> n output rows) happens inside the
    Arrow batch, so a 100 TB scan stays one pass with no explode
    shuffle; downstream dedup/groupBy shuffles only the small frame
    table. STUB: a real build would seek container keyframes here."""
    src = df.select(F.col(key).alias("url"), F.col(col).alias("_blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for u, b in zip(pdf["url"], pdf["_blob"]):
                n = min(max_frames, len(b) // frame_bytes)
                for k in range(n):
                    urls.append(u)
                    idxs.append(k)
                    hashes.append(
                        hashlib.md5(b[k * frame_bytes : (k + 1) * frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "url": urls,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_md5": hashes,
                }
            )

    return src.mapInPandas(run, FRAME_SCHEMA)
