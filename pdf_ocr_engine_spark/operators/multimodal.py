"""Multimodal column plumbing — image/audio/video as opaque binary + metadata.

Design: media travels as ``binary`` columns with a typed metadata struct
``(media_type, n_bytes, width, height, duration_ms)``; heavy decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages with the same shape as the extraction operator (iterator init →
per-batch numpy work → struct columns out).

The actual codecs (PIL/ffmpeg) are NOT available in this environment, so the
decode step is **stubbed behind a deterministic fake codec**: payloads
beginning with the fake magic ``FAKEIMG1``/``FAKEAUD1`` carry a tiny header
``(width:uint16, height:uint16)`` / ``(duration_ms:uint32)`` that the "decoder"
parses; anything else raises ``NotImplementedError`` (clearly marked).  The
Spark-side plumbing — schema, batch shape, partitioning, UDF signatures — is
real and tested, so swapping the fake parser for PIL is a one-function change.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

IMG_MAGIC = b"FAKEIMG1"
AUD_MAGIC = b"FAKEAUD1"
VID_MAGIC = b"FAKEVID1"

MEDIA_META_SCHEMA = StructType([
    StructField("media_type", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])


def encode_fake_image(width: int, height: int, payload: bytes = b"") -> bytes:
    return IMG_MAGIC + struct.pack("<HH", width, height) + payload


def encode_fake_audio(duration_ms: int, payload: bytes = b"") -> bytes:
    return AUD_MAGIC + struct.pack("<I", duration_ms) + payload


def encode_fake_video(duration_ms: int, payload: bytes = b"") -> bytes:
    return VID_MAGIC + struct.pack("<I", duration_ms) + payload


def decode_media_header(data: bytes | None) -> tuple[str, int | None, int | None, int | None]:
    """(media_type, width, height, duration_ms) from the fake-codec header.

    A real deployment replaces this with PIL/pyav probing — the UDF batch
    shape around it is unchanged.
    """
    if not data:
        return ("empty", None, None, None)
    try:
        if data[:8] == IMG_MAGIC:
            w, h = struct.unpack("<HH", data[8:12])
            return ("image", w, h, None)
        if data[:8] == AUD_MAGIC:
            (ms,) = struct.unpack("<I", data[8:12])
            return ("audio", None, None, ms)
        if data[:8] == VID_MAGIC:
            (ms,) = struct.unpack("<I", data[8:12])
            return ("video", None, None, ms)
    except struct.error:
        # magic present but header truncated: a corrupt row is DATA, never a
        # task failure (same errors-as-values contract as extraction)
        return ("corrupt", None, None, None)
    return ("unknown", None, None, None)


def decode_image_pixels(data: bytes):  # pragma: no cover - stub
    """STUB: real pixel decode needs an image library not present in this
    environment.  The metadata path (:func:`decode_media_header`) and all
    Spark plumbing work without it."""
    raise NotImplementedError(
        "pixel decode requires an image codec (PIL/pyspark-ml image); "
        "this environment ships none — plug one in here")


def media_metadata(df: DataFrame, media_col: str = "media",
                   id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched header probe: (id, media_type, n_bytes, width, height,
    duration_ms).  Narrow, no shuffle; the 100 TB plan runs this as the cheap
    sniff stage before any expensive decode (same plan shape as extraction
    stage 1)."""
    out_schema = StructType(
        [StructField(id_col, LongType(), False)] + list(MEDIA_META_SCHEMA))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            metas = [decode_media_header(b) for b in batch[media_col]]
            yield pd.DataFrame({
                id_col: batch[id_col].astype("int64"),
                "media_type": [m[0] for m in metas],
                "n_bytes": pd.Series(
                    [len(b) if b is not None else 0 for b in batch[media_col]],
                    dtype="int64"),
                "width": pd.array([m[1] for m in metas], dtype="Int32"),
                "height": pd.array([m[2] for m in metas], dtype="Int32"),
                "duration_ms": pd.array([m[3] for m in metas], dtype="Int32"),
            })

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling plan: one input row per video → one output row
    per sampled frame timestamp (``ts_ms = 0, every_ms, 2*every_ms, … <
    duration``).  The row explosion inside ``mapInPandas`` is exactly how
    extraction explodes pages; the *pixel* grab at each timestamp is the
    stubbed codec step (:func:`decode_frame_pixels`).  Narrow — no shuffle;
    at scale the fan-out factor (duration/every_ms) is the memory knob, so
    long videos should be re-batched upstream by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""
    out_schema = StructType([
        StructField(id_col, LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
    ])

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            ids: list[int] = []
            idxs: list[int] = []
            tss: list[int] = []
            for did, blob in zip(batch[id_col], batch[media_col]):
                mtype, _w, _h, ms = decode_media_header(blob)
                if mtype != "video" or not ms:
                    continue
                n = (int(ms) + every_ms - 1) // every_ms
                ids.extend([int(did)] * n)
                idxs.extend(range(n))
                tss.extend(range(0, n * every_ms, every_ms))
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "ts_ms": pd.Series(tss, dtype="int64"),
            })

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def decode_frame_pixels(data: bytes, ts_ms: int):  # pragma: no cover - stub
    """STUB: real frame decode needs a video codec (pyav/ffmpeg) not present
    in this environment.  The sampling plan (:func:`frame_sample`) and all
    Spark plumbing work without it."""
    raise NotImplementedError(
        "frame pixel decode requires a video codec — plug pyav in here")


def resize_images(df: DataFrame, width: int, height: int,
                  media_col: str = "media"):  # pragma: no cover - stub
    """STUB: image resize — the plan shape is identical to
    :func:`media_metadata` (narrow mapInPandas, binary in → binary out with
    updated header dims); the pixel resample inside needs PIL, which this
    environment doesn't ship.  Plug ``Image.open(...).resize(...)`` into the
    batch loop; everything else (schema, batching, partitioning) is the
    tested path."""
    raise NotImplementedError("image resize requires PIL — plug it in here")


def embed_media(df: DataFrame, dim: int = 64,
                media_col: str = "media"):  # pragma: no cover - stub
    """STUB: media feature extraction (image/audio embeddings) — iterator-
    form mapInPandas with per-task model init (exactly the extract
    operator's shape, ``operators/extract.py``), emitting
    ``array<float>[dim]`` for the ANN/dedup operators downstream.  Needs a
    model runtime this environment doesn't ship."""
    raise NotImplementedError(
        "media embedding requires a model runtime — plug it into the "
        "iterator-form mapInPandas init point")
