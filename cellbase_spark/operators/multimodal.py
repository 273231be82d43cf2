"""Multimodal (binary-column) operators for training-data pipelines.

Model: an image/audio/video asset is an opaque BinaryType column plus a
typed metadata struct, exactly as a 100 TB multimodal corpus stores it
(parquet binary + sidecar fields). The compute pattern is mapInPandas:
Arrow ships each partition to Python in record batches, pandas/numpy works
on the raw bytes vectorized, and the iterator contract keeps memory
bounded per batch regardless of table size.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernel is split:
- `decode_image_real` raises NotImplementedError behind an import-try —
  the documented seam where a real deployment plugs PIL/torchvision in;
- `fake_decode_meta` / `sample_frames` are deterministic byte-level
  kernels (length, head byte, md5 fingerprints of frame slices) so the
  plumbing — schema, batching, one-row-to-many-frames expansion,
  partition-parallelism — is real and oracle-checkable end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema of the stubbed per-asset "decode": byte-derived typed metadata.
DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("head_byte", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_off", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary column (UTF-8 bytes of the text stand in
    for an image/audio payload; at ingest this would be the real asset)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8").cast(BinaryType()))


def decode_image_real(payload: bytes):  # pragma: no cover - no codec libs here
    """The real-decoder seam. Plug PIL in where available."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "use fake_decode_meta for the byte-level pipeline"
        ) from exc
    raise NotImplementedError("wire Image.open(io.BytesIO(payload)) here")


def fake_decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per-asset metadata from raw bytes.

    width/height are a deterministic stand-in for a codec's output (pure
    byte arithmetic, so the DuckDB oracle can re-derive them); the Arrow
    round-trip, batch iteration, and output schema are the real thing.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        head = payloads.map(lambda b: b[0] if len(b) else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "head_byte": head,
                "width": (n_bytes % 640).astype("int32"),
                "height": ((head * 7 + n_bytes) % 480).astype("int32"),
            }
        )


def decode_assets(df: DataFrame) -> DataFrame:
    """Binary column -> typed metadata rows via mapInPandas (one output
    row per asset; partition-parallel, memory bounded per Arrow batch)."""
    return df.select("doc_id", "payload").mapInPandas(
        fake_decode_meta, schema=DECODED_META_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_bytes", IntegerType()),
        StructField("resized_bytes", IntegerType()),
        StructField("resized_md5", StringType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_sum", LongType()),
        StructField("byte_min", IntegerType()),
        StructField("byte_max", IntegerType()),
        StructField("byte_mean", DoubleType()),
    ]
)


def resize_assets(df: DataFrame, factor: int = 4) -> DataFrame:
    """'Resize' stub: keep every factor-th byte of the payload (the
    byte-level stand-in for image downsampling), fingerprint the result.
    Same mapInPandas shape a real resize kernel (PIL thumbnail) would use:
    bytes in, smaller bytes out, per-batch vectorized."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            small = pdf["payload"].map(lambda b: bytes(b)[::factor])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": pdf["payload"].map(len),
                    "resized_bytes": small.map(len),
                    "resized_md5": small.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(kernel, schema=RESIZED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction stub: byte-level statistics per asset (numpy
    vectorized inside the Arrow batch) — where a real pipeline computes
    embeddings/spectrograms. Integer sums are exact, mean is one IEEE
    division — oracle-reproducible."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(bytes(b), dtype=np.uint8) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_sum": [int(a.sum()) for a in arrs],
                    "byte_min": [int(a.min()) if len(a) else 0 for a in arrs],
                    "byte_max": [int(a.max()) if len(a) else 0 for a in arrs],
                    "byte_mean": [
                        (int(a.sum()) / len(a)) if len(a) else 0.0 for a in arrs
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(kernel, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, frame_len: int = 16) -> DataFrame:
    """One-row-to-many 'frame sampling' over the binary payload: split the
    byte stream into n_frames fixed-stride slices and fingerprint each —
    the shape of video frame extraction (1 asset row -> K frame rows),
    with md5 standing in for the decoded frame tensor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_off": [],
                "frame_len": [],
                "frame_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                total = len(payload)
                stride = max(total // n_frames, 1)
                for i in range(n_frames):
                    off = i * stride
                    if off >= total:
                        break
                    chunk = payload[off : off + frame_len]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(off)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(kernel, schema=FRAME_SCHEMA)
