"""Multimodal binary-column plumbing (operators/multimodal.py).

The oracle already hash-checks the values (q_mm_* keys); these tests pin
the Spark-side contracts: BinaryType payload, mapInPandas schemas, the
one-asset-to-many-frames expansion, and the real-codec seam failing
loudly where codec libs are absent.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql.types import BinaryType

from cellbase_spark.io import load_table
from cellbase_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return mm.with_binary_payload(load_table(spark, sf_dir, "documents"))


def test_payload_is_binary(assets):
    assert isinstance(assets.schema["payload"].dataType, BinaryType)


def test_decode_meta_matches_python(assets):
    row = mm.decode_assets(assets).orderBy("doc_id").first()
    src = assets.orderBy("doc_id").select("doc_id", "payload").first()
    payload = bytes(src["payload"])
    assert row["doc_id"] == src["doc_id"]
    assert row["n_bytes"] == len(payload)
    assert row["head_byte"] == payload[0]
    assert row["width"] == len(payload) % 640
    assert row["height"] == (payload[0] * 7 + len(payload)) % 480


def test_frame_sample_expansion_and_fingerprint(assets):
    frames = mm.sample_frames(assets, n_frames=4, frame_len=16)
    one = frames.where(frames.doc_id == frames.first()["doc_id"]).orderBy("frame_idx").collect()
    assert [f["frame_idx"] for f in one] == list(range(len(one)))
    assert 1 <= len(one) <= 4
    src = assets.where(assets.doc_id == one[0]["doc_id"]).first()
    payload = bytes(src["payload"])
    stride = max(len(payload) // 4, 1)
    for f in one:
        off = f["frame_idx"] * stride
        chunk = payload[off : off + 16]
        assert f["frame_off"] == off
        assert f["frame_len"] == len(chunk)
        assert f["frame_md5"] == hashlib.md5(chunk).hexdigest()


def test_real_decoder_seam_raises_without_codecs():
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\x89PNG\r\n")
