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
    # covered in more detail by test_decode_image_compressed_needs_pil;
    # kept as the minimal seam contract: compressed bytes either decode
    # (PIL present) or raise NotImplementedError, never garbage.
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\xff\xd8\xff\xe0")


def test_bmp_roundtrip_including_padding():
    """Encoder and decoder are independent paths: pixel-exact round-trip
    for widths that do and don't need row padding."""
    import numpy as np

    from cellbase_spark.operators.multimodal import decode_bmp, decode_image, encode_bmp

    rng = np.random.default_rng(7)
    for h, w in [(4, 6), (3, 4), (5, 7), (1, 1)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        data = encode_bmp(img)
        assert data[:2] == b"BM"
        out = decode_bmp(data)
        assert out.shape == (h, w, 3)
        assert (out == img).all()
        assert (decode_image(data) == img).all()  # dispatch path


def test_ppm_decode():
    import numpy as np

    from cellbase_spark.operators.multimodal import decode_image

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    out = decode_image(data)
    assert out.shape == (2, 3, 3)
    assert (out == img).all()


def test_decode_image_compressed_needs_pil():
    import pytest

    from cellbase_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; compressed path exercised elsewhere")
    except ImportError:
        pass
    # PNG now decodes natively (stdlib-zlib codec); the PIL seam is for
    # formats without a native path, e.g. JPEG
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0not-really-a-jpeg")
    # a malformed PNG fails loudly in the native codec, never silently
    import struct as _struct

    with pytest.raises((ValueError, NotImplementedError, _struct.error)):
        decode_image(b"\x89PNG\r\n\x1a\nnot-really-a-png")


def test_wav_roundtrip_and_chunk_skip():
    """encode_wav/decode_wav are independent paths: sample-exact
    round-trip incl. rate, and an odd-length unknown chunk between fmt
    and data is skipped with RIFF word alignment."""
    import struct as st

    import numpy as np

    from cellbase_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32767, 777, dtype=np.int16)
    back, rate = decode_wav(encode_wav(s, 8000))
    assert np.array_equal(s, back) and rate == 8000
    raw = encode_wav(s)
    injected = raw[:12] + b"LIST" + st.pack("<I", 3) + b"abc\x00" + raw[12:]
    back2, _ = decode_wav(injected)
    assert np.array_equal(s, back2)
    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_y4m_roundtrip_and_header_tolerance():
    """encode_y4m/decode_y4m round-trip frame-exact; unknown header
    tokens are skipped; chroma-subsampled streams hit the documented
    seam."""
    import numpy as np
    import pytest

    from cellbase_spark.operators.multimodal import decode_y4m, encode_y4m

    rng = np.random.default_rng(11)
    v = rng.integers(0, 256, (5, 6, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_y4m(encode_y4m(v)), v)
    raw = encode_y4m(v).replace(b"C444\n", b"C444 XCUSTOM=1\n")
    assert np.array_equal(decode_y4m(raw), v)
    with pytest.raises(NotImplementedError):
        decode_y4m(encode_y4m(v).replace(b"C444", b"C420"))
    with pytest.raises(ValueError):
        decode_y4m(b"NOTY4M W1 H1\n")
