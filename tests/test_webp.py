"""WebP lossless (VP8L) subset codec laws (round 11, operators/webp.py).

Round-trip exactness across content shapes and channel counts, the
prefix-code form boundaries (simple 1-2 symbol codes vs normal codes
through the code-length code), backref compression, and loud seams for
the four unimplemented features.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_CODEC_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _want_rgba(img):
    if img.shape[2] == 4:
        return img
    return np.concatenate(
        [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2
    )


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([3, 4]),
    refs=st.booleans(),
    shape=st.sampled_from(["rand", "const", "two", "striped", "formula"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@_CODEC_SETTINGS
def test_webp_roundtrip_property(h, w, ch, refs, shape, seed):
    """ANY image x {RGB, RGBA} x {backrefs on/off} x content shapes
    (random, constant, two-color, row-striped, formula): VP8L is
    lossless — decode(encode) pixel-EXACT. Constant and two-color
    content drives the simple prefix-code form; random content drives
    normal codes with deep Huffman trees; striped content drives row
    backrefs (direct distance codes)."""
    from cellbase_spark.operators.webp import decode_webp, encode_webp

    rng = np.random.default_rng(seed)
    if shape == "rand":
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    elif shape == "const":
        img = np.full((h, w, ch), int(rng.integers(0, 256)), np.uint8)
    elif shape == "two":
        a = rng.integers(0, 256, ch)
        b = rng.integers(0, 256, ch)
        mask = rng.random((h, w, 1)) < 0.5
        img = np.where(mask, a, b).astype(np.uint8)
    elif shape == "striped":
        img = np.repeat(
            rng.integers(0, 256, (1, w, ch), dtype=np.uint8), h, axis=0
        )
    else:
        y, x, c = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(ch), indexing="ij"
        )
        img = ((13 * y + 7 * x + 5 * c + seed) % 256).astype(np.uint8)
    out = decode_webp(encode_webp(img, use_backrefs=refs))
    assert np.array_equal(out, _want_rgba(img))


def test_webp_backrefs_compress_and_seams_are_loud():
    """Row backrefs beat literal-only coding on striped content, and
    each unimplemented feature (transforms, color cache, meta prefix,
    the 2D distance map, lossy VP8) refuses with NotImplementedError
    rather than decoding wrong."""
    from cellbase_spark.operators.webp import (
        _LsbBitWriter,
        decode_webp,
        encode_webp,
    )

    rng = np.random.default_rng(7)
    stripe = np.repeat(
        rng.integers(0, 256, (1, 40, 3), dtype=np.uint8), 25, axis=0
    )
    assert len(encode_webp(stripe)) < len(
        encode_webp(stripe, use_backrefs=False)
    )

    # craft headers flipping each seam bit in turn
    def header(transform=0, cache=0, meta=0):
        w = _LsbBitWriter()
        w.write(3, 14)  # width 4
        w.write(3, 14)  # height 4
        w.write(0, 1)
        w.write(0, 3)
        w.write(transform, 1)
        if not transform:
            w.write(cache, 1)
            if not cache:
                w.write(meta, 1)
        import struct

        payload = b"\x2f" + bytes(w.buf) + b"\x00" * 8
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    for kw, frag in [
        (dict(transform=1), "transforms"),
        (dict(cache=1), "color cache"),
        (dict(meta=1), "meta prefix"),
    ]:
        with pytest.raises(NotImplementedError, match=frag):
            decode_webp(header(**kw))
    import struct

    lossy = (
        b"RIFF" + struct.pack("<I", 12) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(lossy)


def test_webp_prefixed_integer_coding_is_exact_inverse():
    """The LZ77 length/distance integer coding: encoder's
    (code, extra_bits, extra) round-trips through the decoder's
    formula for every value 1..5000 (covers all extra-bit widths the
    subset emits)."""
    from cellbase_spark.operators.webp import (
        _LsbBitReader,
        _LsbBitWriter,
        _prefixed_code_for,
        _read_prefixed_value,
    )

    for v in range(1, 5001):
        code, ebits, extra = _prefixed_code_for(v)
        w = _LsbBitWriter()
        w.write(extra, ebits)
        br = _LsbBitReader(bytes(w.buf) if w.buf else b"\x00")
        assert _read_prefixed_value(br, code) == v, v


def test_decoders_fail_loudly_under_fuzz():
    """The decoder-boundary robustness contract (round 11, found and
    fixed by fuzzing): hostile payloads behind every magic prefix and
    bit-flipped corruptions of valid files raise ONLY typed errors
    (ValueError / NotImplementedError / struct.error / zlib.error) —
    never a bare IndexError/KeyError escape, and never a pathological
    slow path (the two fixed classes: a mutated TIFF tag count
    allocating a gigabyte struct format string, and a hostile VP8L
    header driving a 2.7e8-iteration constant-fill loop now served by
    the vectorized fast path). Seeded subset of the 4,000-input sweep."""
    import struct
    import zlib

    from cellbase_spark.operators import multimodal as mm
    from cellbase_spark.operators.webp import decode_webp, encode_webp

    rng = np.random.default_rng(12345)
    decoders = {
        "wav": (mm.decode_wav, [b"RIFF\x10\x00\x00\x00WAVE"]),
        "tiff": (mm.decode_tiff, [b"II\x2a\x00", b"MM\x00\x2a"]),
        "flac": (mm.decode_flac, [b"fLaC"]),
        "webp": (decode_webp, [b"RIFF\x10\x00\x00\x00WEBPVP8L"]),
        "gif": (mm.decode_gif, [b"GIF89a"]),
        "png": (mm.decode_png, [b"\x89PNG\r\n\x1a\n"]),
        "jpeg": (mm.decode_jpeg, [b"\xff\xd8\xff"]),
    }
    allowed = (ValueError, NotImplementedError, struct.error, zlib.error,
               EOFError)
    for name, (dec, prefixes) in decoders.items():
        for trial in range(60):
            pre = prefixes[trial % len(prefixes)]
            payload = pre + rng.integers(
                0, 256, int(rng.integers(0, 150)), dtype=np.uint8
            ).tobytes()
            try:
                dec(payload)
            except allowed:
                pass  # loud and typed — the contract

    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    clip = rng.integers(-2000, 2000, 200).astype(np.int16)
    valids = [
        (mm.decode_tiff, mm.encode_tiff(img, lzw=True, predictor=2)),
        (decode_webp, encode_webp(img)),
        (mm.decode_flac, mm.encode_flac(clip.astype(np.int32), 8000)),
        (mm.decode_wav,
         mm.encode_wav(clip, codec="ima_adpcm", adpcm_block_samples=64)),
    ]
    for dec, data in valids:
        for trial in range(60):
            b = bytearray(data)
            for _ in range(int(rng.integers(1, 4))):
                b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
            try:
                dec(bytes(b))
            except allowed:
                pass


def test_webp_routes_through_image_dispatch():
    """sniff_modality classes RIFF+WEBP as image (distinct from
    RIFF+WAVE audio) and decode_image routes it to the VP8L decoder."""
    from cellbase_spark.operators.multimodal import (
        decode_image,
        encode_wav,
        sniff_modality,
    )
    from cellbase_spark.operators.webp import encode_webp

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = encode_webp(img)
    assert sniff_modality(data) == "image"
    assert np.array_equal(decode_image(data), _want_rgba(img))
    wav = encode_wav(np.arange(10, dtype=np.int16))
    assert sniff_modality(wav) == "audio"
