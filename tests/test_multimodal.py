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
    # kept as the minimal seam contract: bytes of a format with no
    # native codec (lossy VP8 WebP here — VP8L lossless went native
    # late round 11) either decode (PIL present) or raise
    # NotImplementedError, never garbage.
    import struct as _struct

    lossy = (
        b"RIFF" + _struct.pack("<I", 12) + b"WEBP"
        + b"VP8 " + _struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        mm.decode_image(lossy)


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
    # PNG, JPEG (baseline+progressive), GIF, TIFF and VP8L WebP now
    # decode natively; the PIL seam is for formats without a native
    # path — lossy VP8 WebP here
    import struct as _struct

    lossy = (
        b"RIFF" + _struct.pack("<I", 12) + b"WEBP"
        + b"VP8 " + _struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        decode_image(lossy)
    # malformed payloads fail loudly in the native codecs, never silently
    with pytest.raises((ValueError, NotImplementedError, _struct.error)):
        decode_image(b"\x89PNG\r\n\x1a\nnot-really-a-png")
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPnot-really")
    with pytest.raises((ValueError, NotImplementedError, _struct.error, IndexError)):
        decode_image(b"\xff\xd8\xff\xe0not-really-a-jpeg")
    with pytest.raises((ValueError, NotImplementedError, _struct.error, IndexError)):
        decode_image(b"II\x2a\x00not-really-a-tiff")


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
    # C420 decodes natively as of round 11, but a C444-sized stream
    # relabeled C420 is MALFORMED (odd width here) and refuses loudly
    with pytest.raises(ValueError):
        decode_y4m(encode_y4m(v).replace(b"C444", b"C420"))
    # exotic colorspaces stay the loud seam
    with pytest.raises(NotImplementedError):
        decode_y4m(encode_y4m(v).replace(b"C444", b"C410"))
    with pytest.raises(ValueError):
        decode_y4m(b"NOTY4M W1 H1\n")


def test_jpeg_roundtrip_exact_on_constant_blocks():
    """Per-8x8-block constant grayscale images round-trip EXACTLY through
    the baseline JPEG codec under the all-ones quant table (every AC
    coefficient quantizes to 0; the DC survives the IDCT bit-clean) —
    the property q_mm_decode_jpeg's formula oracle is built on. Restart
    markers must not change a single pixel."""
    import numpy as np

    from cellbase_spark.operators.multimodal import decode_jpeg, encode_jpeg

    blocks = np.array([[0, 255, 128, 7], [90, 201, 13, 254]], dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    data = encode_jpeg(img)
    assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.array_equal(out, img)
    out_rst = decode_jpeg(encode_jpeg(img, restart_interval=1))
    assert np.array_equal(out_rst, img)


def test_jpeg_encode_ac_overflow_raises_clearly():
    """An AC coefficient past the T.81 baseline cap (|v| > 1023, size
    category 11) must raise a ValueError naming the constraint, not an
    opaque KeyError from the fixed Huffman table (r10 ADVICE low). With
    integer qtables >= 1 the bound is unreachable (exact max 1020), so
    drive it through an unvalidated sub-unity qtable entry; the
    worst-case block is the sign-matched vertex pattern for basis
    (0, 4) — horizontal stripes."""
    import numpy as np
    import pytest

    from cellbase_spark.operators.multimodal import decode_jpeg, encode_jpeg

    stripes = np.kron(
        np.array([[255, 0, 0, 255, 255, 0, 0, 255]], np.uint8),
        np.ones((8, 1), dtype=np.uint8),
    )
    qtable = [1] * 64
    qtable[4] = 0.5  # natural-order (0, 4): halves the 1020 coef to 2040
    with pytest.raises(ValueError, match=r"\+/-1023"):
        encode_jpeg(stripes, qtable=qtable)
    # the same block under a legal table stays encodable end-to-end
    assert decode_jpeg(encode_jpeg(stripes)).shape == stripes.shape


def test_jpeg_lossy_paths_bounded():
    """The general decoder paths the oracle key can't pin: nonzero AC
    coefficients (random images -> run-length/ZRL/EOB entropy coding),
    odd (non-multiple-of-8) dimensions, restart re-sync mid-stream,
    4:4:4 color, and 4:2:0 subsampled color. Under the all-ones quant
    table, reconstruction error is bounded by quantizer rounding (plus
    YCbCr rounding for color): small, deterministic tolerances."""
    import numpy as np

    from cellbase_spark.operators.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(42)
    gray = rng.integers(0, 256, (29, 43), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(gray))
    assert out.shape == gray.shape
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 3
    out_rst = decode_jpeg(encode_jpeg(gray, restart_interval=3))
    assert np.array_equal(out_rst, out)  # restarts change framing, not pixels

    rgb = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    out_c = decode_jpeg(encode_jpeg(rgb))
    assert out_c.shape == rgb.shape
    assert np.abs(out_c.astype(int) - rgb.astype(int)).max() <= 5

    flat = np.full((24, 40, 3), [90, 160, 40], dtype=np.uint8)
    out_s = decode_jpeg(encode_jpeg(flat, subsample=True))
    assert out_s.shape == flat.shape
    assert np.abs(out_s.astype(int) - flat.astype(int)).max() <= 2


def test_jpeg_rejects_bad_frames_and_bad_payloads():
    """Arithmetic-coded (SOF9) frames hit the loud seam; a baseline
    stream mislabeled SOF2 is a MALFORMED progressive file (its one
    scan spans Ss=0..Se=63, illegal for a progressive DC scan) and
    raises ValueError rather than decoding garbage (round 11 —
    genuine SOF2 decodes for real now); truncated payloads raise,
    never return wrong pixels; sniff_modality routes JPEG magic to
    'image' and decode_asset reaches the codec."""
    import numpy as np
    import pytest

    from cellbase_spark.operators.multimodal import (
        decode_asset,
        decode_jpeg,
        encode_jpeg,
        sniff_modality,
    )

    img = np.full((8, 8), 100, dtype=np.uint8)
    data = encode_jpeg(img)
    arith = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="arithmetic|non-baseline"):
        decode_jpeg(arith)
    mislabeled = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(mislabeled)
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    assert sniff_modality(data) == "image"
    kind, vals = decode_asset(data)
    assert kind == "image" and vals.sum() == 64 * 100


def test_jpeg_16bit_dqt_and_nontrivial_quant():
    """Decoder-only paths the encoder never emits: (a) a Pq=1 (16-bit)
    quantization table — built by rewriting the encoder's 8-bit DQT
    segment into big-endian shorts — must decode identically; (b) a
    quant table whose DC entry divides the constant-block DC exactly
    (q0=8 vs DC=8(c-128)) stays pixel-exact through dequantization."""
    import struct

    import numpy as np

    from cellbase_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        decode_jpeg,
        encode_jpeg,
    )

    # the zigzag table is the standard T.81 order
    assert _JPEG_ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert _JPEG_ZIGZAG[-1] == (7, 7) and len(set(_JPEG_ZIGZAG)) == 64

    img = np.kron(np.array([[7, 250]], np.uint8), np.ones((8, 8), np.uint8))
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xdb")
    (ln,) = struct.unpack_from(">H", data, i + 2)
    body = bytes(data[i + 4 : i + 2 + ln])
    assert body[0] == 0x00  # encoder emits 8-bit tables
    q16 = bytes([0x10]) + b"".join(
        struct.pack(">H", v) for v in body[1:]
    )
    seg = b"\xff\xdb" + struct.pack(">H", len(q16) + 2) + q16
    rewritten = bytes(data[:i]) + seg + bytes(data[i + 2 + ln :])
    assert np.array_equal(decode_jpeg(rewritten), img)

    out = decode_jpeg(encode_jpeg(img, qtable=[8] + [1] * 63))
    assert np.array_equal(out, img)


def test_png_gray_and_palette_lanes():
    """Round 10: the PNG gray (color type 0) and palette (type 3 + PLTE
    mapping) lanes, round-tripped under every scanline filter — the
    unfilter code is channel-count generic, so these ride the same five
    paths the truecolor tests pin. 16-bit depth stays the loud seam."""
    import struct as st

    import numpy as np
    import pytest

    from cellbase_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for ft in range(5):
        g = rng.integers(0, 256, (9, 13), dtype=np.uint8)
        out = decode_png(encode_png(g, filter_type=ft))
        assert out.shape == (9, 13) and np.array_equal(out, g), ft

    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    for ft in range(5):
        idx = rng.integers(0, 16, (7, 11), dtype=np.uint8)
        out = decode_png(encode_png(idx, filter_type=ft, palette=pal))
        assert out.shape == (7, 11, 3) and np.array_equal(out, pal[idx]), ft

    # 16-bit went native in round 11; sub-byte depths still refuse
    # loudly: rewrite IHDR's depth byte to 4
    data = bytearray(encode_png(rng.integers(0, 256, (4, 4), np.uint8)))
    i = data.find(b"IHDR")
    data[i + 12] = 4  # depth byte (IHDR: w(4) h(4) depth ...)
    body = bytes(data[i + 4 : i + 4 + 13])
    import zlib

    st.pack_into(
        ">I", data, i + 4 + 13, zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError):
        decode_png(bytes(data))


def test_gif_roundtrip_and_seams():
    """Round 10: GIF87a/89a LZW codec — pixel-exact round-trips
    (lossless), extension blocks skipped, dictionary growth + the 4096
    reset exercised by a repetitive stream, multi-frame payloads routed
    to decode_gif_frames (round 11: interlace decodes natively),
    dispatch + sniff routing."""
    import numpy as np
    import pytest

    from cellbase_spark.operators.multimodal import (
        decode_gif,
        decode_image,
        encode_gif,
        sniff_modality,
    )

    rng = np.random.default_rng(9)
    for n_colors, shape in [(4, (5, 7)), (256, (40, 61)), (3, (1, 1))]:
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        idx = rng.integers(0, n_colors, shape, dtype=np.uint8)
        data = encode_gif(idx, pal)
        assert sniff_modality(data) == "image"
        out = decode_image(data)  # dispatch path
        assert out.shape == shape + (3,)
        assert np.array_equal(out, pal[idx])

    # repetitive stream -> code-width growth and the 4096-entry reset
    idx = np.tile(np.arange(7, dtype=np.uint8).repeat(5), 3000).reshape(300, 350)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])

    # a GCE extension block before the image descriptor is skipped
    base = encode_gif(np.zeros((2, 2), np.uint8), pal[:2])
    i = base.find(b"\x2c")
    with_ext = base[:i] + b"\x21\xf9\x04\x00\x00\x00\x00\x00" + base[i:]
    assert np.array_equal(decode_gif(with_ext), decode_gif(base))

    # second frame refused (animation routes to decode_gif_frames)
    trailer = base.rindex(b"\x3b")
    two_frames = base[:trailer] + base[i:trailer] + b"\x3b"
    with pytest.raises(NotImplementedError, match="multi-frame"):
        decode_gif(two_frames)

    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7 + b"\xff")


def test_jpeg_progressive_equals_baseline():
    """Progressive and baseline encode the SAME quantized coefficients,
    so their decodes must be pixel-identical — across grayscale, color
    4:4:4, color 4:2:0 with odd dims (exercising the scan-grid vs
    MCU-padded-grid mismatch), a coarser quant table (multi-bit
    magnitudes -> refinement correction bits), and a sparse image
    (long EOB runs + ZRL-in-refine)."""
    import numpy as np

    from cellbase_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (29, 43), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(gray)),
        decode_jpeg(encode_jpeg(gray)),
    )
    rgb = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(rgb)),
        decode_jpeg(encode_jpeg(rgb)),
    )
    odd = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(odd, subsample=True)),
        decode_jpeg(encode_jpeg(odd, subsample=True)),
    )
    q = [16] * 64  # coarse quantization: small multi-bit coefficients
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(gray, qtable=q)),
        decode_jpeg(encode_jpeg(gray, qtable=q)),
    )
    sparse = np.full((40, 40), 128, dtype=np.uint8)
    sparse[3, 5] = 255
    sparse[25, 31] = 0  # two isolated spikes in a flat field
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(sparse)),
        decode_jpeg(encode_jpeg(sparse)),
    )


def test_jpeg_progressive_constant_blocks_exact():
    """Constant 8x8 blocks under the all-ones quant table round-trip
    EXACTLY through the progressive pipeline (all AC quantize to 0; the
    DC recomposes across the successive-approximation scans) — the
    property q_mm_decode_jpeg_progressive's formula oracle builds on.
    The SOF2 marker must also be what lands in the stream."""
    import numpy as np

    from cellbase_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    blocks = np.array([[0, 255, 128, 7], [90, 201, 13, 254], [66, 3, 199, 128]],
                      dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    data = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert np.array_equal(decode_jpeg(data), img)


def test_png_16bit_and_adam7_roundtrip():
    """Round 11 closed the last PNG lanes: 16-bit depth (big-endian
    samples, byte-level filters with bpp = ch*2) and Adam7 interlace
    (seven independently filtered passes, empty passes for narrow
    images). Pin the full matrix: depths x color types x all five
    filters x interlace on/off, palette+interlace, and tiny images
    whose Adam7 passes are partly empty."""
    import numpy as np

    from cellbase_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for shape in [(13, 17), (13, 17, 3), (13, 17, 4)]:
        img8 = rng.integers(0, 256, shape, dtype=np.uint8)
        img16 = rng.integers(0, 65536, shape, dtype=np.uint16)
        for ft in range(5):
            for il in (False, True):
                assert np.array_equal(
                    decode_png(encode_png(img8, filter_type=ft, interlace=il)),
                    img8,
                )
                out16 = decode_png(
                    encode_png(img16, filter_type=ft, interlace=il)
                )
                assert out16.dtype == np.uint16
                assert np.array_equal(out16, img16)
    idx = rng.integers(0, 7, (9, 11), dtype=np.uint8)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    for il in (False, True):
        assert np.array_equal(
            decode_png(encode_png(idx, filter_type=4, palette=pal, interlace=il)),
            pal[idx],
        )
    for shape in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 9)]:
        tiny = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png(tiny, filter_type=3, interlace=True)), tiny
        )


def test_gif_animation_composition_and_interlace():
    """decode_gif_frames composes like a viewer: transparency masks,
    sub-rect placement, disposal 1 (leave) / 2 (restore-to-background)
    / 3 (restore-previous), local color tables, interlaced frames; the
    single-image decode_gif handles interlace and refuses animation
    pointing at the frames API."""
    import numpy as np
    import pytest

    from cellbase_spark.operators.multimodal import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
        encode_gif_animated,
    )

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (11, 13), dtype=np.uint8)

    # interlaced single frame: both decoders agree with the source
    data = encode_gif_animated((11, 13), [dict(indices=idx, interlace=True)], pal)
    assert np.array_equal(decode_gif_frames(data)[0], pal[idx])
    assert np.array_equal(decode_gif(data), pal[idx])
    # plain single-frame writer still round-trips through both
    assert np.array_equal(decode_gif_frames(encode_gif(idx, pal))[0], pal[idx])

    idx1 = rng.integers(0, 8, (8, 10), dtype=np.uint8)
    idx2 = rng.integers(0, 8, (4, 5), dtype=np.uint8)
    idx3 = rng.integers(0, 8, (3, 4), dtype=np.uint8)
    lpal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    data3 = encode_gif_animated(
        (8, 10),
        [dict(indices=idx1, disposal=1),
         dict(indices=idx2, x0=2, y0=1, disposal=2, transparent=3),
         dict(indices=idx3, x0=5, y0=4, disposal=1, palette=lpal)],
        pal, bg_index=0,
    )
    frames = decode_gif_frames(data3)
    assert frames.shape == (3, 8, 10, 3)
    c1 = pal[idx1]
    c2 = c1.copy()
    m = idx2 != 3
    c2[1:5, 2:7][m] = pal[idx2][m]
    c3 = c1.copy()
    c3[1:5, 2:7] = pal[0]      # disposal 2: rect restored to background
    c3[4:7, 5:9] = lpal[idx3]  # local table wins for frame 3
    assert np.array_equal(frames[0], c1)
    assert np.array_equal(frames[1], c2)
    assert np.array_equal(frames[2], c3)

    # disposal 3: frame 2's rect restored to the PRE-draw canvas
    data4 = encode_gif_animated(
        (8, 10),
        [dict(indices=idx1, disposal=1),
         dict(indices=idx2, x0=2, y0=1, disposal=3),
         dict(indices=idx3, x0=5, y0=4, disposal=1)],
        pal,
    )
    want3 = c1.copy()
    want3[4:7, 5:9] = pal[idx3]
    assert np.array_equal(decode_gif_frames(data4)[2], want3)

    # the single-image API still refuses animation, loudly and helpfully
    with pytest.raises(NotImplementedError, match="decode_gif_frames"):
        decode_gif(data3)


def test_tiff_roundtrip_matrix_and_seams():
    """Round 11: baseline TIFF native — 8-bit gray/RGB x uncompressed/
    PackBits x little/big endian x strip sizes, pixel-exact through
    both the direct codec and the decode_image dispatch; PackBits
    round-trips run-heavy and random streams; unsupported shapes
    (16-bit, LZW, tiles) raise loudly."""
    import struct as st

    import numpy as np
    import pytest

    from cellbase_spark.operators.multimodal import (
        _packbits_decode,
        _packbits_encode,
        decode_image,
        decode_tiff,
        encode_tiff,
        sniff_modality,
    )

    rng = np.random.default_rng(13)
    for _ in range(200):
        n = int(rng.integers(0, 300))
        b = (
            rng.integers(0, 4 if rng.random() < 0.5 else 256, n)
            .astype(np.uint8)
            .tobytes()
        )
        assert _packbits_decode(_packbits_encode(b), len(b)) == b
    for shape in [(9, 13), (9, 13, 3), (1, 1), (17, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for pb in (False, True):
            for be in (False, True):
                for rps in (1, 4, 100):
                    data = encode_tiff(
                        img, packbits=pb, big_endian=be, rows_per_strip=rps
                    )
                    assert sniff_modality(data) == "image"
                    assert np.array_equal(decode_tiff(data), img)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_tiff(img, packbits=True)), img)

    # LZW and Deflate went native late round 11 — positive lanes
    assert np.array_equal(
        decode_tiff(encode_tiff(img, lzw=True, predictor=2)), img
    )
    assert np.array_equal(
        decode_tiff(encode_tiff(img, deflate=True, predictor=2)), img
    )
    # seams: rewrite Compression to JPEG-in-TIFF (7) -> loud refusal
    data = bytearray(encode_tiff(img))
    # find the IFD and patch tag 259's value
    (ifd,) = st.unpack_from("<I", data, 4)
    (n,) = st.unpack_from("<H", data, ifd)
    for k in range(n):
        tag, typ, cnt = st.unpack_from("<HHI", data, ifd + 2 + 12 * k)
        if tag == 259:
            st.pack_into("<H", data, ifd + 2 + 12 * k + 8, 7)
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(data))


def test_wav_stereo_and_24bit_roundtrip():
    """Round 11 PCM lanes: stereo de-interleave and 24-bit packed
    samples (sign in bit 23) round-trip exactly; 16-bit mono keeps its
    1-D int16 contract; unsupported bit depths refuse loudly."""
    import numpy as np
    import pytest

    from cellbase_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    st = rng.integers(-32768, 32767, (500, 2), dtype=np.int16)
    b, r = decode_wav(encode_wav(st, 44100))
    assert b.shape == (500, 2) and np.array_equal(b, st) and r == 44100
    s24 = rng.integers(-(1 << 23), (1 << 23) - 1, (200, 2), dtype=np.int32)
    b24, _ = decode_wav(encode_wav(s24, 48000, bits=24))
    assert b24.dtype == np.int32 and np.array_equal(b24, s24)
    edge = np.array([-(1 << 23), (1 << 23) - 1, -1, 0, 1], dtype=np.int32)
    be, _ = decode_wav(encode_wav(edge, bits=24))
    assert np.array_equal(be, edge)
    with pytest.raises(ValueError, match="bits"):
        encode_wav(edge, bits=8)


def test_y4m_subsampled_chroma_lanes():
    """Round 11: C420/C422 decode natively — half-resolution chroma
    planes replication-upsampled; the encoder's round-half-up block-
    mean downsample is EXACT on constant chroma blocks (the oracle
    playbook), Y always lossless, and odd dims refuse loudly."""
    import numpy as np
    import pytest

    from cellbase_spark.operators.multimodal import decode_y4m, encode_y4m

    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, (3, 8, 10), dtype=np.uint8)
    u = np.kron(rng.integers(0, 256, (3, 4, 5)), np.ones((1, 2, 2))).astype(np.uint8)
    v = np.kron(rng.integers(0, 256, (3, 4, 5)), np.ones((1, 2, 2))).astype(np.uint8)
    clip = np.stack([y, u, v], axis=3)
    assert np.array_equal(decode_y4m(encode_y4m(clip, colorspace="C420")), clip)
    u2 = np.kron(rng.integers(0, 256, (3, 8, 5)), np.ones((1, 1, 2))).astype(np.uint8)
    v2 = np.kron(rng.integers(0, 256, (3, 8, 5)), np.ones((1, 1, 2))).astype(np.uint8)
    clip2 = np.stack([y, u2, v2], axis=3)
    assert np.array_equal(decode_y4m(encode_y4m(clip2, colorspace="C422")), clip2)
    # random chroma: Y stays untouched through the lossy chroma path
    r = rng.integers(0, 256, (2, 4, 6, 3), dtype=np.uint8)
    out = decode_y4m(encode_y4m(r, colorspace="C420"))
    assert np.array_equal(out[:, :, :, 0], r[:, :, :, 0])
    with pytest.raises(ValueError, match="divisible"):
        encode_y4m(rng.integers(0, 256, (1, 4, 7, 3), dtype=np.uint8), colorspace="C420")
