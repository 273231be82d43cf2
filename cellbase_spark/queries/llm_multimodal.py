"""Multimodal binary-column queries (north-star mandate: image/audio/video
as opaque binary + typed metadata, decode/feature/frame-sample as Arrow
Pandas-UDF pipelines — SURVEY.md §2.8 family, multimodal extension).

Two tiers of keys:
- byte-level kernels (decode_meta/frames/resize/features): the binary
  payload is the UTF-8 encoding of documents.text (a stand-in for the
  asset bytes; verified pure ASCII, so the DuckDB oracle re-derives
  every byte-level feature from the text column) — these grade the
  Spark plumbing: BinaryType columns, mapInPandas batch iteration,
  one-asset-to-many-frames expansion, schema contracts.
- REAL-codec keys (decode_real/png/wav/y4m/mixed_corpus): genuine
  BMP/PNG/WAV/Y4M payloads authored from per-doc integer formulas,
  decoded by the independent stdlib-only codecs in
  operators/multimodal.py; the oracle computes the expected stats
  straight from the formulas, so a hash match proves the codec path
  (sniff, chunk walk, inflate, unfilter, raster order) byte-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cellbase_spark.io import fan_out, load_table
from cellbase_spark.operators.multimodal import (
    decode_assets,
    extract_features,
    resize_assets,
    sample_frames,
    with_binary_payload,
)
from cellbase_spark.registry import register


@register(
    "q_mm_decode_real",
    family="llm-multimodal",
    oracle="""
WITH px AS (SELECT unnest(range(24)) AS i)
SELECT d.doc_id,
       6 AS width, 4 AS height,
       CAST(SUM((d.doc_id * 31 + px.i) % 256) AS DOUBLE) / 24 AS mean_r,
       CAST(SUM((d.doc_id * 31 + px.i + 7) % 256) AS DOUBLE) / 24 AS mean_g,
       CAST(SUM((d.doc_id * 31 + px.i + 14) % 256) AS DOUBLE) / 24 AS mean_b
FROM documents d CROSS JOIN px
GROUP BY d.doc_id
""",
)
def q_mm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end to end: each doc gets a deterministic 6x4
    RGB image (pixel[y,x,c] = (doc_id*31 + y*6+x + c*7) % 256), ENCODED
    as a genuine 24-bit BMP (bottom-up, BGR, padded rows — width 6
    forces a nonzero pad), then DECODED by the native BMP parser and
    reduced to true pixel stats. Encoder and decoder are independent
    code paths, so a padding/flip/channel-order bug breaks the hash; the
    oracle re-derives the channel means from the pixel formula directly.
    This is the uncompressed-codec half of the decode seam made real —
    compressed formats still route through the PIL import-try."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import (
        decode_images_to_stats,
        encode_bmp,
    )

    def author(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = np.arange(24, dtype=np.int64)
                px = np.stack(
                    [(doc_id * 31 + i + c * 7) % 256 for c in range(3)], axis=1
                ).astype(np.uint8).reshape(4, 6, 3)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    d = load_table(spark, sf_dir, "documents")
    assets = fan_out(d.select("doc_id")).mapInPandas(
        author, "doc_id long, payload binary"
    )
    return decode_images_to_stats(assets)


@register(
    "q_mm_decode_png",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(8 + doc_id % 5 AS INT) AS width,
       CAST(8 AS INT) AS height,
       CAST(list_sum(flatten(list_transform(range(0, 8), y ->
            flatten(list_transform(range(0, 8 + doc_id % 5), x ->
              list_transform(range(0, 3),
                             c -> (doc_id + 7*y + 3*x + c) % 256)))))) AS BIGINT)
         AS px_sum
FROM documents
""",
)
def q_mm_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode: each doc gets a deterministic
    (8 x 8+doc_id%5) RGB image (pixel[y,x,c] = (doc_id+7y+3x+c) % 256),
    encoded as a genuine PNG — stdlib-zlib DEFLATE, CRC-checked chunks —
    with scanline filter doc_id % 5, so all five PNG filters (None/Sub/
    Up/Average/Paeth) are exercised under the official gate; then
    decoded back by the independent parser and reduced to the pixel sum.
    The oracle computes the expected sum straight from the pixel formula
    WITHOUT any codec: the hash can only match if inflate + unfilter
    reconstruct every byte. Plumbing is the standard bounded-memory
    Arrow mapInPandas asset kernel; per-doc width variation also pins
    the variable-stride path."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_png, encode_png

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 8 + doc_id % 5
                y, x, c = np.meshgrid(
                    np.arange(8), np.arange(w), np.arange(3), indexing="ij"
                )
                img = ((doc_id + 7 * y + 3 * x + c) % 256).astype(np.uint8)
                arr = decode_png(encode_png(img, filter_type=doc_id % 5))
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


@register(
    "q_mm_decode_jpeg",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(8 * (2 + doc_id % 3) AS INT) AS width,
       CAST(16 AS INT) AS height,
       CAST(64 * list_sum(flatten(list_transform(range(0, 2), by ->
              list_transform(range(0, 2 + doc_id % 3), bx ->
                (doc_id * 7 + by * 31 + bx * 13) % 256)))) AS BIGINT)
         AS px_sum
FROM documents
""",
)
def q_mm_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode (round 10 — the last image-codec seam):
    each doc gets a deterministic grayscale image of 2 x (2 + doc_id%3)
    8x8 blocks, block (by, bx) constant at (doc_id*7 + by*31 + bx*13) %
    256, encoded as a genuine baseline JFIF (SOI/DQT/SOF0/DHT/SOS
    segments, canonical-Huffman entropy coding, byte stuffing; odd docs
    additionally carry DRI + RSTn restart markers so that path runs
    under the official gate) with the all-ones quant table, then decoded
    back by the independent T.81 parser (Huffman walk, dequant, batched
    IDCT) and reduced to the pixel sum. Per-8x8-block CONSTANT images
    make the lossy pipeline exact: every AC coefficient quantizes to 0
    and the DC round-trips through the IDCT to the block value, so the
    oracle computes the expected sum straight from the block formula
    WITHOUT any codec — the hash can only match if every entropy-decode,
    dezigzag, dequant and IDCT step reconstructs every pixel. Per-doc
    width variation pins the MCU layout; the plumbing is the standard
    bounded-memory Arrow mapInPandas asset kernel.

    Lossy-path coverage (nonzero AC, color, 4:2:0, restart re-sync on
    random images) lives in tests/test_multimodal.py round-trip bounds;
    progressive frames decode for real as of round 11
    (q_mm_decode_jpeg_progressive); arithmetic/lossless remain the
    documented loud seam."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_jpeg, encode_jpeg

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                bw = 2 + doc_id % 3
                by, bx = np.meshgrid(np.arange(2), np.arange(bw), indexing="ij")
                blocks = ((doc_id * 7 + by * 31 + bx * 13) % 256).astype(np.uint8)
                img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
                arr = decode_jpeg(
                    encode_jpeg(img, restart_interval=2 if doc_id % 2 else 0)
                )
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


# JFIF YCbCr forward + inverse, written EXACTLY as the codec computes
# them (same literals, same left-to-right association, floor(x + .5)
# rounding) so DuckDB reproduces the identical IEEE doubles — the color
# oracle is the codec's math replayed on the block formula, no codec.
# Composed by textual substitution because DuckDB lambdas cannot hold
# subqueries: r/g/b expand into y/cb/cr which expand into the three
# reconstructed channels, all inline.
_R = "CAST((doc_id * 5 + by * 17 + bx * 29) % 256 AS DOUBLE)"
_G = "CAST((doc_id * 11 + by * 7 + bx * 3) % 256 AS DOUBLE)"
_B = "CAST((doc_id * 13 + by * 23 + bx * 19) % 256 AS DOUBLE)"
_Y = f"floor(0.299 * {_R} + 0.587 * {_G} + 0.114 * {_B} + 0.5)"
_CB = (
    "least(255, greatest(0,"
    f" floor(128 - 0.168736 * {_R} - 0.331264 * {_G} + 0.5 * {_B} + 0.5)))"
)
_CR = (
    "least(255, greatest(0,"
    f" floor(128 + 0.5 * {_R} - 0.418688 * {_G} - 0.081312 * {_B} + 0.5)))"
)
_R2 = f"least(255, greatest(0, floor({_Y} + 1.402 * ({_CR} - 128) + 0.5)))"
_G2 = (
    "least(255, greatest(0,"
    f" floor({_Y} - 0.344136 * ({_CB} - 128) - 0.714136 * ({_CR} - 128)"
    " + 0.5)))"
)
_B2 = f"least(255, greatest(0, floor({_Y} + 1.772 * ({_CB} - 128) + 0.5)))"
_JPEG_COLOR_SQL = f"""
SELECT doc_id,
       CAST(8 * (2 + doc_id % 3) AS INT) AS width,
       CAST(16 AS INT) AS height,
       CAST(64 * list_sum(flatten(list_transform(range(0, 2), by ->
         list_transform(range(0, 2 + doc_id % 3), bx ->
           CAST({_R2} + {_G2} + {_B2} AS BIGINT))))) AS BIGINT) AS px_sum
FROM documents
"""


@register(
    "q_mm_decode_gif",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(9 + doc_id % 4 AS INT) AS width,
       CAST(6 AS INT) AS height,
       CAST(list_sum(flatten(list_transform(range(0, 6), y ->
         flatten(list_transform(range(0, 9 + doc_id % 4), x ->
           list_value(
             (doc_id * 3 + ((doc_id + y * 5 + x * 3) % 8) * 11) % 256,
             (doc_id * 7 + ((doc_id + y * 5 + x * 3) % 8) * 5) % 256,
             (doc_id * 13 + ((doc_id + y * 5 + x * 3) % 8) * 3) % 256
           )))))) AS BIGINT) AS px_sum
FROM documents
""",
)
def q_mm_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode (round 10): each doc gets a deterministic
    6 x (9 + doc_id%4) frame over an 8-color formula palette
    (pal[i][c] and idx[y,x] pure integer formulas), encoded as a
    genuine single-frame GIF89a — real LZW with variable code width,
    CLEAR/EOI, 255-byte sub-blocks — then decoded back by the
    independent parser (screen/image descriptors, color table, LZW
    with the KwKwK case) and reduced to the pixel sum. LZW is LOSSLESS,
    so like PNG the oracle computes the expected sum straight from the
    formulas with no codec: the hash matches only if every LZW code and
    palette lookup reconstructs every byte. Variable width pins the
    sub-block/stream framing per doc."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_gif, encode_gif

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 9 + doc_id % 4
                y, x = np.meshgrid(np.arange(6), np.arange(w), indexing="ij")
                idx = ((doc_id + y * 5 + x * 3) % 8).astype(np.uint8)
                i = np.arange(8)
                pal = np.stack(
                    [
                        (doc_id * 3 + i * 11) % 256,
                        (doc_id * 7 + i * 5) % 256,
                        (doc_id * 13 + i * 3) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                arr = decode_gif(encode_gif(idx, pal))
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


@register("q_mm_decode_jpeg_color", family="llm-multimodal", oracle=_JPEG_COLOR_SQL)
def q_mm_decode_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR baseline-JPEG decode under the gate (round 10): each doc is
    a 2 x (2 + doc_id%3)-block image whose 8x8 blocks are CONSTANT RGB
    (per-channel block formulas), encoded 4:4:4 and decoded back through
    the full three-component path — YCbCr forward transform at encode,
    per-component Huffman/DCT, inverse transform + clipping at decode.
    Constant blocks make the DCT lossless (q_mm_decode_jpeg's property,
    now per component), so the only transformations left are the two
    color transforms — and those are REPLAYED VERBATIM in the oracle SQL
    (same literals, same association order, floor(x+.5) half-up rounding
    — the reason decode_jpeg rounds with floor instead of numpy's
    half-even round): DuckDB computes the identical IEEE doubles, so the
    hash pins the whole color pipeline bit-exactly, codec-free."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_jpeg, encode_jpeg

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                bw = 2 + doc_id % 3
                by, bx = np.meshgrid(np.arange(2), np.arange(bw), indexing="ij")
                rgb_blocks = np.stack(
                    [
                        (doc_id * 5 + by * 17 + bx * 29) % 256,
                        (doc_id * 11 + by * 7 + bx * 3) % 256,
                        (doc_id * 13 + by * 23 + bx * 19) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                img = np.kron(
                    rgb_blocks.transpose(2, 0, 1), np.ones((8, 8), np.uint8)
                ).transpose(1, 2, 0)
                arr = decode_jpeg(encode_jpeg(img))
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


@register(
    "q_mm_decode_wav",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(64 + doc_id % 17 AS INT) AS n_samples,
       CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
       CAST(list_sum(list_transform(range(0, 64 + doc_id % 17),
            i -> (doc_id * 13 + i * 7) % 4096 - 2048)) AS BIGINT) AS samp_sum,
       CAST(list_min(list_transform(range(0, 64 + doc_id % 17),
            i -> (doc_id * 13 + i * 7) % 4096 - 2048)) AS INT) AS samp_min,
       CAST(list_max(list_transform(range(0, 64 + doc_id % 17),
            i -> (doc_id * 13 + i * 7) % 4096 - 2048)) AS INT) AS samp_max
FROM documents
""",
)
def q_mm_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: each doc gets a deterministic PCM16 waveform
    (sample[i] = (doc_id*13 + i*7) % 4096 - 2048, n = 64 + doc_id%17,
    rate = 8000 + (doc_id%3)*4000), encoded as a genuine mono PCM16 WAV
    (RIFF/fmt/data chunks) and decoded back by the independent RIFF
    parser; the emitted sample stats are oracle-verified straight from
    the formula — the hash matches only if the chunk walk and int16
    little-endian raster reconstruct every sample. Variable n_samples
    and sample_rate per doc pin the header fields too. Same
    bounded-memory Arrow mapInPandas shape as the image kernels."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_wav, encode_wav

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                n = 64 + doc_id % 17
                i = np.arange(n, dtype=np.int64)
                samples = ((doc_id * 13 + i * 7) % 4096 - 2048).astype(np.int16)
                rate_in = 8000 + (doc_id % 3) * 4000
                back, rate = decode_wav(encode_wav(samples, rate_in))
                out.append(
                    (doc_id, len(back), rate,
                     int(back.astype(np.int64).sum()),
                     int(back.min()), int(back.max()))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "samp_sum", "samp_min", "samp_max",
                ],
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel,
        "doc_id long, n_samples int, sample_rate int,"
        " samp_sum long, samp_min int, samp_max int",
    )


@register(
    "q_mm_decode_y4m",
    family="llm-multimodal",
    oracle="""
SELECT d.doc_id,
       CAST(f.f AS INT) AS frame_idx,
       CAST(list_sum(flatten(list_transform(range(0, 4), y ->
            list_transform(range(0, 4 + d.doc_id % 3), x ->
              (d.doc_id + 11*f.f + 3*y + x) % 256)))) AS BIGINT) AS y_sum,
       CAST(list_sum(flatten(list_transform(range(0, 4), y ->
            list_transform(range(0, 4 + d.doc_id % 3), x ->
              (d.doc_id + 11*f.f + 3*y + x + 97) % 256)))) AS BIGINT) AS u_sum,
       CAST(list_sum(flatten(list_transform(range(0, 4), y ->
            list_transform(range(0, 4 + d.doc_id % 3), x ->
              (d.doc_id + 11*f.f + 3*y + x + 194) % 256)))) AS BIGINT) AS v_sum
FROM documents d CROSS JOIN (SELECT unnest(range(0, 3)) AS f) f
""",
)
def q_mm_decode_y4m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode with per-frame expansion: each doc gets a
    deterministic 3-frame C444 Y4M clip (plane[c][f,y,x] =
    (doc_id + 11f + 3y + x + 97c) % 256, width varies per doc), encoded
    as a genuine YUV4MPEG2 stream and decoded by the independent parser;
    one OUTPUT ROW PER FRAME with per-plane sums, oracle-verified
    straight from the formula. This is the video half of the modality
    triple (PNG image / WAV audio / Y4M video) — the one-asset-to-
    many-frames expansion the frame-sampling kernels do, now through a
    real container format."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_y4m, encode_y4m

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 4 + doc_id % 3
                f, y, x, c = np.meshgrid(
                    np.arange(3), np.arange(4), np.arange(w), np.arange(3),
                    indexing="ij",
                )
                clip = ((doc_id + 11 * f + 3 * y + x + 97 * c) % 256).astype(
                    np.uint8
                )
                frames = decode_y4m(encode_y4m(clip))
                for fi in range(frames.shape[0]):
                    out.append(
                        (doc_id, fi,
                         int(frames[fi, :, :, 0].astype(np.int64).sum()),
                         int(frames[fi, :, :, 1].astype(np.int64).sum()),
                         int(frames[fi, :, :, 2].astype(np.int64).sum()))
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "y_sum", "u_sum", "v_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel,
        "doc_id long, frame_idx int, y_sum long, u_sum long, v_sum long",
    )


@register(
    "q_mm_mixed_corpus",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CASE doc_id % 7 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            WHEN 2 THEN 'video' ELSE 'image' END AS modality,
       CASE doc_id % 7
         WHEN 0 THEN CAST(8 * (8 + doc_id % 5)
              * (CASE WHEN doc_id % 14 = 7 THEN 4 ELSE 3 END) AS BIGINT)
         WHEN 1 THEN CAST(64 + doc_id % 17 AS BIGINT)
         WHEN 2 THEN CAST(3 * 4 * (4 + doc_id % 3) * 3 AS BIGINT)
         WHEN 3 THEN CAST(128 * (2 + doc_id % 3) AS BIGINT)
         WHEN 4 THEN CAST(6 * (9 + doc_id % 4) * 3 AS BIGINT)
         WHEN 5 THEN CAST(192 * (2 + doc_id % 4) AS BIGINT)
         ELSE CAST(5 * (6 + doc_id % 4) * 3 AS BIGINT)
       END AS n_values,
       CASE doc_id % 7
         WHEN 0 THEN CAST(list_sum(flatten(list_transform(range(0, 8), y ->
              flatten(list_transform(range(0, 8 + doc_id % 5), x ->
                list_transform(range(0, 3),
                               c -> (doc_id + 7*y + 3*x + c) % 256))))))
              + CASE WHEN doc_id % 14 = 7
                     THEN 255 * 8 * (8 + doc_id % 5) ELSE 0 END AS BIGINT)
         WHEN 1 THEN CAST(list_sum(list_transform(range(0, 64 + doc_id % 17),
              i -> (doc_id * 13 + i * 7) % 4096 - 2048)) AS BIGINT)
         WHEN 2 THEN CAST(list_sum(flatten(list_transform(range(0, 3), f ->
              flatten(list_transform(range(0, 4), y ->
                flatten(list_transform(range(0, 4 + doc_id % 3), x ->
                  list_transform(range(0, 3),
                    c -> (doc_id + 11*f + 3*y + x + 97*c) % 256)))))))) AS BIGINT)
         WHEN 3 THEN CAST(64 * list_sum(flatten(list_transform(range(0, 2), by ->
              list_transform(range(0, 2 + doc_id % 3), bx ->
                (doc_id * 7 + by * 31 + bx * 13) % 256)))) AS BIGINT)
         WHEN 4 THEN CAST(list_sum(flatten(list_transform(range(0, 6), y ->
              flatten(list_transform(range(0, 9 + doc_id % 4), x ->
                list_value(
                  (doc_id * 3 + ((doc_id + y * 5 + x * 3) % 8) * 11) % 256,
                  (doc_id * 7 + ((doc_id + y * 5 + x * 3) % 8) * 5) % 256,
                  (doc_id * 13 + ((doc_id + y * 5 + x * 3) % 8) * 3) % 256
                )))))) AS BIGINT)
         WHEN 5 THEN CAST(64 * list_sum(flatten(list_transform(range(0, 3), by ->
              list_transform(range(0, 2 + doc_id % 4), bx ->
                (doc_id * 9 + by * 37 + bx * 17) % 256)))) AS BIGINT)
         ELSE CAST(list_sum(flatten(list_transform(range(0, 5), y ->
              flatten(list_transform(range(0, 6 + doc_id % 4), x ->
                list_transform(range(0, 3),
                  c -> (doc_id * 17 + 9 * y + 5 * x + 3 * c) % 256)))))) AS BIGINT)
       END AS val_sum
FROM documents
""",
)
def q_mm_mixed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXED-modality corpus through ONE binary column — the real shape
    of a multimodal lake: each doc's payload is a genuine PNG, WAV,
    Y4M, baseline JPEG, GIF, PROGRESSIVE JPEG or TIFF (round 11
    widened to 7-way; doc_id % 7 picks the modality, each with its
    formula content), and the processing kernel knows nothing about
    which — it
    sniffs the magic bytes (sniff_modality) and routes to the matching
    real codec (decode_asset), emitting the modality plus decoded value
    stats. Both JPEG lanes share the FFD8 magic, so the route lands in
    ONE decoder whose SOF marker walk dispatches baseline vs
    multi-scan progressive — the realistic shape (a web corpus never
    labels which JPEG flavor a payload is). The oracle re-derives
    everything from the per-modality formulas, so the hash matches only
    if sniffing AND all NINE decode paths are correct (the JPEG lanes
    use the constant-block exact round-trip; the GIF and TIFF lanes are
    lossless — the TIFF lane rotates none/PackBits/LZW+Predictor-2
    compression per doc, half the audio docs arrive as FLAC of the
    same clip, and half the PNG-lane docs arrive as VP8L WebP of the
    same pixels — lossless container swaps, blind to the content
    formulas; the WebP arm adds only its opaque alpha plane: 9 codec
    paths under a 7-way content oracle). Two mapInPandas passes (author, then sniff+decode) keep
    the authored binary column a genuine Arrow BinaryType round-trip."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.webp import encode_webp
    from cellbase_spark.operators.multimodal import (
        decode_asset,
        encode_flac,
        encode_gif,
        encode_jpeg,
        encode_jpeg_progressive,
        encode_png,
        encode_tiff,
        encode_wav,
        encode_y4m,
    )

    def author(batches):
        for pdf in batches:
            payloads = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                m = doc_id % 7
                if m == 0:
                    w = 8 + doc_id % 5
                    y, x, c = np.meshgrid(
                        np.arange(8), np.arange(w), np.arange(3), indexing="ij"
                    )
                    img = ((doc_id + 7 * y + 3 * x + c) % 256).astype(np.uint8)
                    # PNG/WebP container sub-lane: same pixel formula,
                    # alpha plane (opaque) priced into the oracle arm
                    if doc_id % 14 == 7:
                        payloads.append(encode_webp(img))
                    else:
                        payloads.append(encode_png(img, filter_type=doc_id % 5))
                elif m == 1:
                    n = 64 + doc_id % 17
                    i = np.arange(n, dtype=np.int64)
                    clip = ((doc_id * 13 + i * 7) % 4096 - 2048).astype(
                        np.int16
                    )
                    # audio sub-lane: half the audio docs arrive as FLAC
                    # of the SAME clip — lossless, so the oracle formula
                    # is container-blind (8 codec paths, 7-way oracle)
                    if doc_id % 14 == 8:
                        payloads.append(
                            encode_flac(
                                clip.astype(np.int32), 16000, block_size=32
                            )
                        )
                    else:
                        payloads.append(encode_wav(clip))
                elif m == 2:
                    w = 4 + doc_id % 3
                    f, y, x, c = np.meshgrid(
                        np.arange(3), np.arange(4), np.arange(w), np.arange(3),
                        indexing="ij",
                    )
                    clip = ((doc_id + 11 * f + 3 * y + x + 97 * c) % 256).astype(
                        np.uint8
                    )
                    payloads.append(encode_y4m(clip))
                elif m == 3:
                    bw = 2 + doc_id % 3
                    by, bx = np.meshgrid(
                        np.arange(2), np.arange(bw), indexing="ij"
                    )
                    blocks = (
                        (doc_id * 7 + by * 31 + bx * 13) % 256
                    ).astype(np.uint8)
                    payloads.append(
                        encode_jpeg(np.kron(blocks, np.ones((8, 8), np.uint8)))
                    )
                elif m == 4:
                    w = 9 + doc_id % 4
                    y, x = np.meshgrid(
                        np.arange(6), np.arange(w), indexing="ij"
                    )
                    idx = ((doc_id + y * 5 + x * 3) % 8).astype(np.uint8)
                    i = np.arange(8)
                    pal = np.stack(
                        [
                            (doc_id * 3 + i * 11) % 256,
                            (doc_id * 7 + i * 5) % 256,
                            (doc_id * 13 + i * 3) % 256,
                        ],
                        axis=1,
                    ).astype(np.uint8)
                    payloads.append(encode_gif(idx, pal))
                elif m == 5:
                    bw = 2 + doc_id % 4
                    by, bx = np.meshgrid(
                        np.arange(3), np.arange(bw), indexing="ij"
                    )
                    blocks = (
                        (doc_id * 9 + by * 37 + bx * 17) % 256
                    ).astype(np.uint8)
                    payloads.append(
                        encode_jpeg_progressive(
                            np.kron(blocks, np.ones((8, 8), np.uint8))
                        )
                    )
                else:
                    w = 6 + doc_id % 4
                    y, x, c = np.meshgrid(
                        np.arange(5), np.arange(w), np.arange(3),
                        indexing="ij",
                    )
                    img = (
                        (doc_id * 17 + 9 * y + 5 * x + 3 * c) % 256
                    ).astype(np.uint8)
                    # all three TIFF compressions under the one hash —
                    # lossless, so the oracle formula is encoding-blind
                    comp = doc_id % 3
                    payloads.append(
                        encode_tiff(
                            img,
                            packbits=comp == 1,
                            lzw=comp == 0,
                            predictor=2 if comp == 0 else 1,
                            big_endian=doc_id % 2 == 0,
                            rows_per_strip=2,
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def process(batches):
        for pdf in batches:
            out = []
            for raw_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                kind, vals = decode_asset(bytes(payload))
                out.append((int(raw_id), kind, len(vals), int(vals.sum())))
            yield pd.DataFrame(
                out, columns=["doc_id", "modality", "n_values", "val_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    assets = fan_out(d.select("doc_id")).mapInPandas(
        author, "doc_id long, payload binary"
    )
    return assets.mapInPandas(
        process, "doc_id long, modality string, n_values long, val_sum long"
    )


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


@register(
    "q_mm_resize",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS orig_bytes,
       CAST((octet_length(encode(text)) + 3) // 4 AS INT) AS resized_bytes,
       md5(array_to_string(
             list_transform(range(0, (octet_length(encode(text)) + 3) // 4),
                            i -> substring(text, CAST(i * 4 + 1 AS INT), 1)),
             '')) AS resized_md5
FROM documents
""",
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset 'resize': keep every 4th payload byte (stand-in for image
    downsampling) and fingerprint the smaller asset — bytes-in/bytes-out
    mapInPandas, the exact shape of a real thumbnail kernel."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return resize_assets(d, factor=4)


@register(
    "q_mm_features",
    family="llm-multimodal",
    oracle="""
WITH b AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> ascii(substring(text, CAST(i AS INT), 1))) AS bytes_list
  FROM documents
)
SELECT doc_id,
       CAST(list_sum(bytes_list) AS BIGINT) AS byte_sum,
       CAST(list_min(bytes_list) AS INT) AS byte_min,
       CAST(list_max(bytes_list) AS INT) AS byte_max,
       CAST(list_sum(bytes_list) AS BIGINT) / len(bytes_list) AS byte_mean
FROM b
""",
)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset feature extraction: numpy byte statistics per asset inside
    the Arrow batch (where a real pipeline computes embeddings or
    spectrograms). Integer sums exact; mean is one IEEE division."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return extract_features(d)


@register(
    "q_mm_decode_jpeg_progressive",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(8 * (2 + doc_id % 4) AS INT) AS width,
       CAST(24 AS INT) AS height,
       CAST(64 * list_sum(flatten(list_transform(range(0, 3), by ->
              list_transform(range(0, 2 + doc_id % 4), bx ->
                (doc_id * 9 + by * 37 + bx * 17) % 256)))) AS BIGINT)
         AS px_sum
FROM documents
""",
)
def q_mm_decode_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG decode (round 11, r10 VERDICT task #4 —
    the largest remaining real-web codec share behind the PIL seam):
    each doc gets a deterministic grayscale image of 3 x (2 + doc_id%4)
    8x8 blocks, block (by, bx) constant at (doc_id*9 + by*37 + bx*17) %
    256, encoded as a genuine SOF2 progressive JFIF — the classic
    2-level successive-approximation scan script (DC first Al=1, DC
    refine raw bits, per-band AC first + AC refine with EOB runs) —
    then decoded by the independent multi-scan T.81 annex-G parser
    (spectral-selection accumulation, successive-approximation
    refinement, EOB-run skips, buffered correction bits) and reduced to
    the pixel sum. Constant blocks under the all-ones quant table make
    the pipeline exact, so the oracle prices the expected sum straight
    from the block formula WITHOUT any codec — the baseline playbook
    (q_mm_decode_jpeg) applied to the progressive decoder; the hash
    can only match if every scan's partial coefficients compose to the
    exact DC. Per-doc width variation pins the scan-grid layout.

    Lossy-path coverage (nonzero AC through all four scan types, color,
    4:2:0 with the scan-grid/MCU-grid mismatch) lives in
    tests/test_multimodal.py as progressive==baseline pixel-equality —
    both forms decode the same quantized coefficients."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                bw = 2 + doc_id % 4
                by, bx = np.meshgrid(np.arange(3), np.arange(bw), indexing="ij")
                blocks = ((doc_id * 9 + by * 37 + bx * 17) % 256).astype(np.uint8)
                img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
                arr = decode_jpeg(encode_jpeg_progressive(img))
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


@register(
    "q_mm_decode_png16",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(8 + doc_id % 5 AS INT) AS width,
       CAST(8 AS INT) AS height,
       CAST(list_sum(flatten(list_transform(range(0, 8), y ->
            list_transform(range(0, 8 + doc_id % 5), x ->
              (doc_id * 257 + 7 * y + 3 * x) % 65536)))) AS BIGINT)
         AS px_sum
FROM documents
""",
)
def q_mm_decode_png16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit ADAM7-interlaced PNG decode (round 11 — the two remaining
    PNG lanes closed together): each doc gets a deterministic
    (8 x 8+doc_id%5) GRAY 16-bit image (pixel[y,x] = (doc_id*257 + 7y
    + 3x) % 65536, exercising values past the 8-bit range in every
    row), encoded as a genuine interlaced PNG with scanline filter
    doc_id % 5 — so all five byte-level filters run over 2-byte pixels
    across the seven Adam7 passes (each pass an independently filtered
    sub-image; narrow images make some passes empty) — then decoded
    back by the generic byte-level unfilter + pass scatter and reduced
    to the pixel sum. PNG is lossless, so the oracle prices the sum
    straight from the pixel formula, codec-free (the q_mm_decode_png
    playbook at double depth + interlace)."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_png, encode_png

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 8 + doc_id % 5
                y, x = np.meshgrid(np.arange(8), np.arange(w), indexing="ij")
                img = ((doc_id * 257 + 7 * y + 3 * x) % 65536).astype(np.uint16)
                arr = decode_png(
                    encode_png(img, filter_type=doc_id % 5, interlace=True)
                )
                assert arr.dtype == np.uint16
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


# palette-sum macros for the animated-GIF oracle: the global table is
# the q_mm_decode_gif formula, the local table a second formula; idx
# expressions are substituted textually (DuckDB lambdas can't hold
# subqueries — the q_mm_decode_jpeg_color composition technique)
def _gif_pal3(i: str) -> str:
    return (
        f"((doc_id * 3 + ({i}) * 11) % 256"
        f" + (doc_id * 7 + ({i}) * 5) % 256"
        f" + (doc_id * 13 + ({i}) * 3) % 256)"
    )


def _gif_lpal3(i: str) -> str:
    return (
        f"((doc_id * 5 + ({i}) * 7) % 256"
        f" + (doc_id * 11 + ({i}) * 13) % 256"
        f" + (doc_id + ({i}) * 17) % 256)"
    )


_GIF_ANIM_SQL = f"""
SELECT doc_id,
       CAST(3 AS INT) AS n_frames,
       CAST(9 + doc_id % 3 AS INT) AS width,
       CAST(8 AS INT) AS height,
       CAST(
         -- composed frame 1: full-screen interlaced frame
         list_sum(flatten(list_transform(range(0, 8), y ->
           list_transform(range(0, 9 + doc_id % 3), x ->
             {_gif_pal3('(doc_id + 5*y + 3*x) % 8')}))))
         -- composed frame 2: transparent sub-rect over frame 1
       + list_sum(flatten(list_transform(range(0, 8), y ->
           list_transform(range(0, 9 + doc_id % 3), x ->
             CASE WHEN y >= 1 AND y < 5 AND x >= 2 AND x < 7
                       AND (doc_id + 2*(y-1) + (x-2)) % 8 <> doc_id % 8
                  THEN {_gif_pal3('(doc_id + 2*(y-1) + (x-2)) % 8')}
                  ELSE {_gif_pal3('(doc_id + 5*y + 3*x) % 8')} END))))
         -- composed frame 3: frame-2 rect restored to background
         -- (disposal 2, bg index 0), then the local-palette rect
       + list_sum(flatten(list_transform(range(0, 8), y ->
           list_transform(range(0, 9 + doc_id % 3), x ->
             CASE WHEN y >= 3 AND y < 6 AND x >= 3 AND x < 7
                  THEN {_gif_lpal3('(doc_id * 2 + (y-3) + 2*(x-3)) % 8')}
                  WHEN y >= 1 AND y < 5 AND x >= 2 AND x < 7
                  THEN {_gif_pal3('0')}
                  ELSE {_gif_pal3('(doc_id + 5*y + 3*x) % 8')} END))))
         AS BIGINT) AS px_sum
FROM documents
"""


@register("q_mm_decode_gif_anim", family="llm-multimodal", oracle=_GIF_ANIM_SQL)
def q_mm_decode_gif_anim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANIMATED GIF decode with full composition semantics (round 11 —
    the animation half of the GIF seam): each doc gets a 3-frame
    GIF89a on an (8 x 9+doc_id%3) logical screen — frame 1 full-screen
    and INTERLACED (4-pass row reorder), frame 2 a sub-rectangle with a
    per-doc TRANSPARENT index (GCE) and disposal 2 (restore rect to
    background), frame 3 a second sub-rectangle under a LOCAL color
    table — decoded by decode_gif_frames into the three COMPOSED
    viewer frames and reduced to the pixel sum across all of them. LZW
    is lossless, so the oracle replays the composition rules on the
    index/palette formulas codec-free: the hash matches only if
    deinterlacing, transparency masking, sub-rect placement, disposal-2
    restoration and local-table override each land pixel-exact.

    Scale shape: constant-per-asset Python decode, corpus-parallel
    under the bounded-memory Arrow mapInPandas kernel — the cost model
    of every real-codec key."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 9 + doc_id % 3
                i = np.arange(8)
                pal = np.stack(
                    [(doc_id * 3 + i * 11) % 256,
                     (doc_id * 7 + i * 5) % 256,
                     (doc_id * 13 + i * 3) % 256], axis=1
                ).astype(np.uint8)
                lpal = np.stack(
                    [(doc_id * 5 + i * 7) % 256,
                     (doc_id * 11 + i * 13) % 256,
                     (doc_id + i * 17) % 256], axis=1
                ).astype(np.uint8)
                y1, x1 = np.meshgrid(np.arange(8), np.arange(w), indexing="ij")
                idx1 = ((doc_id + 5 * y1 + 3 * x1) % 8).astype(np.uint8)
                y2, x2 = np.meshgrid(np.arange(4), np.arange(5), indexing="ij")
                idx2 = ((doc_id + 2 * y2 + x2) % 8).astype(np.uint8)
                y3, x3 = np.meshgrid(np.arange(3), np.arange(4), indexing="ij")
                idx3 = ((doc_id * 2 + y3 + 2 * x3) % 8).astype(np.uint8)
                data = encode_gif_animated(
                    (8, w),
                    [
                        dict(indices=idx1, disposal=1, interlace=True),
                        dict(indices=idx2, x0=2, y0=1, disposal=2,
                             transparent=doc_id % 8),
                        dict(indices=idx3, x0=3, y0=3, disposal=1,
                             palette=lpal),
                    ],
                    pal,
                    bg_index=0,
                )
                frames = decode_gif_frames(data)
                out.append(
                    (doc_id, frames.shape[0], frames.shape[2],
                     frames.shape[1], int(frames.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_frames", "width", "height", "px_sum"],
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel,
        "doc_id long, n_frames int, width int, height int, px_sum long",
    )


@register(
    "q_mm_decode_tiff",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(6 + doc_id % 4 AS INT) AS width,
       CAST(5 AS INT) AS height,
       CAST(list_sum(flatten(list_transform(range(0, 5), y ->
            flatten(list_transform(range(0, 6 + doc_id % 4), x ->
              list_transform(range(0, 3),
                c -> (doc_id * 17 + 9 * y + 5 * x + 3 * c) % 256)))))) AS BIGINT)
         AS px_sum
FROM documents
""",
)
def q_mm_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-TIFF decode (round 11 — the simplest remaining
    exotic-format seam made native): each doc gets a deterministic
    (5 x 6+doc_id%4) RGB image (pixel[y,x,c] = (doc_id*17 + 9y + 5x +
    3c) % 256), encoded as a genuine multi-strip TIFF — PackBits
    compression for odd docs, big-endian (MM) byte order for doc_id %
    3 == 0, rows_per_strip=2 so every file splits into three strips —
    then decoded by the independent IFD-walking parser and reduced to
    the pixel sum. TIFF here is lossless, so the oracle prices the sum
    from the pixel formula codec-free; the per-doc variation pins the
    endianness, compression and strip-reassembly lanes under one hash.
    LZW/tiled/16-bit TIFF stays the loud PIL seam."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_tiff, encode_tiff

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 6 + doc_id % 4
                y, x, c = np.meshgrid(
                    np.arange(5), np.arange(w), np.arange(3), indexing="ij"
                )
                img = ((doc_id * 17 + 9 * y + 5 * x + 3 * c) % 256).astype(
                    np.uint8
                )
                arr = decode_tiff(
                    encode_tiff(
                        img,
                        packbits=bool(doc_id % 2),
                        big_endian=doc_id % 3 == 0,
                        rows_per_strip=2,
                    )
                )
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


_ADPCM_STEP_SQL = None  # built below from the operator tables


def _adpcm_oracle() -> str:
    from cellbase_spark.operators.multimodal import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
    )

    st = "[" + ", ".join(map(str, _IMA_STEP_TABLE)) + "]"
    it = "[" + ", ".join(map(str, _IMA_INDEX_TABLE)) + "]"
    return f"""
WITH RECURSIVE steps AS (
  SELECT doc_id,
         CAST(0 AS BIGINT) AS j,
         CAST((doc_id * 57) % 4096 - 2048 AS BIGINT) AS pred,
         CAST(doc_id % 89 AS BIGINT) AS idx,
         CAST((doc_id * 57) % 4096 - 2048 AS BIGINT) AS total,
         CAST(39 + doc_id % 9 AS BIGINT) AS n_nib
  FROM documents
  UNION ALL
  SELECT doc_id, j + 1,
         GREATEST(-32768, LEAST(32767, pred + sgn * d)),
         LEAST(88, GREATEST(0, idx + ({it})[(nib % 8) + 1])),
         total + GREATEST(-32768, LEAST(32767, pred + sgn * d)),
         n_nib
  FROM (
    SELECT s.*, nib, sgn,
           step // 8 + (nib % 2) * (step // 4)
             + ((nib // 2) % 2) * (step // 2)
             + ((nib // 4) % 2) * step AS d
    FROM (
      SELECT s0.*,
             (s0.doc_id * 7 + s0.j * 3) % 16 AS nib,
             1 - 2 * (((s0.doc_id * 7 + s0.j * 3) % 16) // 8) AS sgn,
             ({st})[s0.idx + 1] AS step
      FROM steps s0
      WHERE s0.j < s0.n_nib
    ) s
  ) t
)
SELECT doc_id,
       CAST(40 + doc_id % 9 AS INT) AS n_samples,
       total AS sample_sum
FROM steps
WHERE j = n_nib
"""


@register(
    "q_mm_decode_webp",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(8 + doc_id % 5 AS INT) AS width,
       CAST(10 AS INT) AS height,
       CAST(list_sum(flatten(list_transform(range(0, 10), y ->
            flatten(list_transform(range(0, 8 + doc_id % 5), x ->
              [(doc_id * 13 + 7 * LEAST(y, 4) + 5 * x) % 256,
               (doc_id * 13 + 7 * LEAST(y, 4) + 5 * x + 3) % 256,
               (doc_id * 13 + 7 * LEAST(y, 4) + 5 * x + 6) % 256,
               (doc_id + x) % 256]))))) AS BIGINT) AS px_sum
FROM documents
""",
)
def q_mm_decode_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP lossless (VP8L) decode (round 11 — the last mainstream
    image-container seam): each doc gets a deterministic 10-row RGBA
    image whose bottom six rows repeat row 4 (pixel[y,x] uses
    min(y, 4); alpha = (doc_id + x) % 256 — a genuinely varying alpha
    plane), written as a genuine VP8L stream by the subset encoder —
    per-channel Huffman-fit prefix codes (simple AND normal forms with
    code-length codes appear across the corpus as channel alphabets
    vary), LZ77 row backrefs with direct distance codes for the
    repeated band — and decoded by the independent bit-level parser
    (canonical prefix reconstruction, LSB-first reads, RIFF/VP8L
    container walk). Lossless, so the oracle prices the RGBA sum from
    the formula codec-free. Transforms/color-cache/meta-prefix/the
    2D distance map stay loud seams (operators/webp.py)."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.webp import decode_webp, encode_webp

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 8 + doc_id % 5
                y, x = np.meshgrid(np.arange(10), np.arange(w), indexing="ij")
                ym = np.minimum(y, 4)
                img = np.stack(
                    [
                        (doc_id * 13 + 7 * ym + 5 * x) % 256,
                        (doc_id * 13 + 7 * ym + 5 * x + 3) % 256,
                        (doc_id * 13 + 7 * ym + 5 * x + 6) % 256,
                        (doc_id + x) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                arr = decode_webp(encode_webp(img))
                assert arr.shape == (10, w, 4)
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


def _adpcm_stereo_oracle() -> str:
    from cellbase_spark.operators.multimodal import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
    )

    st = "[" + ", ".join(map(str, _IMA_STEP_TABLE)) + "]"
    it = "[" + ", ".join(map(str, _IMA_INDEX_TABLE)) + "]"
    return f"""
WITH RECURSIVE steps AS (
  SELECT doc_id, c,
         CAST(0 AS BIGINT) AS j,
         CAST((doc_id * 57 + 100 * c) % 4096 - 2048 AS BIGINT) AS pred,
         CAST((doc_id + 13 * c) % 89 AS BIGINT) AS idx,
         CAST((doc_id * 57 + 100 * c) % 4096 - 2048 AS BIGINT) AS total,
         CAST(31 + doc_id % 8 AS BIGINT) AS n_nib
  FROM documents CROSS JOIN (SELECT UNNEST([0, 1]) AS c) chs
  UNION ALL
  SELECT doc_id, c, j + 1,
         GREATEST(-32768, LEAST(32767, pred + sgn * d)),
         LEAST(88, GREATEST(0, idx + ({it})[(nib % 8) + 1])),
         total + GREATEST(-32768, LEAST(32767, pred + sgn * d)),
         n_nib
  FROM (
    SELECT s.*, nib, sgn,
           step // 8 + (nib % 2) * (step // 4)
             + ((nib // 2) % 2) * (step // 2)
             + ((nib // 4) % 2) * step AS d
    FROM (
      SELECT s0.*,
             (s0.doc_id * 7 + s0.j * 3 + 5 * s0.c) % 16 AS nib,
             1 - 2 * (((s0.doc_id * 7 + s0.j * 3 + 5 * s0.c) % 16) // 8) AS sgn,
             ({st})[s0.idx + 1] AS step
      FROM steps s0
      WHERE s0.j < s0.n_nib
    ) s
  ) t
)
SELECT doc_id,
       CAST(32 + doc_id % 8 AS INT) AS n_samples,
       MAX(CASE WHEN c = 0 THEN total END) AS ch0_sum,
       MAX(CASE WHEN c = 1 THEN total END) AS ch1_sum
FROM steps
WHERE j = n_nib
GROUP BY doc_id
"""


@register(
    "q_mm_decode_adpcm_stereo",
    family="llm-multimodal",
    oracle=_adpcm_stereo_oracle(),
)
def q_mm_decode_adpcm_stereo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO IMA ADPCM WAV decode (round 11 — the interleaved-word
    half of the format, closing the mono key's documented seam): real
    stereo blocks carry one 4-byte header PER CHANNEL then alternate
    4-byte words of 8 single-channel nibbles — two INDEPENDENT state
    machines whose streams are woven at word granularity. Each doc's
    payload is a genuine 2-channel ADPCM WAV with per-channel formula
    nibbles (nibble[c][j] = (doc_id*7 + 3j + 5c) % 16, per-channel
    initial predictors/indices), decoded and reduced to per-channel
    sample sums. The oracle replays BOTH channels' folds in one
    recursive CTE keyed by (doc_id, c) and pivots the two totals — a
    de-interleave bug (the classic stereo-ADPCM failure: nibbles
    routed to the wrong channel's state) diverges both columns."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import (
        decode_wav,
        ima_wav_from_nibbles_stereo,
    )

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                n_nib = 31 + doc_id % 8
                nibs = [
                    [(doc_id * 7 + 3 * j + 5 * c) % 16 for j in range(n_nib)]
                    for c in (0, 1)
                ]
                wav = ima_wav_from_nibbles_stereo(
                    nibs,
                    [(doc_id * 57 + 100 * c) % 4096 - 2048 for c in (0, 1)],
                    [(doc_id + 13 * c) % 89 for c in (0, 1)],
                )
                samples, rate = decode_wav(wav)
                assert rate == 8000 and samples.shape == (n_nib + 1, 2)
                s = samples.astype(np.int64)
                out.append(
                    (doc_id, samples.shape[0],
                     int(s[:, 0].sum()), int(s[:, 1].sum()))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_samples", "ch0_sum", "ch1_sum"],
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel,
        "doc_id long, n_samples int, ch0_sum long, ch1_sum long",
    )


@register("q_mm_decode_adpcm", family="llm-multimodal", oracle=_adpcm_oracle())
def q_mm_decode_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMA/DVI ADPCM WAV decode (round 11 — the compressed-speech WAV
    lane, format tag 0x11: 4-bit differential nibbles through the
    89-step quantizer with a per-nibble step-index walk). Each doc's
    payload is a genuine mono ADPCM WAV (fmt extension with
    samplesPerBlock, fact chunk, 4-byte block header carrying sample 0
    + initial step index) whose nibble stream follows a formula
    (nibble[j] = (doc_id*7 + 3j) % 16, initial predictor
    (doc_id*57) % 4096 − 2048, initial index doc_id % 89 — covering
    both signs, all index deltas and both clamps), decoded by the
    independent chunk-walking parser. The decode state machine is a
    pure integer fold, so the oracle REPLAYS IT in SQL as a recursive
    CTE over (pred, idx, total) — a genuinely sequential codec under
    the same codec-free hash discipline as the table codecs. (A
    list_reduce lambda fold was rejected: DuckDB 1.0's lambda CSE
    mis-binds a subexpression duplicated across struct fields —
    measured, not assumed.) The stereo half is q_mm_decode_adpcm_stereo."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import (
        decode_wav,
        ima_wav_from_nibbles,
    )

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                n = 40 + doc_id % 9
                nibs = [(doc_id * 7 + 3 * j) % 16 for j in range(n - 1)]
                wav = ima_wav_from_nibbles(
                    nibs, (doc_id * 57) % 4096 - 2048, doc_id % 89
                )
                samples, rate = decode_wav(wav)
                assert rate == 8000 and samples.dtype == np.int16
                out.append(
                    (doc_id, samples.shape[0],
                     int(samples.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_samples", "sample_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, n_samples int, sample_sum long"
    )


@register(
    "q_mm_decode_wav_float",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(50 + doc_id % 7 AS INT) AS n_samples,
       CAST(list_sum(list_transform(range(0, 50 + doc_id % 7),
            i -> (doc_id * 11 + 5 * i) % 2001 - 1000)) AS BIGINT)
         AS sum_x2
FROM documents
""",
)
def q_mm_decode_wav_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE float32 WAV decode (round 11 — format tag 3, the
    studio/DAW interchange lane): each doc's clip is half-integer
    valued (sample[i] = ((doc_id*11 + 5i) % 2001 − 1000) / 2 —
    exactly representable in binary32, so the container round-trip is
    bit-exact AND the doubled sample sum is an exact integer the
    oracle prices from the formula with no float-tolerance hedging;
    the halves prove a genuine non-integer float path). Written as a
    real fmt-3 RIFF file and decoded by the chunk walker."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_wav, encode_wav

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                n = 50 + doc_id % 7
                i = np.arange(n, dtype=np.int64)
                clip = (
                    ((doc_id * 11 + 5 * i) % 2001 - 1000) / 2.0
                ).astype(np.float32)
                samples, rate = decode_wav(
                    encode_wav(clip, 44100, codec="float32")
                )
                assert rate == 44100 and samples.dtype == np.float32
                sum_x2 = float(samples.astype(np.float64).sum() * 2.0)
                assert sum_x2 == int(sum_x2)
                out.append((doc_id, samples.shape[0], int(sum_x2)))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_samples", "sum_x2"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, n_samples int, sum_x2 long"
    )


@register(
    "q_mm_decode_flac",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(120 + doc_id % 13 AS INT) AS n_samples,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT) AS n_channels,
       CAST(list_sum(flatten(list_transform(range(0, 120 + doc_id % 13), i ->
         list_transform(range(0, CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END),
           c -> (doc_id * 31 + 17 * i + 9 * c) % 4096 - 2048)))) AS BIGINT)
         AS sample_sum
FROM documents
""",
)
def q_mm_decode_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL subset-FLAC decode (round 11 — the dominant lossless audio
    archive format, previously wholly behind the seam): each doc gets a
    deterministic clip (sample[i, c] = (doc_id*31 + 17i + 9c) mod 4096
    − 2048; stereo for doc_id % 3 == 0, mono otherwise), written as a
    genuine FLAC stream by the subset encoder — 64-sample frames (so
    every doc is multi-frame with UTF-8-coded frame numbers), mid/side
    decorrelation for the stereo docs, Rice partition order 1 for odd
    docs and the raw-bits escape forced for doc_id % 5 == 0 — then
    decoded by the independent bit-level parser (STREAMINFO walk, frame
    sync, header CRC-8 + frame CRC-16 verified, CONSTANT/VERBATIM/
    FIXED(0-4)/quantized-LPC subframes — doc_id % 4 == 1 rides the LPC
    lane — partitioned Rice incl. escape, mid/side reconstruction).
    FLAC is lossless, so the oracle prices the sample sum from the
    content formula codec-free."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_flac, encode_flac

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                n = 120 + doc_id % 13
                n_ch = 2 if doc_id % 3 == 0 else 1
                i, c = np.meshgrid(np.arange(n), np.arange(n_ch), indexing="ij")
                clip = ((doc_id * 31 + 17 * i + 9 * c) % 4096 - 2048).astype(
                    np.int32
                )
                if n_ch == 1:
                    clip = clip[:, 0]
                samples, rate = decode_flac(
                    encode_flac(
                        clip,
                        22050,
                        block_size=64,
                        stereo_mode="mid_side" if n_ch == 2 else "independent",
                        partition_order=doc_id % 2,
                        force_escape=doc_id % 5 == 0,
                        lpc_order=4 if doc_id % 4 == 1 else None,
                    )
                )
                assert rate == 22050
                out.append(
                    (doc_id, n, n_ch, int(np.asarray(samples, np.int64).sum()))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_samples", "n_channels", "sample_sum"],
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, n_samples int, n_channels int, sample_sum long"
    )


@register(
    "q_mm_decode_wav_g711",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(40 + doc_id % 11 AS INT) AS n_samples,
       CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS law,
       CAST(list_sum(list_transform(
           list_transform(range(0, 40 + doc_id % 11),
                          i -> (doc_id * 29 + 13 * i) % 256),
           v -> CASE WHEN doc_id % 2 = 0 THEN
                  (CASE WHEN 255 - v >= 128 THEN -1 ELSE 1 END)
                  * ((((255 - v) % 16) * 8 + 132)
                     * (1 << CAST(((255 - v) // 16) % 8 AS INT)) - 132)
                ELSE
                  (CASE WHEN xor(v, 85) >= 128 THEN 1 ELSE -1 END)
                  * (CASE WHEN (xor(v, 85) // 16) % 8 = 0
                          THEN (xor(v, 85) % 16) * 16 + 8
                          ELSE ((xor(v, 85) % 16) * 16 + 264)
                               * (1 << CAST((xor(v, 85) // 16) % 8 - 1 AS INT))
                     END)
                END)) AS BIGINT) AS sample_sum
FROM documents
""",
)
def q_mm_decode_wav_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 companded WAV decode (round 11 — the telephony-audio seam:
    format tags 7/6, μ-law for even docs, A-law for odd). Each doc's
    clip is the G.711 expansion of a deterministic byte stream
    (byte[i] = (doc_id*29 + 13i) % 256 — covering all 256 codes incl.
    both zero codes and both sign halves), compressed back into a
    genuine 8-bit WAV by encode_wav's G.711 companders and expanded by
    decode_wav's table codec. G.711 is idempotent on its own
    quantization lattice (encode∘decode fixes every code; μ-law's
    negative-zero 0x7F re-encodes as 0xFF, which expands to the same
    sample), so the decoded sample sum is priced by replaying the
    published expansion formulas in SQL, codec-free: μ:
    ((m<<3)+0x84)<<e - 0x84 on the complemented byte; A: (m<<4)+8 /
    ((m<<4)+0x108)<<(e-1) on the 0x55-toggled byte, sign from bit 7.
    Float/ADPCM audio stays the loud seam."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import (
        _g711_decode_table,
        decode_wav,
        encode_wav,
    )

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                n = 40 + doc_id % 11
                law = "ulaw" if doc_id % 2 == 0 else "alaw"
                b = (doc_id * 29 + 13 * np.arange(n)) % 256
                clip = _g711_decode_table(law)[b]
                samples, rate = decode_wav(
                    encode_wav(clip, 8000, codec=law)
                )
                assert rate == 8000 and samples.dtype == np.int16
                out.append(
                    (doc_id, samples.shape[0], law,
                     int(samples.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_samples", "law", "sample_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, n_samples int, law string, sample_sum long"
    )


@register(
    "q_mm_decode_tiff_lzw",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(18 + doc_id % 5 AS INT) AS width,
       CAST(16 AS INT) AS height,
       CAST(list_sum(flatten(list_transform(range(0, 16), y ->
            flatten(list_transform(range(0, 18 + doc_id % 5), x ->
              list_transform(range(0, 3),
                c -> (doc_id * 23 + 13 * y + 7 * x + 5 * c) % 256)))))) AS BIGINT)
         AS px_sum
FROM documents
""",
)
def q_mm_decode_tiff_lzw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LZW-compressed TIFF decode (round 11 — the biggest remaining
    TIFF lane behind the PIL seam: Compression 5 with the TIFF-flavor
    LZW that differs from GIF's in bit order (MSB-first), width
    schedule (the 'early change' one-entry-early bump) and reset
    protocol, plus the Predictor-2 horizontal-differencing transform
    real writers pair with it). Each doc gets a deterministic
    (16 x 18+doc_id%5) RGB image (pixel[y,x,c] = (doc_id*23 + 13y +
    7x + 5c) % 256 — low-redundancy on purpose, so each 8-row strip's
    dictionary crosses the 511-entry early-change boundary and the
    9->10-bit width bump is exercised under the hash), written as a
    genuine LZW TIFF — Predictor 2 for odd docs, big-endian for
    doc_id % 3 == 0 — and decoded by the independent parser. LZW is
    lossless, so the oracle prices the pixel sum from the formula
    codec-free. Tiled/planar TIFF stays the loud seam."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_tiff, encode_tiff

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 18 + doc_id % 5
                y, x, c = np.meshgrid(
                    np.arange(16), np.arange(w), np.arange(3), indexing="ij"
                )
                img = ((doc_id * 23 + 13 * y + 7 * x + 5 * c) % 256).astype(
                    np.uint8
                )
                arr = decode_tiff(
                    encode_tiff(
                        img,
                        lzw=True,
                        predictor=2 if doc_id % 2 else 1,
                        big_endian=doc_id % 3 == 0,
                        rows_per_strip=8,
                    )
                )
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


@register(
    "q_mm_decode_tiff16",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(5 + doc_id % 4 AS INT) AS width,
       CAST(7 AS INT) AS height,
       CAST(list_sum(flatten(list_transform(range(0, 7), y ->
            flatten(list_transform(range(0, 5 + doc_id % 4), x ->
              list_transform(range(0, 3),
                c -> (doc_id * 257 + 1031 * y + 517 * x + 263 * c) % 65536))))))
         AS BIGINT) AS px_sum
FROM documents
""",
)
def q_mm_decode_tiff16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-BIT TIFF decode (round 11 — the high-dynamic-range lane:
    scientific/scanner imagery): each doc gets a deterministic
    (7 x 5+doc_id%4) RGB image of full-range 16-bit samples
    (pixel[y,x,c] = (doc_id*257 + 1031y + 517x + 263c) % 65536),
    written with the per-doc rotation LZW/PackBits/none/Deflate
    compression (doc_id % 4 — Deflate is TIFF tag 8, one stdlib-zlib
    stream per chunk), Predictor-2 for odd docs (differencing runs on
    SAMPLES, not bytes — the 16-bit-specific trap), big-endian for
    doc_id % 2 == 0 (sample byte order follows the file header — the
    other trap), PLANAR configuration for doc_id % 5 < 2 (chunks
    arrive as per-channel runs), and TILED layout for doc_id % 7 < 2
    (4x4 blocks, edge tiles padded — tags 322-325), then decoded by
    the independent parser. Lossless, so the oracle prices the pixel
    sum from the formula codec-free; JPEG-in-TIFF stays the loud
    seam."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_tiff, encode_tiff

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 5 + doc_id % 4
                y, x, c = np.meshgrid(
                    np.arange(7), np.arange(w), np.arange(3), indexing="ij"
                )
                img = (
                    (doc_id * 257 + 1031 * y + 517 * x + 263 * c) % 65536
                ).astype(np.uint16)
                comp = doc_id % 4
                arr = decode_tiff(
                    encode_tiff(
                        img,
                        packbits=comp == 1,
                        lzw=comp == 0,
                        deflate=comp == 3,
                        predictor=2 if doc_id % 2 else 1,
                        big_endian=doc_id % 2 == 0,
                        rows_per_strip=3,
                        planar=doc_id % 5 < 2,
                        tile=(4, 4) if doc_id % 7 < 2 else None,
                    )
                )
                assert arr.dtype == np.uint16
                out.append(
                    (doc_id, arr.shape[1], arr.shape[0],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "px_sum"]
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, width int, height int, px_sum long"
    )


@register(
    "q_mm_decode_wav24",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(48 + doc_id % 9 AS INT) AS n_frames,
       CAST(2 AS INT) AS n_channels,
       CAST(list_sum(flatten(list_transform(range(0, 48 + doc_id % 9), i ->
            list_transform(range(0, 2),
              c -> (doc_id * 19 + i * 11 + c * 7) % 16777216 - 8388608))))
         AS BIGINT) AS sample_sum
FROM documents
""",
)
def q_mm_decode_wav24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO 24-bit PCM WAV decode (round 11 — the PCM lanes the mono
    16-bit key left open): each doc gets a deterministic 2-channel
    24-bit clip (sample[i, c] = (doc_id*19 + 11i + 7c) mod 2^24 -
    2^23, exercising the full signed 24-bit range incl. negatives whose
    sign lives in bit 23 of the packed 3-byte samples), written as a
    genuine RIFF PCM24 file (channel-interleaved frames, 6-byte block
    align) and decoded back by the independent chunk-walking parser
    (3-byte little-endian reassembly + sign extension,
    de-interleaving). PCM is lossless, so the oracle prices the sample
    sum from the formula codec-free."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_wav, encode_wav

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                n = 48 + doc_id % 9
                i, c = np.meshgrid(np.arange(n), np.arange(2), indexing="ij")
                clip = (
                    (doc_id * 19 + i * 11 + c * 7) % (1 << 24) - (1 << 23)
                ).astype(np.int32)
                samples, rate = decode_wav(encode_wav(clip, 48000, bits=24))
                assert rate == 48000 and samples.dtype == np.int32
                out.append(
                    (doc_id, samples.shape[0], samples.shape[1],
                     int(samples.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_frames", "n_channels", "sample_sum"],
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel, "doc_id long, n_frames int, n_channels int, sample_sum long"
    )


@register(
    "q_mm_decode_y4m420",
    family="llm-multimodal",
    oracle="""
SELECT doc_id,
       CAST(2 AS INT) AS n_frames,
       CAST(8 + 2 * (doc_id % 3) AS INT) AS width,
       CAST(6 AS INT) AS height,
       CAST(
         list_sum(flatten(list_transform(range(0, 2), f ->
           flatten(list_transform(range(0, 6), y ->
             list_transform(range(0, 8 + 2 * (doc_id % 3)), x ->
               (doc_id + 7*f + 3*y + x) % 256))))))
       + list_sum(flatten(list_transform(range(0, 2), f ->
           flatten(list_transform(range(0, 3), by ->
             list_transform(range(0, 4 + doc_id % 3), bx ->
               4 * ((doc_id * 5 + f * 3 + by * 7 + bx * 11) % 256)))))))
       + list_sum(flatten(list_transform(range(0, 2), f ->
           flatten(list_transform(range(0, 3), by ->
             list_transform(range(0, 4 + doc_id % 3), bx ->
               4 * ((doc_id * 3 + f * 9 + by * 5 + bx * 13) % 256)))))))
         AS BIGINT) AS px_sum
FROM documents
""",
)
def q_mm_decode_y4m420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSAMPLED-chroma video decode (round 11 — the C420 half of the
    Y4M seam): each doc gets a 2-frame clip on a (6 x 8+2*(doc%3))
    grid — full-resolution luma formula, chroma CONSTANT per 2x2 block
    (U block (by,bx) = (doc_id*5 + 3f + 7by + 11bx) % 256, V similar) —
    written as genuine C420 (half-res planar chroma, block-mean
    downsample) and decoded back through the replication upsampler.
    Constant chroma blocks make the lossy subsample path EXACT (the
    constant-block playbook again), so the oracle prices luma directly
    and each chroma block as 4x its value, codec-free — the hash pins
    plane sizes, the planar walk, and both the down- and up-sample
    geometry. C422 and the lossy bound live in tests."""
    import numpy as np
    import pandas as pd

    from cellbase_spark.operators.multimodal import decode_y4m, encode_y4m

    def kernel(batches):
        for pdf in batches:
            out = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                w = 8 + 2 * (doc_id % 3)
                f, y, x = np.meshgrid(
                    np.arange(2), np.arange(6), np.arange(w), indexing="ij"
                )
                yy = ((doc_id + 7 * f + 3 * y + x) % 256).astype(np.uint8)
                fb, by, bx = np.meshgrid(
                    np.arange(2), np.arange(3), np.arange(w // 2), indexing="ij"
                )
                ub = ((doc_id * 5 + fb * 3 + by * 7 + bx * 11) % 256)
                vb = ((doc_id * 3 + fb * 9 + by * 5 + bx * 13) % 256)
                u = np.kron(ub, np.ones((1, 2, 2))).astype(np.uint8)
                v = np.kron(vb, np.ones((1, 2, 2))).astype(np.uint8)
                clip = np.stack([yy, u, v], axis=3)
                arr = decode_y4m(encode_y4m(clip, colorspace="C420"))
                assert np.array_equal(arr, clip)
                out.append(
                    (doc_id, arr.shape[0], arr.shape[2], arr.shape[1],
                     int(arr.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_frames", "width", "height", "px_sum"],
            )

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(
        kernel,
        "doc_id long, n_frames int, width int, height int, px_sum long",
    )
