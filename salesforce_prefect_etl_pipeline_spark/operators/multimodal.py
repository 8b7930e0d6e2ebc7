"""Multimodal (image/audio/video) column operators.

Design for a 100 TB training-data pipeline: media travels as opaque
``binary`` columns with typed metadata alongside (modality, mime,
width/height/duration, ...). Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the heavy
per-item Python (PIL/ffmpeg/torchvision in a real deployment) amortizes
JVM<->Python transfer across whole record batches and parallelizes per
partition.

The heavyweight media libraries are NOT in this container, so there are
two decode tiers:

- ``decode_stub=True`` (default) computes deterministic features from
  the raw bytes (length, simple byte stats, a content hash) with the
  identical batch shapes, schemas, and partitioning the real kernels
  would use. Byte-level features are SQL-expressible, which lets the
  plumbing be oracle-checked end-to-end.
- ``decode_stub=False`` performs REAL decoding for the self-contained
  formats this module implements natively: 24-bit uncompressed BMP
  (header parse: pixel offset, signed width/height, bpp, 4-byte row
  padding) and binary PPM (P6, whitespace/comment-tolerant header).
  ``synthetic_bmp_media`` builds genuine BMP files whose pixel values
  are a pure function of (media_id, pixel index), so decoded pixel
  statistics are reproducible in the DuckDB oracle arithmetically —
  real decode, hard-checked. Other formats (JPEG/PNG/MP4) raise
  ValueError at the decoder dispatch where PIL/ffmpeg would plug in.
"""

from __future__ import annotations

import hashlib
import threading as _threading
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from salesforce_prefect_etl_pipeline_spark.operators.dedup import (
    banded_hamming_pairs,
    hash64_band_chunks,
    pack_bits64,
)


def _h60(s: str) -> int:
    """Driver-side twin of ``dedup.hash60`` (first 15 hex chars of md5
    as a 60-bit int) — the one hash convention every synthetic-corpus
    generator in this module shares with its SQL oracle."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


#: Schema of a multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the testdata: treat document text bytes as an opaque
    payload so the multimodal plumbing has real data to move."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
    )


# ----------------------------------------------------------------------
# Native image codecs (self-contained formats; PIL/ffmpeg slot)
def encode_bmp(width: int, height: int, pixels_bgr: bytes) -> bytes:
    """Minimal standards-conforming 24-bit uncompressed BMP writer:
    54-byte header (BITMAPFILEHEADER + BITMAPINFOHEADER), bottom-up rows
    each padded to a 4-byte boundary. ``pixels_bgr`` is row-major
    3*width*height bytes."""
    if len(pixels_bgr) != 3 * width * height:
        raise ValueError("pixels_bgr must be 3*width*height bytes")
    row_used = 3 * width
    row_size = (row_used + 3) & ~3
    image_size = row_size * height
    off = 54
    header = (
        b"BM"
        + (off + image_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB, uncompressed
        + image_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    pad = b"\x00" * (row_size - row_used)
    # BMP stores rows bottom-up
    rows = [
        pixels_bgr[r * row_used : (r + 1) * row_used] + pad
        for r in range(height - 1, -1, -1)
    ]
    return header + b"".join(rows)


def decode_image(payload: bytes) -> tuple[int, int, int, float]:
    """REAL image decode for the natively-supported formats. Returns
    (width, height, n_channel_bytes, mean_pixel) where the mean is over
    every pixel channel byte (padding excluded). Dispatch:

    - ``BM``: 24-bit uncompressed BMP — honors the header's pixel-array
      offset, signed height (bottom-up vs top-down), and 4-byte row
      padding.
    - ``P6``: binary PPM — whitespace/comment-tolerant header, maxval
      <= 255.
    - anything else: PIL when installed (JPEG/PNG/...; optional
      dependency, import-gated), else ValueError. Malformed headers
      (non-positive width, pixel array past end of payload) also raise
      rather than silently producing short-slice statistics."""
    b = bytes(payload)
    if b[:2] == b"BM":
        off = int.from_bytes(b[10:14], "little")
        width = int.from_bytes(b[18:22], "little", signed=True)
        height_raw = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        compression = int.from_bytes(b[30:34], "little")
        if bpp != 24 or compression != 0:
            raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={compression}")
        height = abs(height_raw)
        if width <= 0:
            raise ValueError(f"malformed BMP header: width={width}")
        row_used = 3 * width
        row_size = (row_used + 3) & ~3
        if off + row_size * height > len(b) + (row_size - row_used):
            # allow the final row to omit padding, nothing more
            raise ValueError(
                f"truncated BMP payload: need {off + row_size * height} bytes, "
                f"have {len(b)}"
            )
        total = 0
        for r in range(height):
            start = off + r * row_size
            total += sum(b[start : start + row_used])
        n = row_used * height
        return width, height, n, (total / n if n else 0.0)
    if b[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":  # comment to end of line
                while pos < len(b) and b[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(b[start:pos]))
        pos += 1  # single whitespace after maxval
        width, height, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        n = 3 * width * height
        if width <= 0 or height <= 0 or pos + n > len(b):
            raise ValueError(
                f"malformed PPM: {width}x{height}, {len(b) - pos} data bytes"
            )
        data = b[pos : pos + n]
        return width, height, n, (sum(data) / n if n else 0.0)
    try:  # optional dependency: JPEG/PNG/... via PIL when installed
        import io

        from PIL import Image
    except ImportError:
        raise ValueError(
            f"unsupported image format (magic {b[:2]!r}); install Pillow for "
            "JPEG/PNG decode"
        ) from None
    try:
        with Image.open(io.BytesIO(b)) as img:
            rgb = img.convert("RGB")
            data = rgb.tobytes()
            n = len(data)
            return rgb.width, rgb.height, n, (sum(data) / n if n else 0.0)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"PIL could not decode payload: {exc}") from exc


def _spread_ids(docs: DataFrame, heavy: bool = False) -> DataFrame:
    """Doc-id frame repartitioned to a per-modality compute floor.

    Media synthesis fans each 8-byte id row into kilobytes of payload
    inside a Python ``mapInPandas`` worker, so partitioning inherited
    from the parquet scan (1 small file -> 1 partition at test scale)
    serializes the whole synth + decode chain on ONE core. Shuffling
    ids first costs bytes-per-row; the payload generation and every
    downstream per-media Python stage then spreads across cores. An
    explicit ``repartition(n)`` is intentionally exempt from AQE
    coalescing, so the tiny exchange is not folded back to 1.

    The floor is modality-tuned, not full parallelism: each extra
    partition costs a chained Python-worker pipeline, so light
    synth kernels (one BMP / one WAV per row) peak at 4 while the
    video kernel (n_frames decodes per row) wants more (measured at
    sf0.1 local[32]: video pair op 2.90 s serial, 2.21 s at 4,
    1.62 s at 8, back to 1.96 s at 32; the image ops monotonically
    LOSE from 8 up). Floors are pinned by the session confs
    ``spark.salesforceEtl.spread.idsFloor`` / ``.idsFloorHeavy``
    (session.py; env-overridable) so cluster deployments tune them
    without code edits; a heavy floor of 0 falls back to
    ``max(8, defaultParallelism // 4)`` at call time and a floor of 1
    disables the spread. A production corpus arrives already
    partitioned — then the scan's own layout wins and no shuffle is
    added (never shrink)."""
    ids = docs.select("doc_id")
    spark = ids.sparkSession
    key = "idsFloorHeavy" if heavy else "idsFloor"
    target = int(spark.conf.get(f"spark.salesforceEtl.spread.{key}", "0"))
    if target <= 0:
        target = max(8, spark.sparkContext.defaultParallelism // 4) if heavy else 4
    if target <= 1 or ids.rdd.getNumPartitions() >= target:
        return ids
    return ids.repartition(target)


def synthetic_bmp_media(docs: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Real BMP payload per document: pixel channel byte i (row-major)
    is ``(media_id * 31 + i) % 256`` — a pure function of the id, so
    decoded statistics are reproducible arithmetically in the oracle
    while the payload is a genuine, header-complete BMP file."""
    n_px = 3 * width * height
    idx = np.arange(n_px, dtype=np.int64)

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": "image",
                    "mime": "image/bmp",
                    "payload": [
                        encode_bmp(
                            width,
                            height,
                            ((int(mid) * 31 + idx) % 256)
                            .astype(np.uint8)
                            .tobytes(),
                        )
                        for mid in ids
                    ],
                }
            )

    return _spread_ids(docs).mapInPandas(_make, MEDIA_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixel_bytes", T.LongType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """Real-decode face of the pipeline: parse each payload with
    :func:`decode_image` and emit per-item pixel statistics."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_pixel_bytes": [r[2] for r in rows],
                    "mean_pixel": [r[3] for r in rows],
                }
            )

    return media.mapInPandas(_decode, DECODED_SCHEMA)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Stub features are pure byte-level functions (deterministic, engine-
    independent): size, md5, mean byte value, and a fake "frame count"
    (bytes // 256, standing in for video frame sampling).

    With ``decode_stub=False`` the mean is computed over REAL decoded
    pixel bytes via :func:`decode_image` (BMP/PPM natively; ValueError
    for formats that would need PIL/ffmpeg) and n_frames=1 per image.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if decode_stub:
                mean = payloads.map(
                    lambda b: (sum(b) / len(b)) if len(b) else 0.0
                ).astype("float64")
                frames = payloads.map(lambda b: len(b) // 256).astype("int64")
            else:
                decoded = [decode_image(p) for p in payloads]
                mean = pd.Series([d[3] for d in decoded], dtype="float64")
                frames = pd.Series([1] * len(decoded), dtype="int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mean_byte": mean,
                    "n_frames": frames,
                }
            )

    return media.mapInPandas(_featurize, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, every_n: int = 4, frame_bytes: int = 256
) -> DataFrame:
    """Frame sampling: 1 media row -> N frame rows (every_n-th frame).

    The stub "decoder" treats the payload as a sequence of frame_bytes
    chunks (the last chunk may be short) — a real deployment swaps the
    slicing for ffmpeg keyframe extraction with the same 1->N Arrow
    batch shape. mapInPandas (not explode over a UDF-built array) so a
    batch never materializes all frames of all its rows at once; output
    partitioning inherits the input's, no shuffle.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(raw)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.mapInPandas(_frames, FRAME_SCHEMA)


def frame_sample_stats(media: DataFrame, every_n: int = 4) -> DataFrame:
    """(media_id, frame_idx, frame_len) for the sampled frames — the
    SQL-checkable face of sample_frames (DuckDB can't slice blobs, so
    the oracle checks multiplicity/indices/lengths; frame *content* is
    verified by recomputation in pytest)."""
    frames = sample_frames(media, every_n=every_n)
    return frames.select(
        "media_id",
        "frame_idx",
        F.octet_length("frame_payload").cast("long").alias("frame_len"),
    ).orderBy("media_id", "frame_idx")


def frame_sample_stats_sql(every_n: int = 4, frame_bytes: int = 256) -> str:
    return f"""
WITH f AS (
  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
),
idx AS (
  SELECT doc_id, n,
         unnest(generate_series(0, CAST(CEIL(n / {frame_bytes}.0) AS BIGINT) - 1)) AS i
  FROM f WHERE n > 0
)
SELECT doc_id AS media_id, i AS frame_idx,
       LEAST({frame_bytes}, n - i * {frame_bytes}) AS frame_len
FROM idx WHERE i % {every_n} = 0 ORDER BY media_id, frame_idx
"""


def _decode_bmp_pixels(b: bytes) -> tuple[int, int, bytes]:
    """Full 24-bit BMP pixel decode -> (width, height, row-major BGR
    bytes, top row first). Honors pixel offset, signed height, padding."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(b[10:14], "little")
    width = int.from_bytes(b[18:22], "little", signed=True)
    height_raw = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    if bpp != 24:
        raise ValueError("only 24-bit BMP supported")
    height = abs(height_raw)
    row_used = 3 * width
    row_size = (row_used + 3) & ~3
    file_rows = [b[off + r * row_size : off + r * row_size + row_used] for r in range(height)]
    if height_raw > 0:  # bottom-up storage -> reverse to top-down
        file_rows.reverse()
    return width, height, b"".join(file_rows)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Resize via mapInPandas — pure map: no shuffle, partitioning
    preserved.

    - stub: deterministic stride-downsample of the byte stream to
      exactly min(width*height, n_bytes) bytes.
    - real (``decode_stub=False``): nearest-neighbor resample of the
      DECODED BMP pixel grid, re-encoded as a valid BMP of the target
      dimensions (PIL-free; round-trips through the native codec).
    """
    target = width * height
    out_schema = T.StructType(
        MEDIA_SCHEMA.fields
        + [T.StructField("width", T.IntegerType()), T.StructField("height", T.IntegerType())]
    )

    def _shrink_bytes(raw):
        b = bytes(raw)
        if len(b) <= target:
            return b
        # exactly `target` bytes, sampled at evenly spaced offsets
        # (floor(i * n / target) is strictly increasing when n > target)
        n = len(b)
        return bytes(b[(i * n) // target] for i in range(target))

    def _resize_real(raw):
        w0, h0, px = _decode_bmp_pixels(bytes(raw))
        out = bytearray()
        for y in range(height):
            sy = (y * h0) // height
            row = px[sy * 3 * w0 : (sy + 1) * 3 * w0]
            for x in range(width):
                sx = (x * w0) // width
                out += row[3 * sx : 3 * sx + 3]
        return encode_bmp(width, height, bytes(out))

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(
                _shrink_bytes if decode_stub else _resize_real
            )
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(_resize, out_schema)


# ----------------------------------------------------------------------
# Perceptual image hashing (near-dup detection over decoded pixels)

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("h_lo", T.LongType()),  # blocks 0-31
        T.StructField("h_hi", T.LongType()),  # blocks 32-63
    ]
)


def _ahash_from_pixels(w: int, h: int, px: bytes) -> tuple[int, int]:
    """The aHash kernel shared by whole-image and per-video-frame
    hashing: 8x8 block sums over the 3-channel pixel bytes, bit j set
    iff block j's sum clears the cross-multiplied global mean, packed
    via ``pack_bits64``. Raises for dimensions not divisible by 8."""
    if w % 8 or h % 8:
        raise ValueError(f"aHash needs dimensions divisible by 8, got {w}x{h}")
    bw, bh = w // 8, h // 8
    g = (
        np.frombuffer(px, dtype=np.uint8)
        .astype(np.int64)
        .reshape(h, w, 3)
        .sum(axis=2)
    )
    blocks = g.reshape(8, bh, 8, bw).sum(axis=(1, 3)).flatten()
    tot = int(blocks.sum())
    return pack_bits64(blocks * (8 * 8) >= tot)


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over REAL decoded BMP pixels:
    8x8 grid of pixel-block sums, bit j set iff block j's average
    channel value >= the image average (compared cross-multiplied in
    integers, so the threshold is exact on every engine). The 64 bits
    are packed as two 32-bit halves in BIGINTs — no signed-overflow
    edge at bit 63, and XOR/bit_count stay native in Spark AND the
    DuckDB replay.

    One Arrow-batched map, no shuffle; numpy does the block pooling.
    Requires dimensions divisible by 8 (raise, don't mis-pool — a real
    deployment resizes first; ``resize_media`` provides exactly that).
    """

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            los, his = [], []
            for raw in pdf["payload"]:
                lo, hi = _ahash_from_pixels(*_decode_bmp_pixels(bytes(raw)))
                los.append(lo)
                his.append(hi)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "h_lo": los,
                    "h_hi": his,
                }
            )

    return media.mapInPandas(_hash, AHASH_SCHEMA)


class FamilySizeError(ValueError):
    """Raised by the media pair-list operators (:func:`ahash_near_dup_pairs`,
    :func:`audio_near_dup_pairs`, :func:`video_near_dup_pairs`) when an
    exact-signature family exceeds ``max_family_size``: the PAIR LIST
    output would be quadratic in that family's size no matter how the
    engine computes it, which is an unbounded-output footgun on
    family-heavy corpora (measured on the sf1 scaling fixture: 35M pair
    rows / 130 s, all output). The linear-output reports over the same
    corpora are the matching ``*_near_dup_families`` forms."""


# One-slot registry of the most recent guarded pair op's persisted hash
# frame: each guarded call evicts the previous call's cache before
# persisting its own, so a session that runs the pair ops repeatedly
# (the bench runs three of them, 3x each, per round) holds at most ONE
# small hash frame in executor storage instead of leaking one per call.
_GUARD_CACHE: list[DataFrame] = []
_GUARD_LOCK = _threading.Lock()


def release_guard_cache() -> None:
    """Unpersist the media ops' cached hash frame (if any)."""
    with _GUARD_LOCK:
        while _GUARD_CACHE:
            _GUARD_CACHE.pop().unpersist(blocking=False)


def _cache_one(df: DataFrame) -> DataFrame:
    """Persist ``df`` in the one-slot media hash cache, evicting the
    previous occupant — repeated media-op calls hold at most one small
    cached frame instead of leaking one per call."""
    with _GUARD_LOCK:
        while _GUARD_CACHE:
            _GUARD_CACHE.pop().unpersist(blocking=False)
        df = df.persist()
        _GUARD_CACHE.append(df)
    return df


def _guard_and_persist(
    hashed: DataFrame,
    family_cols: list[str],
    what: str,
    alt: str,
    max_family_size: int,
) -> DataFrame:
    """Shared output-size guardrail for the media pair-list operators.

    Persists the (tiny: tens of bytes per item) hash frame — so the
    guard group-by AND both sides of the downstream pair join read one
    decode pass — then finds the largest exact-signature family with one
    cheap group-by and raises :class:`FamilySizeError` above
    ``max_family_size``, steering to the linear-output family form
    named by ``alt``. The pair contract itself is quadratic in family
    size (a family of s identical items emits s*(s-1)/2 rows from that
    family alone); no engine strategy changes that, so the only sound
    move at scale is to refuse and point at the linear report."""
    hashed = _cache_one(hashed)
    biggest = (
        hashed.groupBy(*family_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    ) or 0
    if biggest > max_family_size:
        release_guard_cache()
        raise FamilySizeError(
            f"largest exact-signature {what} family has {biggest} members "
            f"(> max_family_size={max_family_size}); the pair list would "
            f"be quadratic in family size. Use {alt} "
            f"(linear output: one row per family pair), or pass "
            f"max_family_size=None to accept the output volume."
        )
    return hashed


def ahash_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, max_family_size: int | None = 256
) -> DataFrame:
    """Image near-dup pairs (ma, mb, hamming) within Hamming distance
    <= max_hamming of their perceptual hashes, found by banding the 64
    bits into 4 x 16-bit chunks — the shared pigeonhole scaffold
    (``dedup.banded_hamming_pairs``), which raises for max_hamming >=
    n_bands rather than silently losing recall: the corpus x corpus
    comparison becomes an equi-join on (band, key), and only
    band-collision candidates pay the bit_count verification.

    Output-size guardrail: a corpus with an identical-image family of
    size s emits s*(s-1)/2 pair rows FROM THAT FAMILY ALONE — the pair
    contract itself is quadratic, not the engine. So before banding,
    one cheap group-by over the (persisted, 24-bytes-per-image) hash
    frame finds the largest exact-signature family and raises
    :class:`FamilySizeError` above ``max_family_size``, steering to
    the linear-output :func:`ahash_near_dup_families` form. Pass
    ``max_family_size=None`` to explicitly accept quadratic output.
    Persisting the hash frame also means the decode pass runs ONCE —
    the banding self-join previously decoded the corpus twice."""
    ah = image_ahash(media)
    chunks = hash64_band_chunks()
    if max_family_size is not None:
        ah = _guard_and_persist(
            ah, ["h_lo", "h_hi"], "image", "ahash_near_dup_families",
            max_family_size,
        )
    return banded_hamming_pairs(
        ah,
        "media_id",
        ["h_lo", "h_hi"],
        chunks,
        n_bands=4,
        max_hamming=max_hamming,
        out_a="ma",
        out_b="mb",
    )


def ahash_near_dup_families(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Family-collapsed image near-dup report — the mega-family-safe
    form of :func:`ahash_near_dup_pairs`. A corpus with unbounded
    identical-image families makes the PAIR LIST itself quadratic
    (measured on the synthetic sf1 scaling fixture: 35M pair rows,
    because the pixel formula is periodic in media_id), so no pair
    emitter can be sub-quadratic there. This operator collapses
    exact-signature families FIRST (one hash group-by — linear), then
    bands only the DISTINCT signatures: compute and output are both
    linear in the corpus, bounded by the number of distinct perceptual
    hashes. Output: one row per near-dup FAMILY pair
    (ra, rb, hamming, size_a, size_b, cross_pairs) with ra/rb the min
    member ids; ``ahash_near_dup_pairs`` is exactly the expansion
    [within-family all-pairs at hamming 0] + [size_a x size_b member
    pairs per family pair] — asserted by pytest."""
    return _hash64_families(image_ahash(media), max_hamming)


def _hash64_families(ah: DataFrame, max_hamming: int) -> DataFrame:
    """Shared family-collapse kernel over a 64-bit (h_lo, h_hi) hash
    frame: collapse exact signatures to (rep, size) families with one
    group-by, band only the DISTINCT signatures, attach family sizes.
    Used by the image aHash and audio contour family forms — both
    fingerprints pack the same two-32-bit-halves layout."""
    fams = ah.groupBy("h_lo", "h_hi").agg(
        F.min("media_id").alias("rep_id"),
        F.count(F.lit(1)).alias("family_size"),
    )
    pairs = banded_hamming_pairs(
        fams.select("rep_id", "h_lo", "h_hi"),
        "rep_id",
        ["h_lo", "h_hi"],
        hash64_band_chunks(),
        n_bands=4,
        max_hamming=max_hamming,
        out_a="ra",
        out_b="rb",
    )
    sa = fams.select(F.col("rep_id").alias("ra"), F.col("family_size").alias("size_a"))
    sb = fams.select(F.col("rep_id").alias("rb"), F.col("family_size").alias("size_b"))
    return (
        pairs.join(sa, "ra")
        .join(sb, "rb")
        .select(
            "ra",
            "rb",
            "hamming",
            "size_a",
            "size_b",
            (F.col("size_a") * F.col("size_b")).cast("long").alias("cross_pairs"),
        )
        .orderBy("ra", "rb")
    )


def _ahash_sig_ctes(width: int, height: int, source: str) -> str:
    """Shared DuckDB CTE chain documents -> per-media aHash signature
    (lo, hi): replay the synthetic pixel formula, block-average pool,
    threshold against the image mean, pack 64 bits as two 32-bit
    halves — used by both the pair and the family oracles."""
    return f"""px AS MATERIALIZED (
  SELECT d.doc_id AS m, t.p,
         ((d.doc_id * 31 + 3 * t.p) % 256)
         + ((d.doc_id * 31 + 3 * t.p + 1) % 256)
         + ((d.doc_id * 31 + 3 * t.p + 2) % 256) AS g3
  FROM {source} d, unnest(generate_series(0, {width * height - 1})) AS t(p)
),
blocks AS (
  SELECT m,
         ((p // {width}) // {height // 8}) * 8
         + ((p % {width}) // {width // 8}) AS j,
         SUM(g3) AS bsum
  FROM px GROUP BY m,
         ((p // {width}) // {height // 8}) * 8
         + ((p % {width}) // {width // 8})
),
tot AS (SELECT m, SUM(bsum) AS tsum FROM blocks GROUP BY m),
bits AS (
  SELECT b.m, b.j, CASE WHEN b.bsum * 64 >= t.tsum THEN 1 ELSE 0 END AS bit
  FROM blocks b JOIN tot t ON b.m = t.m
),
sig AS MATERIALIZED (
  SELECT m,
    CAST(SUM(CASE WHEN j < 32 AND bit = 1
             THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT)
      AS lo,
    CAST(SUM(CASE WHEN j >= 32 AND bit = 1
             THEN (CAST(1 AS BIGINT) << CAST(j - 32 AS INT)) ELSE 0 END) AS BIGINT)
      AS hi
  FROM bits GROUP BY m
)"""


def ahash_near_dup_sql(
    max_hamming: int = 3,
    width: int = 16,
    height: int = 16,
    source: str = "documents",
) -> str:
    """DuckDB twin for the synthetic-BMP corpus: the pixel formula
    (channel byte i of media m = (m*31+i) % 256) replays the decoded
    image arithmetically, then the identical block-average hash and a
    brute-force pair join — exact vs the banded engine output because
    4x16 banding finds every pair at Hamming <= 3. Geometry follows
    the parameters like the video twin; raises where the engine kernel
    would (divisibility by 8) instead of silently mis-pooling."""
    if width % 8 or height % 8:
        raise ValueError(
            f"aHash oracle needs dimensions divisible by 8, got {width}x{height}"
        )
    return f"""
WITH {_ahash_sig_ctes(width, height, source)}
SELECT a.m AS ma, b.m AS mb,
       bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS hamming
FROM sig a JOIN sig b ON a.m < b.m
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= {max_hamming}
ORDER BY ma, mb
"""


def ahash_families_sql(
    max_hamming: int = 3,
    width: int = 16,
    height: int = 16,
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`ahash_near_dup_families`: collapse exact
    signatures to (rep, size) families, brute-force the DISTINCT
    signatures (exact vs the banded engine, as for the pair twin)."""
    if width % 8 or height % 8:
        raise ValueError(
            f"aHash oracle needs dimensions divisible by 8, got {width}x{height}"
        )
    return f"""
WITH {_ahash_sig_ctes(width, height, source)},
fam AS (
  SELECT lo, hi, MIN(m) AS rep_id, COUNT(*) AS family_size
  FROM sig GROUP BY lo, hi
)
SELECT a.rep_id AS ra, b.rep_id AS rb,
       bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS hamming,
       a.family_size AS size_a, b.family_size AS size_b,
       CAST(a.family_size * b.family_size AS BIGINT) AS cross_pairs
FROM fam a JOIN fam b ON a.rep_id < b.rep_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= {max_hamming}
ORDER BY ra, rb
"""


def media_feature_stats(media: DataFrame) -> DataFrame:
    """Per-modality aggregate over extracted features — the typical
    downstream of decode: filter/stat before training-set selection."""
    feats = extract_features(media)
    return (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("content_md5").alias("n_distinct_contents"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("modality")
    )


#: DuckDB oracle for the stub pipeline over documents_as_media: byte
#: length == strlen for ASCII-safe text is NOT guaranteed, so use
#: octet_length on the encoded blob.
MEDIA_STATS_SQL = """
SELECT 'image' AS modality,
       COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT md5(text)) AS n_distinct_contents,
       CAST(SUM(octet_length(encode(text)) // 256) AS BIGINT) AS total_frames
FROM documents
ORDER BY modality
"""


# ----------------------------------------------------------------------
# Native audio codec: RIFF/WAVE PCM16 mono (the soundfile/ffmpeg slot).
# Same design as the BMP/PPM tier: a genuinely parsed container format,
# synthetic payloads whose samples are a pure function of (media_id, i)
# so decoded statistics replay arithmetically in the DuckDB oracle.
def encode_wav(sample_rate: int, samples) -> bytes:
    """Minimal standards-conforming RIFF/WAVE writer: PCM (format 1),
    mono, 16-bit little-endian."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _decode_wav_samples(payload: bytes):
    """Real RIFF/WAVE PCM16-mono parse -> (sample_rate, int64 ndarray
    of samples). Tolerant chunk walk (unknown chunks skipped, odd sizes
    padded per spec); raises ValueError on non-RIFF payloads,
    compressed/stereo/non-16-bit streams, or a missing data chunk — the
    dispatch point where soundfile/ffmpeg would plug in for other
    codecs."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"only PCM16 mono supported: fmt={audio_format} ch={channels} bits={bits}"
        )
    x = np.frombuffer(data[: len(data) & ~1], dtype="<i2").astype(np.int64)
    return sample_rate, x


def decode_audio(payload: bytes) -> tuple[int, int, float, int]:
    """Real RIFF/WAVE PCM16-mono decode ->
    (sample_rate, n_samples, mean_abs_sample, n_zero_cross)."""
    sample_rate, x = _decode_wav_samples(bytes(payload))
    if len(x) == 0:
        return sample_rate, 0, 0.0, 0
    mean_abs = float(np.abs(x).sum()) / len(x)
    n_zero_cross = int(np.count_nonzero(x[:-1] * x[1:] < 0))
    return sample_rate, int(len(x)), mean_abs, n_zero_cross


def synthetic_wav_media(
    docs: DataFrame, n_samples: int = 256, sample_rate: int = 8000
) -> DataFrame:
    """Real WAV payload per document: sample i of media m is
    ``((m * 31 + i) % 4096) - 2048`` — a pure integer function of the
    id, so decoded statistics replay arithmetically in the oracle while
    the payload is a genuine, header-complete RIFF/WAVE file."""
    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": "audio",
                    "mime": "audio/wav",
                    "payload": [
                        encode_wav(sample_rate, ((int(m) * 31 + i) % 4096) - 2048)
                        for m in ids
                    ],
                }
            )

    return _spread_ids(docs).mapInPandas(_make, MEDIA_SCHEMA)


# ----------------------------------------------------------------------
# Video frame-fingerprint near-dup (the shot-hash slot)

def encode_video(frames: list) -> bytes:
    """Minimal video container: b'SVID' + u32 frame count + per frame
    (u32 size + payload). Stands in for MP4/MKV the way the BMP/WAV
    writers stand in for JPEG/FLAC — a genuinely parsed length-prefixed
    format, not a fake."""
    out = [b"SVID", len(frames).to_bytes(4, "little")]
    for fr in frames:
        b = bytes(fr)
        out.append(len(b).to_bytes(4, "little"))
        out.append(b)
    return b"".join(out)


def decode_video(payload: bytes) -> list:
    """Parse the SVID container -> list of frame payloads. Raises
    ValueError on a bad magic, a truncated frame, or trailing bytes."""
    b = bytes(payload)
    if b[:4] != b"SVID":
        raise ValueError("not an SVID payload")
    if len(b) < 8:
        raise ValueError("truncated SVID header")
    n = int.from_bytes(b[4:8], "little")
    pos, frames = 8, []
    for _ in range(n):
        if pos + 4 > len(b):
            raise ValueError("truncated SVID frame header")
        size = int.from_bytes(b[pos : pos + 4], "little")
        pos += 4
        if pos + size > len(b):
            raise ValueError("truncated SVID frame payload")
        frames.append(b[pos : pos + size])
        pos += size
    if pos != len(b):
        raise ValueError(f"trailing bytes after {n} SVID frames")
    return frames


def synthetic_video_media(
    docs: DataFrame, n_frames: int = 6, width: int = 16, height: int = 16
) -> DataFrame:
    """Video corpus with PLANTED near-duplicates: each frame is a real
    BMP whose pixel byte i is the quadratic ``(a + b*i + c*i*i) % 256``
    with (a, b, c) = the low three bytes of ``hash60(seed || ':' ||
    frame_idx)`` — one md5 per frame (cheap), frames independent
    across media (a 2^24 coefficient space, so accidental frame
    collisions are birthday-rare), and everything SQL-replayable.

    Every 9th media (m % 9 == 0) is a RE-EDIT of its predecessor:
    frames 1..n-1 reuse media m-1's seeds, frame 0 is its own (a
    replaced title card) — the shared-frame signature a shot-level
    video dedup exists to catch."""
    n_px = 3 * width * height
    idx = np.arange(n_px, dtype=np.int64)
    idx2 = idx * idx

    def _frame(seed_src: int, f: int) -> bytes:
        h = _h60(f"{seed_src}:{f}")
        a, b, c = h & 255, (h >> 8) & 255, (h >> 16) & 255
        px = ((a + b * idx + c * idx2) % 256).astype(np.uint8).tobytes()
        return encode_bmp(width, height, px)

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for m in ids:
                m = int(m)
                frames = [
                    _frame(
                        m - 1 if (m % 9 == 0 and f > 0) else m,
                        f,
                    )
                    for f in range(n_frames)
                ]
                payloads.append(encode_video(frames))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": "video",
                    "mime": "video/x-svid",
                    "payload": payloads,
                }
            )

    return _spread_ids(docs, heavy=True).mapInPandas(_make, MEDIA_SCHEMA)


FRAME_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("h_lo", T.LongType()),
        T.StructField("h_hi", T.LongType()),
    ]
)


def video_frame_ahash(media: DataFrame) -> DataFrame:
    """Per-frame perceptual hashes of a video corpus: parse the SVID
    container, decode each BMP frame, aHash it with the shared kernel.
    1->n_frames inside the Arrow batch iterator (like
    ``sample_frames``) — no shuffle, partitioning inherited."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, fidx, los, his = [], [], [], []
            for mid, raw in zip(pdf["media_id"].astype("int64"), pdf["payload"]):
                for f, frame in enumerate(decode_video(bytes(raw))):
                    lo, hi = _ahash_from_pixels(*_decode_bmp_pixels(frame))
                    mids.append(int(mid))
                    fidx.append(f)
                    los.append(lo)
                    his.append(hi)
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": fidx, "h_lo": los, "h_hi": his}
            )

    return media.mapInPandas(_hash, FRAME_AHASH_SCHEMA)


def video_near_dup_pairs(
    media: DataFrame, min_shared: int = 3, max_family_size: int | None = 256
) -> DataFrame:
    """Video near-dup pairs (ma, mb, n_shared_frames): two videos pair
    when they share >= min_shared DISTINCT frame fingerprints — the
    shot-level dedup rule (re-edits, re-encodes and trims keep most
    frame hashes identical). Scale shape: per-video distinct hash sets
    explode to (media, fingerprint) rows, and the corpus never
    self-joins outside EXACT fingerprint collisions — an equi-join on
    the 64-bit hash, no banding needed because frame identity (not
    tolerance) is the predicate; per-frame tolerance is already
    handled by the aHash quantization itself.

    Output-size guardrail, same contract as
    :func:`ahash_near_dup_pairs`: s videos sharing one frame
    fingerprint contribute s*(s-1)/2 rows to the fingerprint equi-join
    (and, when the videos are identical, to the OUTPUT), so the hottest
    fingerprint's collision-group size is checked first (one group-by
    over the persisted per-video distinct-fingerprint frame, which the
    self-join then also reads — one decode pass, not two) and
    :class:`FamilySizeError` steers to the linear
    :func:`video_near_dup_families` form. ``max_family_size=None``
    opts into the quadratic join explicitly."""
    sigs = video_frame_ahash(media).select("media_id", "h_lo", "h_hi").distinct()
    if max_family_size is not None:
        sigs = _guard_and_persist(
            sigs, ["h_lo", "h_hi"], "video frame-fingerprint",
            "video_near_dup_families", max_family_size,
        )
    a = sigs.select(
        F.col("media_id").alias("ma"),
        F.col("h_lo").alias("lo"),
        F.col("h_hi").alias("hi"),
    )
    b = sigs.select(
        F.col("media_id").alias("mb"),
        F.col("h_lo").alias("lo"),
        F.col("h_hi").alias("hi"),
    )
    return (
        a.join(b, ["lo", "hi"])
        .filter(F.col("ma") < F.col("mb"))
        .groupBy("ma", "mb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= min_shared)
        .orderBy("ma", "mb")
    )


def _video_sig_ctes(
    n_frames: int, width: int, height: int, source: str
) -> str:
    """Shared DuckDB CTE chain documents -> per-video DISTINCT frame
    fingerprints (m, lo, hi) for the synthetic SVID corpus: replay the
    per-frame quadratic pixel formula from the md5 seed coefficients
    and the shared aHash kernel — used by both the pair and the family
    oracles."""
    if width % 8 or height % 8:
        # mirror the engine kernel's contract: a non-divisible geometry
        # would silently mis-pool blocks here while the kernel raises
        raise ValueError(f"aHash oracle needs dimensions divisible by 8, got {width}x{height}")
    n_px = 3 * width * height
    return f"""fr AS MATERIALIZED (
  SELECT d.doc_id AS m, f.f,
         CAST(CAST(concat('0x', substr(md5(
             CAST(CASE WHEN d.doc_id % 9 = 0 AND f.f > 0
                  THEN d.doc_id - 1 ELSE d.doc_id END AS VARCHAR)
             || ':' || CAST(f.f AS VARCHAR)), 1, 15))
           AS UBIGINT) AS BIGINT) AS h
  FROM {source} d, unnest(generate_series(0, {n_frames - 1})) AS f(f)
),
coef AS (
  SELECT m, f, h & 255 AS a, (h >> 8) & 255 AS b, (h >> 16) & 255 AS c
  FROM fr
),
px AS (
  SELECT m, f, t.p,
         ((a + b * (3 * t.p) + c * (3 * t.p) * (3 * t.p)) % 256)
         + ((a + b * (3 * t.p + 1) + c * (3 * t.p + 1) * (3 * t.p + 1)) % 256)
         + ((a + b * (3 * t.p + 2) + c * (3 * t.p + 2) * (3 * t.p + 2)) % 256)
           AS g3
  FROM coef, unnest(generate_series(0, {n_px // 3 - 1})) AS t(p)
),
blocks AS (
  SELECT m, f,
         ((p // {width}) // {height // 8}) * 8
         + ((p % {width}) // {width // 8}) AS j,
         SUM(g3) AS bsum
  FROM px GROUP BY m, f,
         ((p // {width}) // {height // 8}) * 8
         + ((p % {width}) // {width // 8})
),
tot AS (SELECT m, f, SUM(bsum) AS tsum FROM blocks GROUP BY m, f),
bits AS (
  SELECT b.m, b.f, b.j, CASE WHEN b.bsum * 64 >= t.tsum THEN 1 ELSE 0 END AS bit
  FROM blocks b JOIN tot t ON b.m = t.m AND b.f = t.f
),
persig AS (
  SELECT m, f,
    CAST(SUM(CASE WHEN j < 32 AND bit = 1
             THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT)
      AS lo,
    CAST(SUM(CASE WHEN j >= 32 AND bit = 1
             THEN (CAST(1 AS BIGINT) << CAST(j - 32 AS INT)) ELSE 0 END) AS BIGINT)
      AS hi
  FROM bits GROUP BY m, f
),
sigs AS MATERIALIZED (SELECT DISTINCT m, lo, hi FROM persig)"""


def video_near_dup_sql(
    min_shared: int = 3,
    n_frames: int = 6,
    width: int = 16,
    height: int = 16,
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`video_near_dup_pairs`: the shared
    frame-fingerprint replay (:func:`_video_sig_ctes`), then the
    distinct-fingerprint intersection count."""
    return f"""
WITH {_video_sig_ctes(n_frames, width, height, source)}
SELECT a.m AS ma, b.m AS mb, CAST(COUNT(*) AS BIGINT) AS n_shared_frames
FROM sigs a JOIN sigs b ON a.lo = b.lo AND a.hi = b.hi AND a.m < b.m
GROUP BY a.m, b.m
HAVING COUNT(*) >= {min_shared}
ORDER BY ma, mb
"""


def video_near_dup_families(media: DataFrame, min_shared: int = 3) -> DataFrame:
    """Family-collapsed video near-dup report — the mega-family-safe
    form of :func:`video_near_dup_pairs`. Videos whose DISTINCT frame
    fingerprint SETS are identical form one family (re-uploads and
    exact re-encodes of the same clip); the family key is the md5 of
    the lexicographically sorted "lo:hi" fingerprint strings, computed
    with one per-video collect_list — linear. Only family
    REPRESENTATIVES (min media_id) then enter the shared-frame
    equi-join, so a corpus of s identical videos contributes ONE
    representative instead of an s x s join block. Output one row per
    near-dup FAMILY pair
    (ra, rb, n_shared_frames, size_a, size_b, cross_pairs);
    ``video_near_dup_pairs`` is the expansion [within-family all-pairs
    sharing every frame] + [size_a x size_b member pairs per family
    pair] — asserted by pytest."""
    sigs = _cache_one(
        video_frame_ahash(media).select("media_id", "h_lo", "h_hi").distinct()
    )
    skey = sigs.groupBy("media_id").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(F.concat_ws(":", F.col("h_lo"), F.col("h_hi")))
                ),
            )
        ).alias("skey")
    )
    fams = skey.groupBy("skey").agg(
        F.min("media_id").alias("rep_id"),
        F.count(F.lit(1)).alias("family_size"),
    )
    reps = sigs.join(
        fams.select(F.col("rep_id").alias("media_id"), "family_size"), "media_id"
    )
    a = reps.select(
        F.col("media_id").alias("ra"),
        F.col("family_size").alias("size_a"),
        F.col("h_lo").alias("lo"),
        F.col("h_hi").alias("hi"),
    )
    b = reps.select(
        F.col("media_id").alias("rb"),
        F.col("family_size").alias("size_b"),
        F.col("h_lo").alias("lo"),
        F.col("h_hi").alias("hi"),
    )
    return (
        a.join(b, ["lo", "hi"])
        .filter(F.col("ra") < F.col("rb"))
        .groupBy("ra", "rb", "size_a", "size_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= min_shared)
        .select(
            "ra",
            "rb",
            "n_shared_frames",
            "size_a",
            "size_b",
            (F.col("size_a") * F.col("size_b")).cast("long").alias("cross_pairs"),
        )
        .orderBy("ra", "rb")
    )


def video_families_sql(
    min_shared: int = 3,
    n_frames: int = 6,
    width: int = 16,
    height: int = 16,
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`video_near_dup_families`: shared
    fingerprint replay, md5-of-sorted-fingerprint-strings family key
    (string_agg ORDER BY the same "lo:hi" string Spark's sort_array
    sorts — lexicographic on both engines), representative-only
    intersection counts."""
    return f"""
WITH {_video_sig_ctes(n_frames, width, height, source)},
vset AS (
  SELECT m, md5(string_agg(lo || ':' || hi, ',' ORDER BY lo || ':' || hi)) AS skey
  FROM sigs GROUP BY m
),
fam AS (
  SELECT skey, MIN(m) AS rep_id, COUNT(*) AS family_size
  FROM vset GROUP BY skey
),
reps AS (
  SELECT s.m, f.family_size, s.lo, s.hi
  FROM sigs s JOIN fam f ON s.m = f.rep_id
)
SELECT a.m AS ra, b.m AS rb, CAST(COUNT(*) AS BIGINT) AS n_shared_frames,
       a.family_size AS size_a, b.family_size AS size_b,
       CAST(a.family_size * b.family_size AS BIGINT) AS cross_pairs
FROM reps a JOIN reps b ON a.lo = b.lo AND a.hi = b.hi AND a.m < b.m
GROUP BY a.m, b.m, a.family_size, b.family_size
HAVING COUNT(*) >= {min_shared}
ORDER BY ra, rb
"""


# ----------------------------------------------------------------------
# Audio fingerprint near-dup (the Chromaprint slot)

def synthetic_wav_media_noisy(
    docs: DataFrame, n_samples: int = 256, sample_rate: int = 8000
) -> DataFrame:
    """WAV corpus with PLANTED near-duplicates for the fingerprint
    query: sample i of media m is md5-derived pseudo-noise — the FIVE
    12-bit fields of the 60-bit ``hash60(base || ':' || i//5)``
    (sample i slices bits ``12*(i%5)``), shifted to [-2048, 2047],
    with base = m. md5 is the generation bottleneck, so slicing five
    samples per hash is a 5x cut in calls with identical
    replayability, and md5 noise makes unrelated fingerprints truly
    independent (unlike the ramp corpus of ``synthetic_wav_media``,
    whose 1-parameter phase family makes half the corpus
    near-collide).

    Every 7th media (m % 7 == 0) is a PLANTED near-dup: it reuses its
    predecessor's waveform (base = m - 1) with sample 0 nudged +999
    (capped) and sample 4 nudged -999 (floored) — an almost-identical
    re-encode. The nudges sit on EVEN slots of two different windows
    so they do NOT cancel in the alternating-sum fingerprint (a
    symmetric nudge like +d on samples 0-3 lies exactly in the
    feature's kernel and degenerates every planted pair to Hamming 0);
    measured at sf0.01 the planted pairs span Hamming 0-2, so the
    banding recall path — not just the exact-signature join — is
    genuinely exercised while the pair set stays exactly the planted
    ones."""
    blk_of = np.arange(n_samples, dtype=np.int64) // 5
    shift_of = 12 * (np.arange(n_samples, dtype=np.int64) % 5)

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for m in ids:
                m = int(m)
                base = m - 1 if m % 7 == 0 else m
                hs = np.array(
                    [_h60(f"{base}:{blk}") for blk in range((n_samples + 4) // 5)],
                    dtype=np.int64,
                )
                s = ((hs[blk_of] >> shift_of) & 0xFFF) - 2048
                if m % 7 == 0:
                    s[0] = min(int(s[0]) + 999, 2047)
                    if n_samples > 4:
                        s[4] = max(int(s[4]) - 999, -2048)
                payloads.append(encode_wav(sample_rate, s))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": "audio",
                    "mime": "audio/wav",
                    "payload": payloads,
                }
            )

    return _spread_ids(docs).mapInPandas(_make, MEDIA_SCHEMA)


def audio_contour_hash(media: DataFrame) -> DataFrame:
    """64-bit audio fingerprint over REAL decoded PCM16 samples: the
    clip splits into 64 equal windows and bit j is the sign of the
    window's alternating sample sum (s0 - s1 + s2 - s3 ...) — a local
    high-frequency-phase feature, integer-exact on every engine (no
    float energy to drift). Same packing as the image aHash: two 32-bit
    halves in BIGINTs. One Arrow-batched map, no shuffle. Requires
    n_samples divisible by 64 (raise, don't mis-window)."""
    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            los, his = [], []
            for raw in pdf["payload"]:
                _, x = _decode_wav_samples(bytes(raw))
                if len(x) == 0 or len(x) % 64:
                    raise ValueError(
                        f"contour hash needs n_samples divisible by 64, got {len(x)}"
                    )
                w = len(x) // 64
                signs = np.where(np.arange(w) % 2 == 0, 1, -1)
                alt = (x.reshape(64, w) * signs).sum(axis=1)
                lo, hi = pack_bits64(alt >= 0)
                los.append(lo)
                his.append(hi)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "h_lo": los,
                    "h_hi": his,
                }
            )

    return media.mapInPandas(_hash, AHASH_SCHEMA)


def audio_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, max_family_size: int | None = 256
) -> DataFrame:
    """Audio near-dup pairs (ma, mb, hamming) over the contour
    fingerprint via the shared pigeonhole scaffold
    (``dedup.banded_hamming_pairs``, 4 x 16-bit bands — exact at
    Hamming <= 3, raises beyond).

    Same output-size guardrail as :func:`ahash_near_dup_pairs`: a
    corpus of s identical tracks emits s*(s-1)/2 pair rows from that
    family alone, so the largest exact-fingerprint family is checked
    first (one group-by over the persisted 24-byte-per-track hash
    frame) and :class:`FamilySizeError` steers to the linear
    :func:`audio_near_dup_families` form. ``max_family_size=None``
    opts into quadratic output explicitly."""
    ah = audio_contour_hash(media)
    chunks = hash64_band_chunks()
    if max_family_size is not None:
        ah = _guard_and_persist(
            ah, ["h_lo", "h_hi"], "audio", "audio_near_dup_families",
            max_family_size,
        )
    return banded_hamming_pairs(
        ah,
        "media_id",
        ["h_lo", "h_hi"],
        chunks,
        n_bands=4,
        max_hamming=max_hamming,
        out_a="ma",
        out_b="mb",
    )


def _audio_sig_ctes(n_samples: int, source: str) -> str:
    """Shared DuckDB CTE chain documents -> per-media contour
    fingerprint (lo, hi) for the NOISY synthetic WAV corpus: replay
    the md5-derived samples (planted-dup base + asymmetric nudge
    included) and the alternating-sum fingerprint — used by both the
    pair and the family oracles. md5 runs at the BLOCK grain — one
    digest per (doc, i//5), mirroring the generator's
    five-samples-per-hash slicing — not once per sample."""
    if n_samples % 64:
        # mirror audio_contour_hash's contract
        raise ValueError(f"contour oracle needs n_samples divisible by 64, got {n_samples}")
    w = n_samples // 64
    n_blocks = (n_samples + 4) // 5
    return f"""blocks AS MATERIALIZED (
  SELECT d.doc_id AS m, b.blk,
         CAST(CAST(concat('0x', substr(md5(
             CAST(CASE WHEN d.doc_id % 7 = 0 THEN d.doc_id - 1
                  ELSE d.doc_id END AS VARCHAR)
             || ':' || CAST(b.blk AS VARCHAR)), 1, 15))
           AS UBIGINT) AS BIGINT) AS h
  FROM {source} d, unnest(generate_series(0, {n_blocks - 1})) AS b(blk)
),
s AS (
  SELECT m, i,
         CASE WHEN m % 7 = 0 AND i = 0 THEN LEAST(v + 999, 2047)
              WHEN m % 7 = 0 AND i = 4 THEN GREATEST(v - 999, -2048)
              ELSE v END AS v
  FROM (
    SELECT m, blk * 5 + t.slot AS i,
           ((h >> CAST(12 * t.slot AS INT)) & 4095) - 2048 AS v
    FROM blocks, unnest(generate_series(0, 4)) AS t(slot)
    WHERE blk * 5 + t.slot < {n_samples}
  )
),
alt AS (
  SELECT m, i // {w} AS j,
         SUM(CASE WHEN (i % {w}) % 2 = 0 THEN v ELSE -v END) AS a
  FROM s GROUP BY m, i // {w}
),
sig AS MATERIALIZED (
  SELECT m,
    CAST(SUM(CASE WHEN j < 32 AND a >= 0
             THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT)
      AS lo,
    CAST(SUM(CASE WHEN j >= 32 AND a >= 0
             THEN (CAST(1 AS BIGINT) << CAST(j - 32 AS INT)) ELSE 0 END) AS BIGINT)
      AS hi
  FROM alt GROUP BY m
)"""


def audio_near_dup_sql(
    max_hamming: int = 3, n_samples: int = 256, source: str = "documents"
) -> str:
    """DuckDB twin of :func:`audio_near_dup_pairs` over the noisy
    synthetic WAV corpus: the shared sample+fingerprint replay
    (:func:`_audio_sig_ctes`), then a brute-force pair join (exact vs
    the banded engine at Hamming <= 3)."""
    return f"""
WITH {_audio_sig_ctes(n_samples, source)}
SELECT a.m AS ma, b.m AS mb,
       bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS hamming
FROM sig a JOIN sig b ON a.m < b.m
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= {max_hamming}
ORDER BY ma, mb
"""


def audio_near_dup_families(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Family-collapsed audio near-dup report — the mega-family-safe
    form of :func:`audio_near_dup_pairs`, exactly as
    :func:`ahash_near_dup_families` is for images: collapse
    exact-fingerprint families first (one group-by — linear), band only
    the DISTINCT contour fingerprints, attach family sizes. Output one
    row per near-dup FAMILY pair
    (ra, rb, hamming, size_a, size_b, cross_pairs)."""
    return _hash64_families(audio_contour_hash(media), max_hamming)


def audio_families_sql(
    max_hamming: int = 3, n_samples: int = 256, source: str = "documents"
) -> str:
    """DuckDB twin of :func:`audio_near_dup_families`: shared
    fingerprint replay, collapse exact fingerprints to (rep, size)
    families, brute-force the DISTINCT fingerprints."""
    return f"""
WITH {_audio_sig_ctes(n_samples, source)},
fam AS (
  SELECT lo, hi, MIN(m) AS rep_id, COUNT(*) AS family_size
  FROM sig GROUP BY lo, hi
)
SELECT a.rep_id AS ra, b.rep_id AS rb,
       bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS hamming,
       a.family_size AS size_a, b.family_size AS size_b,
       CAST(a.family_size * b.family_size AS BIGINT) AS cross_pairs
FROM fam a JOIN fam b ON a.rep_id < b.rep_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= {max_hamming}
ORDER BY ra, rb
"""


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_abs_sample", T.DoubleType()),
        T.StructField("n_zero_cross", T.LongType()),
    ]
)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """Real-decode face of the audio pipeline: parse each RIFF payload
    with :func:`decode_audio` and emit per-item sample statistics
    (energy proxy + zero-crossing count — the first two features every
    audio-quality filter computes)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_audio(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "sample_rate": [r[0] for r in rows],
                    "n_samples": [r[1] for r in rows],
                    "mean_abs_sample": [r[2] for r in rows],
                    "n_zero_cross": [r[3] for r in rows],
                }
            )

    return media.mapInPandas(_decode, AUDIO_STATS_SCHEMA)


def audio_stats_sql(n_samples: int = 256, sample_rate: int = 8000) -> str:
    """Arithmetic replay of decode_audio_stats over the synthetic WAV
    corpus: integer sample reconstruction, exact integer sums, one IEEE
    division. Zero crossings recompute sample i-1 directly instead of a
    window lag (i >= 1 guard)."""
    return f"""
WITH s AS (
  SELECT d.doc_id, t.i,
         ((d.doc_id * 31 + t.i) % 4096) - 2048 AS v
  FROM documents d, unnest(generate_series(0, {n_samples - 1})) AS t(i)
)
SELECT doc_id AS media_id,
       CAST({sample_rate} AS INT) AS sample_rate,
       CAST({n_samples} AS BIGINT) AS n_samples,
       SUM(ABS(v)) / {n_samples}.0 AS mean_abs_sample,
       CAST(SUM(CASE WHEN i > 0
                      AND (((doc_id * 31 + i - 1) % 4096) - 2048) * v < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
FROM s GROUP BY doc_id ORDER BY media_id
"""
