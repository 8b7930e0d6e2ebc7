"""Multimodal (image/audio/video) column operators.

Design for a 100 TB training-data pipeline: media travels as opaque
``binary`` columns with typed metadata alongside (modality, mime,
width/height/duration, ...). Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the heavy
per-item Python (PIL/ffmpeg/torchvision in a real deployment) amortizes
JVM<->Python transfer across whole record batches and parallelizes per
partition.

The media libraries are NOT in this container, so the actual pixel/sample
decoding is stubbed: ``decode_stub=True`` (default) computes
deterministic features from the raw bytes (length, simple byte stats, a
content hash) with the identical batch shapes, schemas, and partitioning
the real kernels would use; passing ``decode_stub=False`` raises
NotImplementedError at the point where a real decoder would plug in.
The byte-level features are real and SQL-expressible, which is what lets
the plumbing be oracle-checked end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Stub features are pure byte-level functions (deterministic, engine-
    independent): size, md5, mean byte value, and a fake "frame count"
    (bytes // 256, standing in for video frame sampling).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not present in this "
            "container; plug the decoder into _featurize_batch"
        )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mean_byte": payloads.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ).astype("float64"),
                    "n_frames": payloads.map(lambda b: len(b) // 256).astype("int64"),
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


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Resize stub: deterministic stride-downsample of the byte stream
    to exactly min(width*height, n_bytes) bytes, with width/height
    carried as typed metadata — the real kernel (PIL thumbnail /
    torchvision resize) plugs into the same mapInPandas slot with the
    same schema. Pure map: no shuffle, partitioning preserved."""
    if not decode_stub:
        raise NotImplementedError(
            "real image resizing requires PIL, not present in this container"
        )
    target = width * height
    out_schema = T.StructType(
        MEDIA_SCHEMA.fields
        + [T.StructField("width", T.IntegerType()), T.StructField("height", T.IntegerType())]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(raw):
                b = bytes(raw)
                if len(b) <= target:
                    return b
                # exactly `target` bytes, sampled at evenly spaced
                # offsets (floor(i * n / target) is strictly increasing
                # when n > target)
                n = len(b)
                return bytes(b[(i * n) // target] for i in range(target))

            out = pdf.copy()
            out["payload"] = out["payload"].map(shrink)
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(_resize, out_schema)


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
