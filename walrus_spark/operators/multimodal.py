"""Multimodal (opaque-binary) columns: schema, partition-shaped plumbing,
and Arrow-batched feature extraction via mapInPandas.

The engine's multimodal contract: media travel as ``BINARY`` columns
with typed metadata alongside (the same way the reference carries opaque
``Vec<u8>`` payloads, src/wal/block.rs:7-10). Decode/resize/frame-sample
run as Arrow-batched pandas functions over mapInPandas — the codec
libraries aren't available in this environment, so the actual pixel
decode is stubbed (``decode_image`` raises NotImplementedError; the
deterministic byte-level features below are real), but the Spark-side
plumbing — output schema, batch iteration, partition parallelism — is
the production shape and is oracle-verified byte-for-byte via sha256.

Binary payloads stay out of shuffles: features are extracted in the scan
stage and only the (narrow) feature columns flow downstream — the same
"project early" rule SURVEY.md §7 flags for 100 TB value columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from walrus_spark.catalog import load_table
from walrus_spark.queries.registry import register

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),  # image / audio / video
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha", StringType()),
        StructField("head_byte", IntegerType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Pixel decode — requires an image codec not present in this
    container. The Spark plumbing around it (media_features) is real."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; "
        "plug Pillow/ffmpeg here in production"
    )


def as_media(docs: DataFrame) -> DataFrame:
    """Model documents as a media table: payload BINARY + metadata."""
    return docs.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched per-payload feature extraction (mapInPandas).

    Features are deterministic byte-level stats (size, sha256, first
    byte) standing in for the stubbed pixel decode; the batch shape,
    schema contract, and partition parallelism are exactly what a real
    decoder UDF uses.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "sha": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "head_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


FRAME_STRIDE = 64
FRAME_BYTES = 16

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha", StringType()),
        StructField("frame_bytes", IntegerType()),
    ]
)


def frame_sample(
    media: DataFrame, stride: int = FRAME_STRIDE, frame_bytes: int = FRAME_BYTES
) -> DataFrame:
    """Frame sampling over video-like payloads: every `stride` bytes,
    emit a `frame_bytes` slice — the one-to-many mapInPandas shape a
    real frame decoder uses (one output row per sampled frame, batch
    boundaries independent of per-payload frame counts). The byte-slice
    stands in for the stubbed codec; the fan-out plumbing is real."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas, sizes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # frames are sliced in character space so the DuckDB
                # oracle (whose substring is VARCHAR-only) can replicate
                # the slices exactly; hashes run over the UTF-8 bytes
                s = bytes(payload).decode("utf-8")
                n_frames = (len(s) - 1) // stride + 1 if s else 1
                for k in range(n_frames):
                    fr = s[k * stride : k * stride + frame_bytes].encode(
                        "utf-8"
                    )
                    ids.append(doc_id)
                    idxs.append(k)
                    shas.append(hashlib.sha256(fr).hexdigest())
                    sizes.append(len(fr))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                    "frame_bytes": pd.Series(sizes, dtype="int32"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


_FRAME_ORACLE = """
WITH b AS (
  SELECT doc_id, text, length(text) AS n FROM documents
), f AS (
  SELECT doc_id, text,
         unnest(generate_series(0, greatest(0, (n - 1) // 64))) AS k
  FROM b
)
SELECT doc_id, k::INT AS frame_idx,
       sha256(substring(text, (k * 64 + 1)::INT, 16)) AS frame_sha,
       octet_length(encode(substring(text, (k * 64 + 1)::INT, 16)))::INT
         AS frame_bytes
FROM f ORDER BY doc_id, frame_idx
"""


@register("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling round-trip: documents → BINARY media → one row per
    sampled frame, oracle-verified byte-for-byte via sha256."""
    d = load_table(spark, sf_dir, "documents")
    return frame_sample(as_media(d)).orderBy("doc_id", "frame_idx")


@register(
    "multimodal_features",
    oracle="SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
    "sha256(text) AS sha, "
    "ascii(substr(text, 1, 1)) AS head_byte "
    "FROM documents ORDER BY doc_id",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction round-trip: documents → BINARY media
    table → mapInPandas features. The DuckDB oracle recomputes the same
    bytes in SQL — proving the Arrow path is byte-exact."""
    d = load_table(spark, sf_dir, "documents")
    return media_features(as_media(d)).orderBy("doc_id")
