"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature UDFs.

Design (the part that matters at 100 TB):
- payloads are ``BinaryType`` columns riding next to a metadata struct
  (modality, format, width/height/duration, byte size) — never exploded
  into rows, never stringified;
- per-item work (decode, resize, frame-sample, feature-extract) runs via
  ``mapInPandas``: Arrow batches stream through Python with bounded
  memory (batch size × item size), and partition counts control
  decode parallelism independent of file layout;
- real codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
  the decode kernel is pluggable: ``decode_stub`` raises
  NotImplementedError exactly where a codec call belongs, and
  ``fake_decode_features`` is the deterministic stand-in used by tests —
  the Spark-side plumbing (schemas, batching, partitioning) is real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried beside every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png | wav | mp4 | ...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo wrapper: treat each document's UTF-8 bytes as an opaque media
    payload with metadata — the ingestion shape a real image/audio table
    has (payload column + typed metadata struct)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("raw").alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media"),
    )


def decode_stub(payload: bytes, fmt: str) -> object:
    """Where a real codec belongs (PIL.Image.open / av.open / soundfile).
    Not available in this container — STUB by contract."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "plug a real decoder here (e.g. PIL.Image.open(io.BytesIO(payload)))"
    )


def fake_decode_features(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: byte-histogram moments.
    Replaces the (stubbed) codec+model path so the distributed plumbing is
    testable end-to-end."""
    import hashlib

    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:dims]]


def extract_features(
    media_df: DataFrame, dims: int = 8, batch_size_hint: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media) rows.

    ``mapInPandas`` streams Arrow record batches through Python — memory
    is bounded by batch size, not partition size, and the output schema is
    declared up front (FEATURE_SCHEMA) so Catalyst can keep planning
    around the UDF. The kernel calls ``fake_decode_features``; swap in
    ``decode_stub``-backed real decoding when codecs exist.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = [fake_decode_features(p, dims) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "modality": [m["modality"] for m in pdf["media"]],
                    "n_bytes": [len(p) for p in payloads],
                    "feature_hash": [
                        hashlib.md5(b",".join(f"{x:.6f}".encode() for x in fv)).hexdigest()
                        for fv in feats
                    ],
                    "feature": feats,
                }
            )

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def media_stats(media_df: DataFrame) -> DataFrame:
    """Relational side of the multimodal table: per-modality byte totals.
    Pure built-ins over the metadata struct — binary payloads are never
    deserialized for stats."""
    return (
        media_df.groupBy(F.col("media.modality").alias("modality"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum("media.n_bytes").alias("total_bytes"),
            F.min("media.n_bytes").alias("min_bytes"),
            F.max("media.n_bytes").alias("max_bytes"),
        )
        .orderBy("modality")
    )
