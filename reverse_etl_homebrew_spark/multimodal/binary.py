"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11).

Media is carried as an opaque ``binary`` column plus a typed metadata
struct — the only layout that scales: bytes stay columnar in
parquet/Arrow, metadata prunes without touching payloads, and decode
happens in Arrow-batched Python (``mapInPandas``) only on the rows
that survive metadata pruning.

The actual pixel/sample decoding is STUBBED (no image/audio libs in
this container): ``_decode_stub`` derives deterministic pseudo-features
from the bytes. Everything around it — schema, partitioning, UDF
signature, Arrow batch shape, metadata pruning — is real and tested;
swapping the stub for PIL/torchaudio/pyav changes one function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: media row: opaque payload + typed, prunable metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image|audio|video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def fake_media_table(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic synthetic media rows (payload = seeded bytes) for
    tests and demos — stands in for a real parquet/lance media lake."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                bytearray(payload),
                (
                    kind,
                    {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    64 + i % 512 if kind != "audio" else None,
                    64 + (i * 7) % 512 if kind != "audio" else None,
                    (i * 37) % 120_000 if kind != "image" else None,
                    len(payload),
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection — never touches payload bytes, so the
    parquet reader prunes the heavy column entirely (check ReadSchema
    in .explain)."""
    return df.select(
        "media_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def _decode_stub(payload: bytes, kind: str) -> list:
    """Deterministic fake decode → FEATURE_DIM floats.

    Replace with a real decoder (PIL / torchaudio / pyav) — the
    surrounding Arrow plumbing is unchanged. Raises on empty payloads
    so the error path is exercised like a real codec failure."""
    if not payload:
        raise ValueError("empty payload")
    h = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(FEATURE_DIM)
    ]


def decode_and_featurize(df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``.

    Scale properties: executors stream Arrow batches (payload bytes
    never materialize as one Python list); failed decodes yield
    decode_ok=false rows instead of failing the task — the DLQ pattern
    applied to media."""
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "feature": [], "decode_ok": []}
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                kind = meta["kind"] if meta is not None else None
                try:
                    feat = _decode_stub(bytes(payload) if payload is not None else b"", kind)
                    ok = True
                except Exception:
                    feat, ok = None, False
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                out["feature"].append(feat)
                out["decode_ok"].append(ok)
            yield pd.DataFrame(out)

    return df.mapInPandas(decode_batches, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (video, frame
    timestamp) — pure Column expressions (sequence+explode), so the
    expansion happens JVM-side; the downstream per-frame decode is the
    same mapInPandas shape as decode_and_featurize."""
    videos = df.filter(F.col("meta.kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
