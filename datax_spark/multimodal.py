"""Multimodal (image/audio/video) column handling.

Media assets travel as opaque `binary` columns with typed metadata
structs — the only representation that scales: blobs stay columnar in
parquet, never pass through Python except inside Arrow-batched
`mapInPandas`, and partitioning stays byte-size-aware.

The actual codec work (JPEG decode, audio resample, video frame
sampling) needs native libs that are NOT in this container, so the
codec kernels are stubbed behind `DECODERS`: the default entries are
deterministic fakes driven by the blob bytes (so tests exercise the
full Spark plumbing — schema, batching, partitioning — with stable
outputs), and a real deployment swaps in PIL/ffmpeg kernels with the
same signature. `decode_media(real=True)` raises NotImplementedError
to make the boundary explicit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sha", T.StringType()),
    ]
)


def _fake_image_decode(blob: bytes) -> dict:
    """Deterministic fake: dimensions derived from byte length (the
    real kernel would parse the JPEG header)."""
    n = len(blob)
    return {"width": n % 64 + 1, "height": (n * 7) % 48 + 1, "n_frames": 1}


def _fake_video_decode(blob: bytes) -> dict:
    n = len(blob)
    return {"width": n % 64 + 1, "height": (n * 7) % 48 + 1, "n_frames": n % 5 + 1}


DECODERS = {"image": _fake_image_decode, "video": _fake_video_decode}


def decode_media(
    df: DataFrame,
    blob_col: str = "blob",
    media_type_col: str = "media_type",
    id_cols: list[str] | None = None,
    real: bool = False,
) -> DataFrame:
    """blob → metadata struct via Arrow-batched mapInPandas.

    Batch shape: only (id_cols, media_type, blob) enter Python; blobs
    are dropped from the output so the expensive bytes never make a
    second Arrow hop. Partitioning: upstream should repartition by a
    size-aware key so one batch's blobs fit executor memory.
    """
    if real:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not present in this "
            "container — swap DECODERS entries in a full deployment"
        )
    id_cols = id_cols or ["doc_id"]
    in_cols = [*id_cols, media_type_col, blob_col]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + list(MEDIA_META_SCHEMA.fields)
    )

    default_kernels = (
        len(DECODERS) == 2
        and DECODERS.get("image") is _fake_image_decode
        and DECODERS.get("video") is _fake_video_decode
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            out = pdf[id_cols].copy()
            n = pdf[blob_col].map(len).astype("int64")
            out["media_type"] = pdf[media_type_col]
            out["n_bytes"] = n
            if default_kernels:
                # Vectorized over the whole Arrow batch — the fakes'
                # closed forms as numpy arithmetic; the only per-item
                # call left is the hash kernel itself.
                is_video = pdf[media_type_col].eq("video").to_numpy()
                out["width"] = (n % 64 + 1).astype("int32")
                out["height"] = ((n * 7) % 48 + 1).astype("int32")
                out["n_frames"] = np.where(is_video, (n % 5 + 1), 1).astype("int32")
            else:
                # Swapped-in real codec kernels (PIL/ffmpeg) are
                # inherently per-item — the loop lives here and ONLY
                # here, inside the Arrow batch.
                metas = [
                    DECODERS.get(mt, _fake_image_decode)(blob)
                    for mt, blob in zip(pdf[media_type_col], pdf[blob_col])
                ]
                out["width"] = pd.array([m["width"] for m in metas], dtype="int32")
                out["height"] = pd.array([m["height"] for m in metas], dtype="int32")
                out["n_frames"] = pd.array([m["n_frames"] for m in metas], dtype="int32")
            out["sha"] = pdf[blob_col].map(lambda b: hashlib.sha256(b).hexdigest())
            yield out

    return df.select(*in_cols).mapInPandas(_decode, out_schema)


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    media_type_col: str = "media_type",
    id_cols: list[str] | None = None,
    stride: int = 1,
) -> DataFrame:
    """Frame sampling: one row per (asset, frame_idx), every `stride`
    frames. The frame COUNT comes from the decode hop (the only
    Python crossing); frame expansion and per-frame signatures are
    pure JVM — explode(sequence(...)) + sha2 — so a 10^9-frame corpus
    fans out inside codegen, not in Python. A real deployment swaps
    the signature for the decoded frame tensor at the same spot."""
    id_cols = id_cols or ["doc_id"]
    meta = decode_media(
        df, blob_col=blob_col, media_type_col=media_type_col, id_cols=id_cols
    )
    frame_idx = F.explode(
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
    ).alias("frame_idx")
    return meta.select(*id_cols, "media_type", "sha", frame_idx).select(
        *id_cols,
        "media_type",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.sha2(
            F.concat(F.col("sha"), F.lit(":"), F.col("frame_idx").cast("string")), 256
        ).alias("frame_sha"),
    )


def media_meta_sql(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """JVM-only twin of the fake decode (no Python at all) — the shape
    a pure-SQL pipeline uses when only byte-level metadata is needed."""
    n = F.octet_length(F.col(blob_col))
    return df.withColumn(
        "meta",
        F.struct(
            n.alias("n_bytes"),
            (n % 64 + 1).cast("int").alias("width"),
            ((n * 7) % 48 + 1).cast("int").alias("height"),
            F.sha2(F.col(blob_col), 256).alias("sha"),
        ),
    )
