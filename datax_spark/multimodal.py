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

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                blob = getattr(rec, blob_col)
                mt = getattr(rec, media_type_col)
                meta = DECODERS.get(mt, _fake_image_decode)(blob)
                rows.append(
                    {
                        **{c: getattr(rec, c) for c in id_cols},
                        "media_type": mt,
                        "n_bytes": len(blob),
                        "width": meta["width"],
                        "height": meta["height"],
                        "n_frames": meta["n_frames"],
                        "sha": hashlib.sha256(blob).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[*id_cols, *[f.name for f in MEDIA_META_SCHEMA]])

    return df.select(*in_cols).mapInPandas(_decode, out_schema)


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
