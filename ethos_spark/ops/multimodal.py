"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
struct of typed metadata; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas UDFs over ``mapInPandas``. The actual codecs
(PIL/ffmpeg/etc.) are NOT present in this container, so the decode kernel
is a clearly-marked STUB: the Spark-side plumbing — schema, partitioning,
UDF signature, batch shape — is real and tested; swap ``_decode_stub`` for
a real decoder in production.

The deterministic parts (byte length, header byte, derived fake dims) have
exact SQL oracles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_META = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_byte", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: UTF-8 bytes of the text stand in for an image payload."""
    return df.withColumn("media", F.encode(F.col(text_col), "UTF-8"))


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder. A real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not available here
        return {"width": img.width, ...}

    Deterministic fake: dimensions derived from the byte length so the
    whole pipeline (including the oracle comparison) stays reproducible.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "header_byte": payload[0] if n else 0,
        "width": n % 640,
        "height": (n * 7) % 480,
        "codec": "stub",
    }


def decode_media(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """The decode stage: mapInPandas over binary payloads → metadata struct
    columns. Batch shape and schema are production-real; only the kernel is
    a stub."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            *MEDIA_META.fields,
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_stub(bytes(p) if p is not None else b"") for p in pdf[media_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def resize_stub(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Resize stage shape: binary in → binary out + new dims. Stub keeps a
    deterministic prefix of the payload (real impl: actual resample)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    keep = max(1, (target_w * target_h) // 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = [
                (bytes(p)[:keep] if p is not None else None) for p in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "media": media,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, out_schema)
