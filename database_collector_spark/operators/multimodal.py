"""Multimodal (binary) column plumbing (extension surface;
BASELINE.json north star).

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct. The Spark-side contract — schema, Arrow batch shape, partition
sizing — is real and tested; the actual media decode is STUBBED (the
image/audio libraries are not in this container): ``decode_stub=True``
derives deterministic fake features from the bytes, and
``decode_stub=False`` raises NotImplementedError where a real decoder
(PIL/librosa/ffmpeg) would plug in.

Design for 100 TB of media:
* mapInPandas, not a row UDF: Arrow moves the binary batches, pandas
  vectorizes the per-batch work.
* ``spark.sql.files.maxPartitionBytes`` (and for real media, a rebatch by
  target row count) bounds executor memory per task — a 4 GiB video row
  must not co-batch with a thousand thumbnails.
* metadata (dims, codec, duration) lives in a sibling struct column so
  filters prune on parquet statistics without touching the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("declared_format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("header_byte", T.IntegerType(), True),
        T.StructField("checksum_mod", T.LongType(), True),
    ]
)


def to_media(docs: DataFrame, *, media_type: str = "image") -> DataFrame:
    """documents -> opaque binary rows (UTF-8 payload stands in for media
    bytes; real pipelines read the blobs from object storage)."""
    return docs.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("declared_format"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    Stub features (deterministic, engine-checkable): payload size, first
    byte, byte-sum mod 997. A real decoder replaces ``_features_of`` with
    image decode / resample / frame-sample — same plumbing, same schema
    discipline.
    """

    def _features_of(payload: bytes) -> tuple[int, int, int]:
        if not decode_stub:
            raise NotImplementedError(
                "real media decode needs PIL/librosa/ffmpeg — not in this "
                "container; stub features are the tested contract"
            )
        return len(payload), payload[0] if payload else -1, sum(payload) % 997

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _features_of(p if p is not None else b"") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f[0] for f in feats],
                    "header_byte": [f[1] for f in feats],
                    "checksum_mod": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)
