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
    byte, byte-sum mod 997. A real decoder replaces the vectorized stub
    body with image decode / resample / frame-sample — same plumbing,
    same schema discipline.

    The stub itself is numpy-vectorized per Arrow batch (one buffer
    concat + prefix-sum instead of a Python loop over rows): the whole
    point of the mapInPandas contract is batch-at-a-time compute, so the
    reference implementation should model it.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            raise NotImplementedError(
                "real media decode needs PIL/librosa/ffmpeg — not in this "
                "container; stub features are the tested contract"
            )
        import numpy as np

        for pdf in batches:
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            lens = np.array([len(p) for p in payloads], dtype=np.int64)
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            ends = np.cumsum(lens)
            starts = ends - lens
            # per-payload byte sums via one prefix-sum (empty payloads -> 0)
            csum = np.zeros(buf.size + 1, dtype=np.int64)
            np.cumsum(buf, dtype=np.int64, out=csum[1:])
            headers = np.full(len(payloads), -1, dtype=np.int64)
            nonempty = lens > 0
            if buf.size:
                headers[nonempty] = buf[starts[nonempty]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": lens,
                    "header_byte": headers.astype(np.int32),
                    "checksum_mod": (csum[ends] - csum[starts]) % 997,
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("out_w", T.IntegerType(), True),
        T.StructField("out_h", T.IntegerType(), True),
    ]
)


def resize(
    media: DataFrame,
    *,
    out_w: int = 8,
    out_h: int = 8,
    decode_stub: bool = True,
    max_rows_per_batch: int = 64,
) -> DataFrame:
    """Image resize plumbing: binary in, fixed-size binary out.

    Stub decode treats the payload as a row-major byte grid (side =
    floor(sqrt(n)) — deterministic, no decoder) and nearest-neighbor
    samples it to (out_w, out_h); a real pipeline replaces ``_grid`` with
    PIL decode + Image.resize and keeps everything else.

    ``max_rows_per_batch`` is the memory contract: Arrow hands mapInPandas
    whole batches, so batch size x payload size must fit the executor —
    set ``spark.sql.execution.arrow.maxRecordsPerBatch`` to this value
    for real media (done here via repartition-free iteration: the stub
    slices oversized batches itself, which is the portable form).
    """

    def _grid(p: bytes) -> tuple[bytes, int]:
        if not decode_stub:
            raise NotImplementedError("real image decode needs PIL")
        side = max(1, int(len(p) ** 0.5))
        return p[: side * side], side

    def _resize_one(p: bytes) -> bytes:
        g, side = _grid(p)
        # nearest-neighbor index map — the same math PIL NEAREST does
        return bytes(
            g[(y * side // out_h) * side + (x * side // out_w)]
            for y in range(out_h)
            for x in range(out_w)
        )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), max_rows_per_batch):
                part = pdf.iloc[lo : lo + max_rows_per_batch]
                yield pd.DataFrame(
                    {
                        "doc_id": part["doc_id"],
                        "resized": [
                            _resize_one(p if p is not None else b"\0")
                            for p in part["payload"]
                        ],
                        "out_w": out_w,
                        "out_h": out_h,
                    }
                )

    return media.mapInPandas(_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def frame_sample(
    media: DataFrame,
    *,
    frame_bytes: int = 256,
    every_nth: int = 10,
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame sampling plumbing: one binary row in, N frame rows out
    (a flat-map — mapInPandas yields more rows than it consumes, which is
    exactly the shape ffmpeg keyframe extraction needs).

    Stub: the payload is treated as a concatenation of fixed-size frames
    and every n-th is emitted. Real pipelines replace the slicing with
    ffmpeg -skip_frame nokey; the output schema (doc_id, frame_idx,
    frame) and the explode-shaped cardinality are the tested contract.
    At 100 TB the output is written partitioned by doc_id range so one
    video's frames stay co-located for the downstream encoder."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            raise NotImplementedError("real frame extraction needs ffmpeg")
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = p if p is not None else b""
                n_frames = len(p) // frame_bytes
                for k, i in enumerate(range(0, n_frames, every_nth)):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(p[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(_batches, schema=FRAME_SCHEMA)
