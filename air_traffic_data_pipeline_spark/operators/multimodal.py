"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The image/audio codecs aren't available in this environment, so the decode
kernel is STUBBED (deterministic fake features derived from the bytes, or
``NotImplementedError`` for real codec names) — but everything Spark-side is
real and tested: the binary column schema, the mapInPandas batch iteration,
the output schema contract, and partition-preserving execution.

At 100 TB: payload bytes never leave the executors, batches stream through
Arrow with bounded memory (spark.sql.execution.arrow.maxRecordsPerBatch),
and the decode parallelism equals the scan parallelism — this is the
standard Spark pattern for media feature-extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, mean_byte double"
)

_REAL_CODECS = {"jpeg", "png", "wav", "mp4"}


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload column from text (test stand-in
    for real image/audio bytes)."""
    return df.withColumn("payload", F.unhex(F.md5(text_col)))


def decode_stub(df: DataFrame, codec: str = "fake") -> DataFrame:
    """'Decode' payloads to typed features via mapInPandas.

    codec='fake' produces deterministic pseudo-metadata from the raw bytes;
    any real codec name raises NotImplementedError (no codec libs here).
    """
    if codec in _REAL_CODECS:
        raise NotImplementedError(
            f"codec {codec!r} requires an image/audio library not present in "
            "this environment; Spark-side plumbing is identical to 'fake'"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            raw = pdf["payload"]
            n = raw.map(len)
            yield type(pdf)(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": (raw.map(lambda b: b[1] if len(b) > 1 else 0) % 16 + 1).astype(
                        "int32"
                    ),
                    "height": (raw.map(lambda b: b[0] if len(b) else 0) % 16 + 1).astype(
                        "int32"
                    ),
                    "channels": (
                        raw.map(lambda b: b[2] if len(b) > 2 else 0) % 4 + 1
                    ).astype("int32"),
                    "mean_byte": raw.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, DECODED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_mean double"
FRAME_BYTES = 4


def frame_sample(df: DataFrame, stride: int = 2) -> DataFrame:
    """Sample every ``stride``-th fixed-size frame from each payload —
    the video-frame-sampling batch shape: mapInPandas EXPANDING rows
    (one input row -> several frame rows), feature per frame.

    At 100 TB the payload bytes stay on the executors and the output is
    a small per-frame feature row; partitioning follows the scan.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, means = [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(raw) // FRAME_BYTES
                for f in range(0, n_frames, stride):
                    chunk = raw[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(f)
                    means.append(float(sum(chunk)) / len(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_mean": pd.Series(means, dtype="float64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)
