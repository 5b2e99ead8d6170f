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
                    "width": (n % 16 + 1).astype("int32"),
                    "height": (raw.map(lambda b: b[0] if len(b) else 0) % 16 + 1).astype(
                        "int32"
                    ),
                    "channels": (n % 4 + 1).astype("int32"),
                    "mean_byte": raw.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, DECODED_SCHEMA)
