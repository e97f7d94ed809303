"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed through Arrow-batched ``mapInPandas`` (SURVEY.md §7 M4).

This mirrors the reference's only binary column (the ``course`` blob,
``SparkUtils.scala:82``) scaled up to media payloads: the engine treats
image/audio/video as bytes + a metadata struct, and runs decode/feature
steps as vectorized pandas batches. The actual media decode is STUBBED
(image/audio libraries are not in this environment — ``decode_image``
raises ``NotImplementedError``); the Spark-side plumbing — schema, batch
shape, partitioning, deterministic fake features — is real and tested.

Scale notes: payloads stay in executor-side Arrow batches end-to-end (never
driver-collected); ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
batch memory for fat rows; partition count follows the input, so a 100 TB
media corpus processes as ordinary map tasks.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.session import spread

PAYLOAD_SCHEMA = (
    "doc_id bigint, payload binary, media_type string, width int, height int"
)
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, payload_md5 string, "
    "width int, height int, aspect double"
)


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal table from the documents fixture: payload = UTF-8
    bytes of the text (a deterministic stand-in for image bytes), plus a
    typed metadata struct derived from the content."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
    )


def decode_image(payload: bytes) -> "object":
    """Real media decode — requires an image library (PIL/cv2), not present
    in this environment. The feature pipeline uses deterministic fake
    features instead (``extract_features``)."""
    raise NotImplementedError(
        "media decode requires an image library not available in this build; "
        "extract_features() computes deterministic byte-level features instead"
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """Per-payload feature extraction via Arrow-batched ``mapInPandas``.

    Features are byte-level and deterministic (length, md5, aspect ratio
    from metadata) — the stand-in for an embedding/decode step. Batches are
    processed whole (vectorized hashlib over a pandas column), never per-row
    Python in a UDF call loop.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "aspect": pdf["width"].astype("float64")
                    / pdf["height"].astype("float64"),
                }
            )

    # spread: a small single-split input would otherwise serialize all
    # Arrow batches through ONE Python worker; no-op at scale.
    return spread(payloads).mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample(payloads: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over opaque payloads: deterministic byte-stride
    sampling via mapInPandas — the plumbing shape of video frame extraction
    (payload in → many smaller payloads out, one row per sample)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame_bytes"].append(data[off : off + every_n_bytes])
            yield pd.DataFrame(out)

    return spread(payloads).mapInPandas(
        _sample, schema="doc_id bigint, frame_no int, frame_bytes binary"
    )


AUDIO_FRAME_SCHEMA = (
    "doc_id bigint, frame_no int, n_samples int, energy bigint, peak int"
)


def attach_audio_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Multimodal AUDIO stand-in: payload = UTF-8 bytes of the text,
    declared as 8-bit PCM mono. Real decode (wav/mp3 containers, codecs)
    would live behind ``decode_audio`` and an audio library; the
    deterministic byte-level interpretation keeps the plumbing —
    schema, Arrow batches, framing — real and oracle-checkable.

    Non-ASCII characters are stripped BEFORE encoding so one character is
    exactly one payload byte — a SQL oracle working in characters
    (codepoints) and the Spark side working in UTF-8 bytes then see the
    identical sample stream regardless of the fixture's text content."""
    ascii_text = F.regexp_replace(F.col(text_col), r"[^\x00-\x7F]", "")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(ascii_text, "utf-8").alias("payload"),
        F.lit("audio/pcm8-fake").alias("media_type"),
        F.lit(8000).alias("sample_rate"),
    )


def decode_audio(payload: bytes) -> "object":
    """Real audio decode — requires an audio library (soundfile/librosa),
    not present in this environment. ``frame_energies`` interprets the
    payload bytes directly as 8-bit PCM instead."""
    raise NotImplementedError(
        "audio decode requires an audio library not available in this "
        "build; frame_energies() treats payload bytes as 8-bit PCM"
    )


def frame_energies(payloads: DataFrame, frame_size: int = 64) -> DataFrame:
    """Per-frame audio features over opaque payloads via Arrow-batched
    ``mapInPandas``: non-overlapping ``frame_size``-sample frames, each
    reduced to (n_samples, energy, peak) with INTEGER arithmetic
    (samples centered at 96, energy = sum of squares) so the features
    are engine-exact. The frame explosion happens inside the Python
    batch (numpy, vectorized per payload) — payload in, many small rows
    out, the same shape as spectrogram/windowed-feature extraction."""
    import numpy as np

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_no": [],
                "n_samples": [],
                "energy": [],
                "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = (
                    np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                        np.int64
                    )
                    - 96
                )
                for i, off in enumerate(range(0, len(data), frame_size)):
                    seg = data[off : off + frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["n_samples"].append(len(seg))
                    out["energy"].append(int((seg * seg).sum()))
                    out["peak"].append(int(np.abs(seg).max()))
            yield pd.DataFrame(out)

    return spread(payloads).mapInPandas(_frames, schema=AUDIO_FRAME_SCHEMA)


def chunk_dedup_stats(
    df: DataFrame,
    payload_col: str = "payload",
    chunk_bytes: int = 64,
) -> DataFrame:
    """Chunk-level dedup accounting for binary payloads — the
    content-addressable-store question: split every payload into
    fixed-size chunks, digest each, and report the refcount histogram
    (how many chunks are stored once vs referenced N times) with exact
    logical-vs-unique byte totals.

    At 100 TB this is the storage planner for blob columns: logical bytes
    minus unique bytes is what a content-addressed chunk store saves.
    Fixed-size chunking is the oracle-checkable tier (a content-defined
    Rabin boundary would shift-tolerantly dedup more but needs a per-byte
    rolling pass — mapInPandas territory, same output contract).

    All JVM column algebra: one explode by chunk index (bounded by
    payload size / chunk_bytes), one md5-keyed groupBy for refcounts, one
    vocabulary-sized histogram aggregate.  Returns (refcount, n_chunks,
    unique_bytes, logical_bytes) sorted-insensitively.
    """
    ln = F.length(F.col(payload_col))
    idx = F.explode(
        F.sequence(
            F.lit(0),
            F.ceil(ln.cast("double") / F.lit(chunk_bytes)).cast("int")
            - F.lit(1),
        )
    ).alias("i")
    chunks = df.where(ln > 0).select(F.col(payload_col), idx).select(
        F.md5(
            F.expr(f"substring({payload_col}, 1 + {chunk_bytes} * i, {chunk_bytes})")
        ).alias("h"),
        F.length(
            F.expr(f"substring({payload_col}, 1 + {chunk_bytes} * i, {chunk_bytes})")
        ).alias("b"),
    )
    store = chunks.groupBy("h").agg(
        F.count(F.lit(1)).alias("refcount"), F.max("b").alias("b")
    )
    return store.groupBy("refcount").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("b").cast("bigint").alias("unique_bytes"),
        (F.sum("b") * F.col("refcount")).cast("bigint").alias("logical_bytes"),
    ).select(
        F.col("refcount").cast("bigint").alias("refcount"),
        "n_chunks",
        "unique_bytes",
        "logical_bytes",
    )
