"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed through Arrow-batched ``mapInPandas`` (SURVEY.md §7 M4).

This mirrors the reference's only binary column (the ``course`` blob,
``SparkUtils.scala:82``) scaled up to media payloads: the engine treats
image/audio/video as bytes + a metadata struct, and runs decode/feature
steps as vectorized pandas batches. Decode is REAL for the two
dependency-free container formats — ``decode_image`` parses binary PPM
(P6/P5, the netpbm family) and ``decode_audio`` parses RIFF/WAVE PCM —
pure-Python header parsers running inside the same Arrow batches; codec
formats that need an external library (JPEG/MP3/H.264) are out of scope
for this build, and the ``*/fake`` byte-level paths remain for
oracle-exact features over arbitrary payloads.

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


def _ppm_token(data: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited netpbm header token from ``pos``,
    skipping ``#`` comments (which run to end-of-line per the spec)."""
    n = len(data)
    while pos < n:
        c = data[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            while pos < n and data[pos : pos + 1] not in b"\r\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and data[pos : pos + 1] not in b" \t\r\n":
        pos += 1
    if start == pos:
        raise ValueError("truncated netpbm header")
    return data[start:pos], pos


def decode_image(payload: bytes) -> dict:
    """Decode a binary netpbm image (PPM ``P6`` / PGM ``P5``) — a real,
    dependency-free parser: magic, comment-tolerant whitespace-delimited
    header (width, height, maxval ≤ 255), then exactly
    ``width·height·channels`` raster bytes.

    Returns ``{"width", "height", "maxval", "channels", "pixels"}`` with
    ``pixels`` the raw interleaved raster bytes. Raises ``ValueError`` on
    a malformed container (wrong magic, non-numeric header, short
    raster) — decode failures must be loud, not zero-filled, so a
    corrupt-payload audit can count them.
    """
    data = bytes(payload)
    magic, pos = _ppm_token(data, 0)
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"unsupported netpbm magic: {magic!r}")
    channels = 3 if magic == b"P6" else 1
    dims = []
    for _ in range(3):
        tok, pos = _ppm_token(data, pos)
        if not tok.isdigit():
            raise ValueError(f"non-numeric netpbm header token: {tok!r}")
        dims.append(int(tok))
    width, height, maxval = dims
    if width <= 0 or height <= 0 or not (0 < maxval <= 255):
        raise ValueError(f"bad netpbm dimensions: {width}x{height}/{maxval}")
    pos += 1  # exactly ONE whitespace byte separates header from raster
    n_raster = width * height * channels
    pixels = data[pos : pos + n_raster]
    if len(pixels) != n_raster:
        raise ValueError(
            f"short raster: want {n_raster} bytes, have {len(pixels)}"
        )
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "channels": channels,
        "pixels": pixels,
    }


def encode_ppm(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build REAL container payloads from the documents fixture: each
    text (normalized to printable ASCII so one char is one byte) becomes
    a binary PPM (P6) whose raster is the text tiled to
    ``width·height·3`` bytes — deterministic, so decode-path tests have
    exact expectations. Pure JVM column algebra (repeat / substring /
    concat), no Python in the encode."""
    ascii_txt = F.regexp_replace(F.col(text_col), r"[^\x20-\x7E]", "")
    base = df.select(
        F.col(id_col).alias("doc_id"), ascii_txt.alias("__t")
    ).where(F.length("__t") > 0)
    n = F.length("__t")
    w = (n % 31 + 1).cast("int")
    h = (n % 17 + 1).cast("int")
    n_raster = w * h * 3
    reps = (n_raster.cast("bigint") / n + 1).cast("int")
    raster = F.substring(F.repeat(F.col("__t"), reps), F.lit(1), n_raster)
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    return base.select(
        "doc_id",
        F.encode(F.concat(header, raster), "utf-8").alias("payload"),
        F.lit("image/ppm").alias("media_type"),
        w.alias("width"),
        h.alias("height"),
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


DECODED_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, n_pixels bigint, "
    "mean_milli bigint, raster_md5 string, decode_ok boolean"
)


def extract_features_decoded(payloads: DataFrame) -> DataFrame:
    """Feature extraction through the REAL container decode: each batch
    row's payload goes through ``decode_image`` (netpbm parser), and the
    features come from the decoded raster — dimensions from the HEADER
    (not trusted metadata), exact integer mean pixel value in milli-units,
    and a raster digest. A payload that fails to decode yields a row with
    ``decode_ok = false`` and NULL features instead of poisoning the
    batch — the corrupt-payload accounting a 100 TB media crawl needs.
    Same Arrow ``mapInPandas`` shape as ``extract_features``.
    """
    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "width", "height", "channels", "n_pixels",
                "mean_milli", "raster_md5", "decode_ok",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    img = decode_image(bytes(payload))
                except ValueError:
                    for k in ("width", "height", "channels", "n_pixels",
                              "mean_milli", "raster_md5"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
                    continue
                px = np.frombuffer(img["pixels"], dtype=np.uint8)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                out["channels"].append(img["channels"])
                out["n_pixels"].append(img["width"] * img["height"])
                out["mean_milli"].append(
                    int(px.astype(np.int64).sum()) * 1000 // len(px)
                )
                out["raster_md5"].append(
                    hashlib.md5(img["pixels"]).hexdigest()
                )
                out["decode_ok"].append(True)
            yield pd.DataFrame(out)

    return spread(payloads).mapInPandas(
        _decode, schema=DECODED_FEATURE_SCHEMA
    )


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


def decode_audio(payload: bytes) -> dict:
    """Decode a RIFF/WAVE container with uncompressed PCM samples — a
    real, dependency-free parser: RIFF header, chunk walk (tolerating
    extra chunks like ``LIST``/``fact`` and odd-length padding), ``fmt ``
    fields (format tag 1 = PCM only, mono/stereo, 8/16-bit), and the
    ``data`` chunk bytes.

    Returns ``{"sample_rate", "channels", "bits", "n_samples", "data"}``
    with ``data`` the raw little-endian sample bytes. Raises
    ``ValueError`` on malformed containers or non-PCM formats — loud
    decode failures, same contract as ``decode_image``.
    """
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    fmt = None
    pcm = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            fmt = {
                "tag": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            if len(body) != size:
                raise ValueError("short data chunk")
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if fmt["tag"] != 1:
        raise ValueError(f"non-PCM format tag {fmt['tag']}")
    if fmt["bits"] not in (8, 16) or fmt["channels"] not in (1, 2):
        raise ValueError(
            f"unsupported PCM layout: {fmt['bits']}-bit "
            f"{fmt['channels']}-channel"
        )
    bytes_per = fmt["bits"] // 8 * fmt["channels"]
    return {
        "sample_rate": fmt["sample_rate"],
        "channels": fmt["channels"],
        "bits": fmt["bits"],
        "n_samples": len(pcm) // bytes_per,
        "data": pcm,
    }


def encode_wav(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_rate: int = 8000,
) -> DataFrame:
    """Build REAL RIFF/WAVE payloads from the documents fixture: the
    ASCII-normalized text bytes become the 8-bit mono PCM ``data`` chunk
    behind a spec-complete 44-byte header. Header fields that depend on
    the data length (RIFF size, data size) are JVM column algebra over a
    few int-to-little-endian byte builds — no Python in the encode."""
    ascii_txt = F.regexp_replace(F.col(text_col), r"[^\x20-\x7E]", "")
    base = df.select(
        F.col(id_col).alias("doc_id"), ascii_txt.alias("__t")
    ).where(F.length("__t") > 0)

    def le32(col):  # 4 little-endian bytes of an int column, as binary
        return F.expr(
            f"unhex(concat("
            f"lpad(hex(({col}) % 256), 2, '0'), "
            f"lpad(hex(({col}) div 256 % 256), 2, '0'), "
            f"lpad(hex(({col}) div 65536 % 256), 2, '0'), "
            f"lpad(hex(({col}) div 16777216 % 256), 2, '0')))"
        )

    def le16(v: int) -> bytes:
        return int(v).to_bytes(2, "little")

    static_fmt = (
        b"WAVEfmt " + (16).to_bytes(4, "little") + le16(1) + le16(1)
        + int(sample_rate).to_bytes(4, "little")
        + int(sample_rate).to_bytes(4, "little")  # byte rate (8-bit mono)
        + le16(1) + le16(8)
    )
    payload = F.concat(
        F.lit(b"RIFF"),
        le32("36 + length(__t)"),
        F.lit(static_fmt),
        F.lit(b"data"),
        le32("length(__t)"),
        F.encode(F.col("__t"), "utf-8"),
    )
    return base.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("audio/wav").alias("media_type"),
        F.lit(sample_rate).alias("sample_rate"),
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


def frame_energies_wav(payloads: DataFrame, frame_size: int = 64) -> DataFrame:
    """Per-frame audio features through the REAL container decode: each
    payload goes through ``decode_audio`` (RIFF/WAVE PCM parser), samples
    center per the format — PCM8 is unsigned with midpoint 128, PCM16 is
    signed little-endian already centered at 0 — and the same integer
    framing as ``frame_energies`` reduces them to
    ``(n_samples, energy, peak)`` rows; stereo interleaves through the
    framing unchanged (frames are sample-count windows, not per-channel).
    Undecodable payloads surface as a single ``frame_no = -1`` row
    (n_samples 0) so corrupt containers are counted, not silently
    dropped; a VALID container with an empty data chunk surfaces as one
    ``frame_no = 0`` row with zero samples — every input doc_id appears
    in the output, so frame counts reconcile against input counts."""
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
                try:
                    wav = decode_audio(bytes(payload))
                except ValueError:
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(-1)
                    out["n_samples"].append(0)
                    out["energy"].append(0)
                    out["peak"].append(0)
                    continue
                if wav["bits"] == 16:
                    raw = wav["data"][: len(wav["data"]) & ~1]
                    data = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                else:
                    data = (
                        np.frombuffer(wav["data"], dtype=np.uint8).astype(
                            np.int64
                        )
                        - 128
                    )
                if len(data) == 0:
                    # valid container, empty data chunk: emit an explicit
                    # zero-sample frame so the doc is counted (frame_no
                    # -1 stays reserved for decode FAILURES)
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(0)
                    out["n_samples"].append(0)
                    out["energy"].append(0)
                    out["peak"].append(0)
                    continue
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
