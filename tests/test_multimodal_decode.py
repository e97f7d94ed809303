"""Real container decode for the multimodal family (VERDICT r6 task 3):
``decode_image`` (netpbm P6/P5) and ``decode_audio`` (RIFF/WAVE PCM) are
pure-Python parsers exercised inside the same Arrow ``mapInPandas``
batches as the byte-level feature paths. Tests pin: header parsing
(comments, chunk walks, padding), loud failures on malformed containers,
and exact roundtrips encode → Spark decode → numpy reference over the
real documents fixture."""

from __future__ import annotations

import hashlib
import pathlib

import numpy as np
import pytest

from cassandra_analytics_example_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    encode_ppm,
    encode_wav,
    extract_features_decoded,
    frame_energies_wav,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- decoders


def _ppm(w, h, pixels, magic=b"P6", maxval=255, header_extra=b""):
    return (
        magic + b"\n" + header_extra
        + str(w).encode() + b" " + str(h).encode()
        + b"\n" + str(maxval).encode() + b"\n" + pixels
    )


def test_decode_image_ppm_with_comments():
    px = bytes(range(2 * 3 * 3))
    img = decode_image(
        _ppm(2, 3, px, header_extra=b"# a comment line\n# another\n")
    )
    assert (img["width"], img["height"], img["channels"]) == (2, 3, 3)
    assert img["maxval"] == 255
    assert img["pixels"] == px


def test_decode_image_pgm_single_channel():
    px = bytes(range(4 * 5))
    img = decode_image(_ppm(4, 5, px, magic=b"P5"))
    assert (img["width"], img["height"], img["channels"]) == (4, 5, 1)
    assert img["pixels"] == px


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"JFIF not a ppm",
        b"P6\n2 nope\n255\nxxxxxx",  # non-numeric dim
        b"P6\n2 2\n255\nshort",  # short raster
        b"P6\n0 2\n255\n",  # zero dim
        b"P6\n2 2\n70000\n" + b"x" * 12,  # maxval out of byte range
    ],
)
def test_decode_image_malformed_raises(payload):
    with pytest.raises(ValueError):
        decode_image(payload)


def _wav(data, tag=1, channels=1, bits=8, rate=8000, extra_chunk=b""):
    fmt = (
        tag.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * bits // 8).to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + extra_chunk
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_decode_audio_walks_extra_and_odd_chunks():
    # LIST chunk with ODD size before fmt — exercises word-align padding
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    wav = decode_audio(_wav(b"hello", extra_chunk=extra))
    assert wav["sample_rate"] == 8000
    assert (wav["channels"], wav["bits"]) == (1, 8)
    assert wav["n_samples"] == 5
    assert wav["data"] == b"hello"


def test_decode_audio_16bit_stereo_sample_count():
    wav = decode_audio(_wav(bytes(16), channels=2, bits=16))
    assert wav["n_samples"] == 4  # 16 bytes / (2 ch · 2 bytes)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFX____WAVE",
        _wav(b"x", tag=85),  # mp3 format tag
        _wav(b"x", bits=24),  # unsupported layout
        _wav(b"abc")[:-2],  # truncated data chunk
        b"RIFF" + (4).to_bytes(4, "little") + b"WAVE",  # no chunks
    ],
)
def test_decode_audio_malformed_raises(payload):
    with pytest.raises(ValueError):
        decode_audio(payload)


def test_no_notimplementederror_left_in_package():
    # VERDICT r6 task 3 exit criterion: the multimodal decoders were the
    # last stubs — the package must now be NotImplementedError-free
    pkg = pathlib.Path("cassandra_analytics_example_spark")
    hits = [
        p
        for p in pkg.rglob("*.py")
        if "NotImplementedError" in p.read_text()
    ]
    assert hits == []


# ------------------------------------------------------- Spark roundtrips


def _ascii(s: str) -> str:
    return "".join(c for c in s if " " <= c <= "~")


def test_encode_ppm_decode_roundtrip_matches_numpy(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(64)
    texts = {
        r["doc_id"]: _ascii(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    feats = {
        r["doc_id"]: r
        for r in extract_features_decoded(encode_ppm(docs)).collect()
    }
    expect_ids = {d for d, t in texts.items() if len(t) > 0}
    assert set(feats) == expect_ids
    for doc_id in expect_ids:
        t = texts[doc_id]
        w, h = len(t) % 31 + 1, len(t) % 17 + 1
        raster = (t * (w * h * 3 // len(t) + 2))[: w * h * 3].encode()
        px = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
        row = feats[doc_id]
        assert row["decode_ok"] is True
        assert (row["width"], row["height"], row["channels"]) == (w, h, 3)
        assert row["n_pixels"] == w * h
        assert row["mean_milli"] == int(px.sum()) * 1000 // len(px)
        assert row["raster_md5"] == hashlib.md5(raster).hexdigest()


def test_encode_wav_decode_roundtrip_matches_numpy(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(48)
    texts = {
        r["doc_id"]: _ascii(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    got = (
        frame_energies_wav(encode_wav(docs), frame_size=64)
        .collect()
    )
    by_doc: dict[int, dict[int, tuple]] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["frame_no"]] = (
            r["n_samples"], r["energy"], r["peak"]
        )
    expect_ids = {d for d, t in texts.items() if len(t) > 0}
    assert set(by_doc) == expect_ids
    for doc_id in expect_ids:
        data = (
            np.frombuffer(texts[doc_id].encode(), dtype=np.uint8).astype(
                np.int64
            )
            - 128
        )
        frames = by_doc[doc_id]
        assert len(frames) == (len(data) + 63) // 64
        for i, off in enumerate(range(0, len(data), 64)):
            seg = data[off : off + 64]
            assert frames[i] == (
                len(seg), int((seg * seg).sum()), int(np.abs(seg).max())
            )


def test_frame_energies_wav_16bit_signed_samples(spark):
    # PCM16 is SIGNED little-endian (already centered at 0) — the 8-bit
    # midpoint-128 shift must not apply, and bytes must pair into int16
    # samples, not be read as two uint8s each
    samples = np.array([-3, 7, -32768, 32767, 0, 100], dtype="<i2")
    wdf = spark.createDataFrame(
        [(1, bytearray(_wav(samples.tobytes(), bits=16)))],
        "doc_id bigint, payload binary",
    )
    rows = frame_energies_wav(wdf, frame_size=4).collect()
    got = {r["frame_no"]: (r["n_samples"], r["energy"], r["peak"]) for r in rows}
    s = samples.astype(np.int64)
    assert got == {
        0: (4, int((s[:4] ** 2).sum()), int(np.abs(s[:4]).max())),
        1: (2, int((s[4:] ** 2).sum()), int(np.abs(s[4:]).max())),
    }


def test_decode_paths_count_corrupt_payloads(spark):
    rows = [
        (1, bytearray(b"P6\n2 2\n255\n" + b"x" * 12), "image/ppm"),
        (2, bytearray(b"garbage"), "image/ppm"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, media_type string"
    )
    feats = {
        r["doc_id"]: r["decode_ok"]
        for r in extract_features_decoded(df).collect()
    }
    assert feats == {1: True, 2: False}

    wav_rows = [
        (1, bytearray(_wav(b"abcd" * 40))),
        (2, bytearray(b"not audio")),
    ]
    wdf = spark.createDataFrame(wav_rows, "doc_id bigint, payload binary")
    frames = frame_energies_wav(wdf, frame_size=64).collect()
    assert {r["frame_no"] for r in frames if r["doc_id"] == 2} == {-1}
    assert all(r["frame_no"] >= 0 for r in frames if r["doc_id"] == 1)


def test_frame_energies_wav_empty_data_chunk_is_counted(spark):
    """A VALID container with an empty data chunk must still appear in
    the frame output (one zero-sample frame_no=0 row) — frame_no=-1 is
    reserved for decode failures, and every input doc_id reconciles."""
    from cassandra_analytics_example_spark.operators.multimodal import (
        frame_energies_wav,
    )

    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + (0).to_bytes(4, "little")
    empty_wav = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    rows = frame_energies_wav(
        spark.createDataFrame(
            [(1, bytearray(empty_wav)), (2, bytearray(b"not a wav"))],
            "doc_id long, payload binary",
        )
    ).collect()
    got = {(r.doc_id, r.frame_no, r.n_samples, r.energy, r.peak) for r in rows}
    assert got == {(1, 0, 0, 0, 0), (2, -1, 0, 0, 0)}
