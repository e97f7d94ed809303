"""Hypothesis fuzz + parametric round-trips for the pure-Python media
container decoders.

Contract under test: on a 100 TB media crawl the decoders see arbitrary
corrupt bytes, and the corrupt-payload accounting in
``extract_features_decoded`` catches exactly ``ValueError`` — so a
malformed container must NEVER escape as ``IndexError`` / ``KeyError`` /
``struct.error`` / ``OverflowError`` (those would poison the whole Arrow
batch instead of flagging one row).  Round-trips pin the parsers across
the full parameter space, not just the fixture shapes.

No SparkSession needed — these run the decoders directly.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_analytics_example_spark.operators.multimodal import (
    decode_audio,
    decode_image,
)


# --- round-trips over the full parameter space ---------------------------


@settings(max_examples=150, deadline=None)
@given(
    width=st.integers(1, 40),
    height=st.integers(1, 40),
    maxval=st.integers(1, 255),
    rgb=st.booleans(),
    comment=st.booleans(),
    data=st.data(),
)
def test_ppm_roundtrip_any_dimensions(width, height, maxval, rgb, comment, data):
    channels = 3 if rgb else 1
    raster = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=width * height * channels,
                max_size=width * height * channels,
            )
        )
    )
    magic = b"P6" if rgb else b"P5"
    cmt = b"# fuzz comment\n" if comment else b""
    payload = (
        magic + b"\n" + cmt
        + str(width).encode() + b" " + str(height).encode() + b"\n"
        + cmt
        + str(maxval).encode() + b"\n" + raster
    )
    img = decode_image(payload)
    assert img["width"] == width
    assert img["height"] == height
    assert img["maxval"] == maxval
    assert img["channels"] == channels
    assert img["pixels"] == raster


@settings(max_examples=150, deadline=None)
@given(
    sample_rate=st.integers(1, 192_000),
    stereo=st.booleans(),
    wide=st.booleans(),
    n_samples=st.integers(0, 200),
    extra_chunk=st.booleans(),
    data=st.data(),
)
def test_wav_roundtrip_any_layout(
    sample_rate, stereo, wide, n_samples, extra_chunk, data
):
    channels = 2 if stereo else 1
    bits = 16 if wide else 8
    bytes_per = bits // 8 * channels
    pcm = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=n_samples * bytes_per,
                max_size=n_samples * bytes_per,
            )
        )
    )
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * bytes_per).to_bytes(4, "little")
        + bytes_per.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if extra_chunk:
        # odd-length LIST chunk exercises word-alignment padding
        chunks += b"LIST" + (3).to_bytes(4, "little") + b"odd" + b"\x00"
    chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
    payload = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    wav = decode_audio(payload)
    assert wav["sample_rate"] == sample_rate
    assert wav["channels"] == channels
    assert wav["bits"] == bits
    assert wav["n_samples"] == n_samples
    assert wav["data"] == pcm


# --- fuzz: corrupt containers fail loudly but ONLY as ValueError ----------


@settings(max_examples=400, deadline=None)
@given(payload=st.binary(max_size=512))
def test_decode_image_fuzz_valueerror_only(payload):
    try:
        img = decode_image(payload)
    except ValueError:
        return
    # accidental-valid payloads must still satisfy the invariants
    assert len(img["pixels"]) == img["width"] * img["height"] * img["channels"]


@settings(max_examples=400, deadline=None)
@given(payload=st.binary(max_size=512))
def test_decode_audio_fuzz_valueerror_only(payload):
    try:
        wav = decode_audio(payload)
    except ValueError:
        return
    bytes_per = wav["bits"] // 8 * wav["channels"]
    assert wav["n_samples"] == len(wav["data"]) // bytes_per


@settings(max_examples=200, deadline=None)
@given(
    prefix=st.sampled_from(
        [b"P6\n", b"P6\n4 4\n255\n", b"RIFF", b"RIFF\x10\x00\x00\x00WAVE"]
    ),
    tail=st.binary(max_size=256),
)
def test_decode_fuzz_truncated_headers(prefix, tail):
    """Structured prefixes + random tails: the high-yield corruption
    class (truncated/overwritten files) must also stay ValueError-only."""
    payload = prefix + tail
    for dec in (decode_image, decode_audio):
        try:
            dec(payload)
        except ValueError:
            pass
