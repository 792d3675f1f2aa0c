"""Cross-validation of the pure-Python PPM codec
(hadoop_deliver_spark/codecs.py) against INDEPENDENT decoders — the
avro_io.py proof pattern: the codec must round-trip its own output
AND agree with a second implementation written from the spec with
different machinery (regex header split + per-pixel Python loops
here vs byte-walking parser + vectorized numpy there)."""

from __future__ import annotations

import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_deliver_spark import codecs


def independent_ppm_decode(data: bytes) -> tuple[int, int, bytes]:
    """Second P6 decoder sharing NO code with codecs.ppm_decode:
    strips comments with a regex, splits the header with a regex
    whitespace tokenizer, addresses the raster by computed offset."""
    assert data[:2] == b"P6"
    # the raster starts after the 3rd header token + one whitespace
    pos, toks = 2, []
    body = data
    while len(toks) < 3:
        m = re.match(rb"(?:\s|#[^\n\r]*)*(\d+)", body[pos:])
        assert m, "header token not found"
        toks.append(int(m.group(1)))
        pos += m.end()
    pos += 1  # single raster separator
    w, h, maxval = toks
    assert maxval == 255
    return w, h, data[pos : pos + w * h * 3]


def independent_box2(w: int, h: int, px: bytes) -> tuple[int, int, bytes]:
    """Second 2×2 box filter: per-pixel Python loops, no reshape."""
    w2, h2 = w // 2, h // 2
    out = bytearray()
    for y in range(h2):
        for x in range(w2):
            for c in range(3):
                s = sum(
                    px[((2 * y + dy) * w + 2 * x + dx) * 3 + c]
                    for dy in (0, 1)
                    for dx in (0, 1)
                )
                out.append(s // 4)
    return w2, h2, bytes(out)


@given(
    w=st.integers(1, 23),
    h=st.integers(1, 19),
    seed=st.integers(0, 10**6),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_and_cross_decode(w, h, seed):
    px = codecs.synth_pixels(seed, w, h)
    blob = codecs.ppm_encode(w, h, px)
    dw, dh, dpx, end = codecs.ppm_decode(blob)
    assert (dw, dh, dpx, end) == (w, h, px, len(blob))
    iw, ih, ipx = independent_ppm_decode(blob)
    assert (iw, ih, ipx) == (w, h, px)


@given(
    w=st.integers(2, 17),
    h=st.integers(2, 15),
    seed=st.integers(0, 10**6),
)
@settings(max_examples=40, deadline=None)
def test_box_filter_vs_independent(w, h, seed):
    px = codecs.synth_pixels(seed, w, h)
    assert codecs.box_downsample2(w, h, px) == independent_box2(w, h, px)


def test_decode_handles_comments_and_whitespace():
    """Spec: '#' comments may appear wherever header whitespace may;
    any whitespace (tab/CR/LF/space runs) separates tokens."""
    px = bytes(range(2 * 2 * 3))
    hairy = b"P6\n# a comment\n 2\t\r\n# another # one\n2 \n255\n" + px
    assert codecs.ppm_decode(hairy) == (2, 2, px, len(hairy))
    # the independent regex decoder agrees on the hairy header too
    assert independent_ppm_decode(hairy) == (2, 2, px)


def test_multiframe_demux():
    """Concatenated frames: each frame's offset is knowable only by
    parsing the previous header — the demux loop the framesample
    operator runs."""
    frames = [
        (3, 2, codecs.synth_pixels(7, 3, 2, phase=f)) for f in range(4)
    ]
    blob = b"".join(codecs.ppm_encode(w, h, px) for w, h, px in frames)
    off, seen = 0, []
    while off < len(blob):
        w, h, px, off = codecs.ppm_decode(blob, off)
        seen.append((w, h, px))
    assert seen == frames


def test_decode_rejections():
    with pytest.raises(ValueError, match="not a P6"):
        codecs.ppm_decode(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        codecs.ppm_decode(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    with pytest.raises(ValueError, match="truncated"):
        codecs.ppm_decode(b"P6\n2 2\n255\n\x00\x01")
    with pytest.raises(ValueError, match="pixel buffer"):
        codecs.ppm_encode(2, 2, b"\x00" * 5)
    with pytest.raises(ValueError, match="too small"):
        codecs.box_downsample2(1, 4, bytes(12))


def test_synth_pixels_law():
    """The closed-form pixel law the oracles recompute in SQL."""
    px = codecs.synth_pixels(42, 4, 3, phase=2)
    assert len(px) == 36
    for i in (0, 1, 17, 35):
        assert px[i] == (42 * 31 + 2 * 101 + 7 * i) % 256
