"""Pure-Python multimodal codecs — REAL byte-level image handling for
the multimodal operator family (the avro_io.py precedent: no codec
library exists in this container, so the container format itself is
implemented from its public specification and cross-validated against
an independent decoder in tests).

Implemented format: **Netpbm PPM "P6"** (binary portable pixmap) —
the simplest real, widely-produced uncompressed image container.
Public spec (netpbm.sourceforge.net/doc/ppm.html): magic ``P6``,
then whitespace-separated ASCII ``width height maxval`` (with
``#``-to-end-of-line comments allowed anywhere in the header), ONE
whitespace byte, then ``width*height*3`` raw RGB bytes (maxval ≤ 255;
the 2-byte-per-sample maxval > 255 variant is rejected explicitly).

Everything here is driver/executor-side pure Python + numpy and is
used INSIDE ``mapInPandas`` Arrow batches by the
``llm_multimodal_decode`` / ``llm_multimodal_resize`` /
``llm_multimodal_framesample`` operators; nothing imports Spark.

Determinism contract: all functions are pure byte transforms —
the 2×2 box filter uses floor (integer) division so an oracle can
reproduce every output byte with integer arithmetic alone.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ppm_encode",
    "ppm_decode",
    "box_downsample2",
    "synth_pixels",
    "PPM_MAGIC",
]

#: magic bytes of a binary portable pixmap
PPM_MAGIC = b"P6"


def ppm_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize raw RGB bytes into a P6 PPM file (maxval 255).

    ``pixels`` must be exactly ``width*height*3`` bytes, row-major,
    RGB interleaved. The header is the canonical single-space form
    ``P6\\n{w} {h}\\n255\\n`` — one fixed serialization so payload
    lengths are a pure function of (w, h), which the operator oracles
    exploit.
    """
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, need {width * height * 3}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(pixels)


def _read_header_token(data: bytes, pos: int) -> tuple[int, int]:
    """Read one whitespace-delimited ASCII integer from a PPM header,
    skipping whitespace and ``#`` comments (spec: a comment runs from
    ``#`` to end of line and may appear wherever whitespace may).
    Returns (value, next_pos)."""
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x23:  # '#' — comment to end of line
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
        elif b in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
            pos += 1
        else:
            break
    start = pos
    while pos < n and 0x30 <= data[pos] <= 0x39:
        pos += 1
    if pos == start:
        raise ValueError(f"expected ASCII integer at byte {start}")
    return int(data[start:pos]), pos


def ppm_decode(data: bytes, offset: int = 0) -> tuple[int, int, bytes, int]:
    """Parse ONE P6 image starting at ``offset`` in ``data``.

    Returns ``(width, height, pixels, next_offset)`` where ``pixels``
    is the raw ``width*height*3`` RGB buffer and ``next_offset``
    points just past this image — concatenated-frame streams (the
    ``llm_multimodal_framesample`` 'video' container) are demuxed by
    calling this in a loop, exactly like any real container demuxer:
    the NEXT frame's position is knowable only by parsing this one's
    header.

    Raises ``ValueError`` on wrong magic, maxval > 255 (the 16-bit
    variant is out of scope), or a truncated pixel buffer.
    """
    if data[offset : offset + 2] != PPM_MAGIC:
        raise ValueError(f"not a P6 PPM at offset {offset}")
    pos = offset + 2
    width, pos = _read_header_token(data, pos)
    height, pos = _read_header_token(data, pos)
    maxval, pos = _read_header_token(data, pos)
    if maxval > 255 or maxval <= 0:
        raise ValueError(f"unsupported maxval {maxval}")
    # exactly ONE whitespace byte separates maxval from raster (spec)
    if pos >= len(data) or data[pos] not in (0x20, 0x09, 0x0A, 0x0D):
        raise ValueError("missing raster separator after maxval")
    pos += 1
    n = width * height * 3
    if len(data) - pos < n:
        raise ValueError(
            f"truncated raster: need {n} bytes, have {len(data) - pos}"
        )
    return width, height, bytes(data[pos : pos + n]), pos + n


def box_downsample2(width: int, height: int, pixels: bytes) -> tuple[int, int, bytes]:
    """2×2 box-filter downsample of an RGB buffer: each output channel
    byte is the FLOOR mean ``(a + b + c + d) // 4`` of the 2×2 input
    block — pure integer arithmetic, so every output byte is
    oracle-reproducible. Odd trailing row/column is truncated
    (output dims = ``w//2 × h//2``), the stated edge convention.
    Vectorized: one numpy reshape + sum per batch of pixels, no
    per-pixel Python loop."""
    w2, h2 = width // 2, height // 2
    if w2 == 0 or h2 == 0:
        raise ValueError(f"image {width}x{height} too small for 2x2 filter")
    a = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)[: h2 * 2, : w2 * 2, :]
        .astype(np.uint32)
    )
    # sum the 2×2 blocks: split each spatial axis into (blocks, 2)
    blk = a.reshape(h2, 2, w2, 2, 3).sum(axis=(1, 3)) // 4
    return w2, h2, blk.astype(np.uint8).tobytes()


def synth_pixels(seed: int, width: int, height: int, phase: int = 0) -> bytes:
    """Deterministic synthetic RGB buffer: byte ``i`` of the raster is
    ``(seed*31 + phase*101 + 7*i) mod 256`` — the closed-form pixel
    law the operator ORACLES recompute independently in SQL (the
    whole point: the Spark side round-trips these bytes through the
    real PPM container and the real box filter; DuckDB never sees a
    byte and still predicts every feature)."""
    n = width * height * 3
    return (
        (seed * 31 + phase * 101 + 7 * np.arange(n, dtype=np.int64)) % 256
    ).astype(np.uint8).tobytes()
