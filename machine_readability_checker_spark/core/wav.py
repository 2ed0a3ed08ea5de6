"""WAV (RIFF PCM) codec — the real audio decode path.

Pure stdlib chunk walker (not the ``wave`` module: real-world files
carry LIST/fact/cue chunks in arbitrary order between ``fmt `` and
``data``, and the point of this lane is byte-level control): parses the
RIFF header, walks chunks honoring word alignment, validates the
``fmt `` block (PCM integer formats only: 8-bit unsigned, 16/24/32-bit
signed little-endian) and returns the raw frames plus layout.  Malformed
bytes raise ``ValueError`` — the Spark kernels turn that into a
quarantine row, never a task failure.

``encode_wav`` is the deterministic fixture writer (canonical
fmt-then-data layout).
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class DecodedAudio(NamedTuple):
    sample_rate: int
    channels: int
    bits_per_sample: int
    n_frames: int
    frames: bytes  # raw PCM, channels interleaved


def decode_wav(content: bytes) -> DecodedAudio:
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack_from("<I", content, 4)
    end = min(len(content), 8 + riff_size)

    fmt = None
    data = None
    pos = 12
    while pos + 8 <= end:
        cid = content[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + csize]
        if len(body) < csize:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + csize + (csize & 1)

    if fmt is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    if len(fmt) < 16:
        raise ValueError("fmt chunk too short")
    (
        audio_format,
        channels,
        sample_rate,
        _byte_rate,
        block_align,
        bits,
    ) = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format != 1:  # PCM
        raise ValueError(f"unsupported audio format {audio_format} (PCM only)")
    if channels < 1 or sample_rate < 1:
        raise ValueError("invalid channel count / sample rate")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bit depth {bits}")
    expect_align = channels * bits // 8
    if block_align not in (0, expect_align):
        raise ValueError("block alignment inconsistent with fmt")
    if len(data) % expect_align:
        raise ValueError("data chunk not a whole number of frames")
    return DecodedAudio(
        sample_rate=sample_rate,
        channels=channels,
        bits_per_sample=bits,
        n_frames=len(data) // expect_align,
        frames=data,
    )


def samples_float(audio: DecodedAudio):
    """Frames → float64 numpy array shaped (n_frames, channels), scaled
    to [-1, 1] (the feature kernels' common form)."""
    import numpy as np

    b = audio.bits_per_sample
    if b == 8:
        x = np.frombuffer(audio.frames, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif b == 16:
        x = np.frombuffer(audio.frames, dtype="<i2").astype(np.float64)
        x /= 32768.0
    elif b == 32:
        x = np.frombuffer(audio.frames, dtype="<i4").astype(np.float64)
        x /= 2147483648.0
    else:  # 24-bit: sign-extend 3-byte little-endian
        raw = np.frombuffer(audio.frames, dtype=np.uint8).reshape(-1, 3)
        x = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
        x /= float(1 << 23)
    return x.reshape(audio.n_frames, audio.channels)


def encode_wav(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    frames: bytes,
) -> bytes:
    """Deterministic canonical-layout writer (fixtures/tests)."""
    if bits_per_sample not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bit depth {bits_per_sample}")
    block_align = channels * bits_per_sample // 8
    if len(frames) % block_align:
        raise ValueError("frames not a whole number of blocks")
    fmt = struct.pack(
        "<HHIIHH",
        1,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits_per_sample,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(frames))
        + frames
        + (b"\x00" if len(frames) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
