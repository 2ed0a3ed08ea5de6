"""AVI / Motion-JPEG container — the real video decode path.

With ``core/jpeg.py`` in place, real video needs only a RIFF container
walk: an MJPEG AVI is ``RIFF('AVI ' LIST('hdrl' avih …) LIST('movi'
00dc <jpeg> …))`` whose movi chunks are complete baseline JPEG frames.
``decode_avi`` validates the header, walks nested LISTs honoring word
alignment, and returns per-frame JPEG bytes plus stream geometry/fps;
each frame then decodes through the cross-validated JPEG codec.

``encode_avi`` writes the canonical minimal layout (fixture writer).
Malformed bytes raise ``ValueError`` → quarantine rows, as everywhere.
"""

from __future__ import annotations

import struct
from typing import List, NamedTuple


class DecodedVideo(NamedTuple):
    width: int
    height: int
    us_per_frame: int
    frames: List[bytes]  # MJPEG: each entry is a complete JPEG stream
    # avih dwTotalFrames as written (0 = absent/unreliable); the frames
    # list is the ground truth — real writers often get this wrong
    declared_frames: int = 0

    @property
    def fps(self) -> float:
        return 1e6 / self.us_per_frame if self.us_per_frame else 0.0

    @property
    def duration_sec(self) -> float:
        return len(self.frames) * self.us_per_frame / 1e6


def _walk(data: bytes, start: int, end: int, frames: List[bytes], meta: dict):
    pos = start
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        body_end = body_start + csize
        if body_end > end:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"LIST":
            _walk(data, body_start + 4, body_end, frames, meta)
        elif cid == b"avih":
            if csize < 40:
                raise ValueError("avih chunk too short")
            (us_per_frame,) = struct.unpack_from("<I", data, body_start)
            total_frames, _init, _streams = struct.unpack_from(
                "<III", data, body_start + 16
            )
            width, height = struct.unpack_from("<II", data, body_start + 32)
            meta.update(
                us_per_frame=us_per_frame,
                declared_frames=total_frames,
                width=width,
                height=height,
            )
        elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
            frames.append(data[body_start:body_end])
        pos = body_end + (csize & 1)  # word alignment


def decode_avi(content: bytes) -> DecodedVideo:
    if (
        len(content) < 12
        or content[:4] != b"RIFF"
        or content[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack_from("<I", content, 4)
    end = min(len(content), 8 + riff_size)
    frames: List[bytes] = []
    meta: dict = {}
    _walk(content, 12, end, frames, meta)
    if "width" not in meta:
        raise ValueError("missing avih header")
    # Real-world AVIs (OpenDML two-pass writers, streamed captures)
    # routinely carry a zero or stale avih dwTotalFrames; the movi chunk
    # walk is the ground truth.  Only a declared count that is nonzero
    # AND wildly off (>2x or <half the counted frames) marks corruption
    # worth quarantining; small drift is surfaced as metadata instead.
    declared = meta.get("declared_frames") or 0
    if declared and frames and not (
        len(frames) / 2 <= declared <= len(frames) * 2
    ):
        raise ValueError(
            f"avih declares {declared} frames, movi holds {len(frames)}"
        )
    return DecodedVideo(
        width=meta["width"],
        height=meta["height"],
        us_per_frame=meta["us_per_frame"],
        frames=frames,
        declared_frames=declared,
    )


def encode_avi(
    width: int, height: int, fps: float, jpeg_frames: List[bytes]
) -> bytes:
    """Minimal canonical MJPEG AVI writer (fixtures/tests)."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            cid
            + struct.pack("<I", len(body))
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    us_per_frame = int(round(1e6 / fps)) if fps else 0
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame,
        0,
        0,
        0,
        len(jpeg_frames),
        0,
        1,
        0,
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, int(round(fps)) or 1,
                      0, len(jpeg_frames), 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
