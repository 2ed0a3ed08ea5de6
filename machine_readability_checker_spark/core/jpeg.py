"""JPEG codec (ITU-T T.81 / JFIF) — pure stdlib + numpy.

The second real still-image decode path next to PNG: marker parse,
canonical Huffman entropy decode (byte-stuffing + restart markers),
dequantize/dezigzag, orthonormal IDCT, chroma upsampling (4:4:4, 4:2:2,
4:2:0), YCbCr→RGB.  The encoder (Annex-K tables, libjpeg quality
scaling, 4:4:4 or 4:2:0) exists for fixtures and round-trip tests.

**Progressive (SOF2, T.81 Annex G) decodes for real**: multi-scan
spectral selection AND successive approximation — interleaved/
single-component DC first+refine scans, single-component AC first
scans with EOBn run coding, the §G.1.2.3 AC refinement correction-bit
algorithm, restart markers per scan — accumulated into per-component
coefficient grids and rendered once at EOI.  This matters because most
web JPEGs are progressive; a baseline-only decoder quarantines the
majority of a real crawl's images.  The encoder can emit a
spectral-selection-only progressive stream (``progressive=True``) for
self-contained fixtures.

Correctness is NOT self-referential: the tests cross-validate both
directions against the JVM's ``javax.imageio`` through the running
SparkSession's py4j gateway — our encoder's bytes must decode correctly
under ImageIO, and ImageIO-written JPEGs (including its
successive-approximation progressive mode) must decode correctly here —
so a shared misunderstanding of the spec cannot cancel out.

Scope: sequential + progressive DCT, 8-bit, 1 or 3 components.
Arithmetic coding and hierarchical mode raise ``ValueError`` →
quarantine rows.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# --- constants (ITU-T T.81 Annex K) --------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)

STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# standard Huffman specs: (BITS[1..16], HUFFVAL)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT basis: row k, column n
_DCT_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_A[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT_A @ block @ _DCT_A.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT_A.T @ coef @ _DCT_A


# --- Huffman -------------------------------------------------------------


def _canonical_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol → (code, length), canonical order per the spec."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) → symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing; restart markers
    surface via ``at_marker`` and are skipped with ``skip_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad past EOI
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # any marker ends the entropy segment: pad with 1s
                    # (T.81 §B.2.1) — the caller resumes at the marker
                    # (restart: skip_restart; progressive: next scan's
                    # header).  Corrupt streams surface as invalid
                    # Huffman codes, never as silent overruns.
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def at_restart(self) -> bool:
        d = self.data
        return (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        )

    def skip_restart(self) -> None:
        self.byte_align()
        self.pos += 2

    def decode_symbol(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder -------------------------------------------------------------


def decode_jpeg(content: bytes) -> Tuple[int, int, int, bytes]:
    """→ (width, height, channels, row-major interleaved 8-bit pixels)."""
    if len(content) < 4 or content[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, Dict] = {}
    huff_ac: Dict[int, Dict] = {}
    restart_interval = 0
    frame = None
    coefs = None  # progressive: per-component zigzag coefficient grids
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = content[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        seg = content[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                table = np.zeros(64)
                table[ZIGZAG] = np.frombuffer(seg[i + 1 : i + 65], np.uint8)
                qt[tq] = table.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                i += 17 + cnt
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF{marker - 0xC0} unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            sel = {}
            order = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
                order.append(cs)
            if not frame["progressive"]:
                return _decode_scan(
                    content,
                    pos + 2 + seglen,
                    frame,
                    sel,
                    qt,
                    huff_dc,
                    huff_ac,
                    restart_interval,
                )
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            if coefs is None:
                coefs = _init_prog_coefs(frame)
            _decode_progressive_scan(
                content, pos + 2 + seglen, frame, order, sel,
                huff_dc, huff_ac, restart_interval, coefs,
                ss, se, a >> 4, a & 0xF,
            )
            pos = _next_marker(content, pos + 2 + seglen)
            continue
        pos += 2 + seglen
    if frame is not None and frame.get("progressive") and coefs is not None:
        return _render_progressive(frame, qt, coefs)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h

    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    pred = [0] * len(comps)
    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if r.at_restart():
                    r.skip_restart()
                else:
                    r.byte_align()
                    if r.at_restart():
                        r.skip_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = r.decode_symbol(huff_dc[dc_t])
                        diff = _extend(r.read_bits(t), t)
                        pred[ci] += diff
                        zz = np.zeros(64)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = r.decode_symbol(huff_ac[ac_t])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(r.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz
                        block = _idct(coef.reshape(8, 8) * qt[c["tq"]]) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    return _postprocess(frame, planes)


def _postprocess(frame, planes):
    """Shared decode tail: upsample to full resolution, crop, color
    transform → (w, h, channels, bytes)."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component JPEG unsupported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()


# --- progressive decoding (T.81 Annex G) ----------------------------------


def _mcu_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _comp_block_grid(frame, c):
    """Non-interleaved block grid: ceil(componentDim / 8) of the
    UNPADDED component size (T.81 §A.2.2) — smaller than the MCU-padded
    grid when the image is not an exact MCU multiple."""
    hmax, vmax, _, _ = _mcu_geometry(frame)
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8  # (rows, cols)


def _init_prog_coefs(frame):
    """Per-component coefficient store over the MCU-padded grid,
    zigzag index order (what every scan addresses)."""
    _, _, mcux, mcuy = _mcu_geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _next_marker(data: bytes, pos: int) -> int:
    """First non-stuffing, non-restart marker at/after ``pos`` (the end
    of an entropy-coded segment)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _refine_nonzero(r: "_BitReader", blk: np.ndarray, k: int, se: int,
                    p1: int, run: int) -> int:
    """AC-refinement advance (T.81 §G.1.2.3 / libjpeg
    decode_mcu_AC_refine inner loop): move k forward over ``run``
    zero-history coefficients, emitting a correction bit for every
    nonzero-history coefficient passed.  Returns the stop index
    (a zero-history slot, or se+1)."""
    while k <= se:
        if blk[k] != 0:
            if r.read_bit():
                if (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else -p1
        else:
            if run == 0:
                break
            run -= 1
        k += 1
    return k


def _decode_progressive_scan(
    data, pos, frame, order, sel, huff_dc, huff_ac,
    restart_interval, coefs, ss, se, ah, al,
):
    comps = frame["comps"]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    scan_cis = [by_id[cid] for cid in order]
    r = _BitReader(data, pos)
    p1 = 1 << al

    def handle_restart(state):
        if r.at_restart():
            r.skip_restart()
        else:
            r.byte_align()
            if r.at_restart():
                r.skip_restart()
        state["pred"] = [0] * len(comps)
        state["eobrun"] = 0

    state = {"pred": [0] * len(comps), "eobrun": 0}
    is_dc = ss == 0

    if is_dc and se != 0:
        raise ValueError("progressive DC scan with Se != 0")
    if not is_dc and len(scan_cis) != 1:
        raise ValueError("progressive AC scan must be single-component")

    if is_dc and len(scan_cis) > 1:
        # interleaved DC scan: standard MCU walk
        _, _, mcux, mcuy = _mcu_geometry(frame)
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    handle_restart(state)
                mcu_count += 1
                for ci in scan_cis:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + by,
                                            mx * c["h"] + bx]
                            _prog_dc_block(
                                r, blk, huff_dc, sel[c["id"]][0],
                                state, ci, ah, al,
                            )
        return

    # single-component scan (DC or AC): walk the component's own grid
    ci = scan_cis[0]
    c = comps[ci]
    rows, cols = _comp_block_grid(frame, c)
    mcu_count = 0
    for byy in range(rows):
        for bxx in range(cols):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                handle_restart(state)
            mcu_count += 1
            blk = coefs[ci][byy, bxx]
            if is_dc:
                _prog_dc_block(
                    r, blk, huff_dc, sel[c["id"]][0], state, ci, ah, al
                )
            else:
                _prog_ac_block(
                    r, blk, huff_ac[sel[c["id"]][1]], state,
                    ss, se, ah, al, p1,
                )


def _prog_dc_block(r, blk, huff_dc, dc_t, state, ci, ah, al):
    if ah == 0:  # first DC scan: Huffman diff at bit position al
        t = r.decode_symbol(huff_dc[dc_t])
        diff = _extend(r.read_bits(t), t)
        state["pred"][ci] += diff
        blk[0] = state["pred"][ci] << al
    else:  # refinement: one raw bit
        if r.read_bit():
            blk[0] = blk[0] | (1 << al)


def _prog_ac_block(r, blk, ac, state, ss, se, ah, al, p1):
    if ah == 0:  # first AC scan for this band
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            sym = r.decode_symbol(ac)
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:  # EOBn: run of end-of-band blocks
                    state["eobrun"] = (1 << run) - 1
                    if run:
                        state["eobrun"] += r.read_bits(run)
                    return
                k += 16  # ZRL
                continue
            k += run
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(r.read_bits(size), size) << al
            k += 1
        return
    # refinement scan (§G.1.2.3)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            sym = r.decode_symbol(ac)
            run, size = sym >> 4, sym & 0xF
            newval = 0
            if size == 0:
                if run != 15:
                    state["eobrun"] = 1 << run
                    if run:
                        state["eobrun"] += r.read_bits(run)
                    break  # EOB tail handled below
                # ZRL: pass 16 zero-history slots
            else:
                if size != 1:
                    raise ValueError("bad AC refinement size")
                newval = p1 if r.read_bit() else -p1
            k = _refine_nonzero(r, blk, k, se, p1, run)
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        # correction bits for the remaining nonzero history of this block
        while k <= se:
            if blk[k] != 0:
                if r.read_bit():
                    if (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else -p1
            k += 1
        state["eobrun"] -= 1


def _render_progressive(frame, qt, coefs):
    comps = frame["comps"]
    _, _, mcux, mcuy = _mcu_geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        grid = coefs[ci]
        rows, cols = grid.shape[0], grid.shape[1]
        plane = np.zeros((rows * 8, cols * 8))
        q = qt[c["tq"]]
        for by in range(rows):
            for bx in range(cols):
                coef = np.zeros(64)
                coef[ZIGZAG] = grid[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct(coef.reshape(8, 8) * q) + 128.0
                )
        planes.append(plane)
    return _postprocess(frame, planes)


# --- encoder -------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((table * scale + 50) / 100), 1, 255)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(
    bw: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
    dc_codes, ac_codes,
) -> int:
    coef = _fdct(block - 128.0) / q
    # zigzag order: zz[i] = coef_flat[ZIGZAG[i]]
    zz = np.round(coef.reshape(64))[ZIGZAG].astype(int)
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(_mag_bits(diff, t), t)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(_mag_bits(v, size), size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
    return dc


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 85,
    subsample_420: bool = False,
    progressive: bool = False,
) -> bytes:
    """JFIF encoder (fixtures + round-trip tests): grayscale or RGB,
    4:4:4 by default, optional 4:2:0 (box-filter chroma).
    ``progressive=True`` emits a REAL SOF2 stream in
    spectral-selection mode (interleaved DC scan, then one AC 1–63
    scan per component; Ah=Al=0) — quantized coefficients are
    identical to the baseline encode of the same pixels, so both
    decode to bit-identical output (pinned in tests).  4:4:4 only."""
    if channels not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    if progressive and subsample_420:
        raise ValueError("progressive fixture encoder is 4:4:4 only")
    img = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    img = img.astype(np.float64)

    ql = _quality_scale(STD_LUMA_Q, quality).reshape(8, 8)
    qc = _quality_scale(STD_CHROMA_Q, quality).reshape(8, 8)

    if channels == 1:
        planes = [img[:, :, 0]]
        samp = [(1, 1)]
        qts = [ql]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_420:
            def box(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), "edge")
                return (
                    pp.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
                )

            planes = [y, box(cb), box(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [ql, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for (sh, sv), p in zip(samp, planes):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")
        )

    dc_l = _canonical_codes(*STD_DC_LUMA)
    ac_l = _canonical_codes(*STD_AC_LUMA)
    dc_c = _canonical_codes(*STD_DC_CHROMA)
    ac_c = _canonical_codes(*STD_AC_CHROMA)
    tabsel = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (channels - 1)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    if progressive:
        # precompute quantized zigzag coefficient blocks (4:4:4 ⇒ every
        # component shares the mcuy × mcux grid)
        zz_all = []
        for ci in range(channels):
            arr = np.zeros((mcuy, mcux, 64), dtype=int)
            for by in range(mcuy):
                for bx in range(mcux):
                    block = padded[ci][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ]
                    coef = _fdct(block - 128.0) / qts[ci]
                    arr[by, bx] = np.round(coef.reshape(64))[ZIGZAG].astype(
                        int
                    )
            zz_all.append(arr)
        # scan 1: interleaved DC (Ss=0 Se=0 Ah=0 Al=0)
        bw = _BitWriter()
        pred = [0] * channels
        for by in range(mcuy):
            for bx in range(mcux):
                for ci in range(channels):
                    dc = int(zz_all[ci][by, bx, 0])
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    t = _category(diff)
                    code, length = tabsel[ci][0][t]
                    bw.write(code, length)
                    if t:
                        bw.write(_mag_bits(diff, t), t)
        bw.flush()
        dc_bits = bytes(bw.buf)
        # one AC 1..63 scan per component (Ss=1 Se=63 Ah=0 Al=0)
        ac_scans = []
        for ci in range(channels):
            bw = _BitWriter()
            ac_codes = tabsel[ci][1]
            for by in range(mcuy):
                for bx in range(mcux):
                    zz = zz_all[ci][by, bx]
                    run = 0
                    last_nz = (
                        int(np.nonzero(zz[1:])[0][-1]) + 1
                        if np.any(zz[1:])
                        else 0
                    )
                    for k in range(1, last_nz + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = ac_codes[0xF0]
                            bw.write(c, ln)
                            run -= 16
                        size = _category(v)
                        c, ln = ac_codes[(run << 4) | size]
                        bw.write(c, ln)
                        bw.write(_mag_bits(v, size), size)
                        run = 0
                    if last_nz < 63:
                        c, ln = ac_codes[0x00]  # EOB (EOBRUN of 1)
                        bw.write(c, ln)
            bw.flush()
            ac_scans.append(bytes(bw.buf))
    else:
        bw = _BitWriter()
        pred = [0] * channels
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(channels):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            y0 = (my * sv + by) * 8
                            x0 = (mx * sh + bx) * 8
                            block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                            pred[ci] = _encode_block(
                                bw, block, qts[ci], pred[ci], *tabsel[ci]
                            )
        bw.flush()

    # quant tables are stored in zigzag order: table_zz[i] = table[ZIGZAG[i]]
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql.reshape(64)[ZIGZAG].astype(np.uint8)))
    if channels == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC2 if progressive else 0xC0, sof)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, STD_DC_LUMA) + dht(1, 0, STD_AC_LUMA)
    if channels == 3:
        out += dht(0, 1, STD_DC_CHROMA) + dht(1, 1, STD_AC_CHROMA)
    if progressive:
        # DC scan header (all components, Ss=Se=0)
        sos = bytes([channels])
        for ci in range(channels):
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x10])
        sos += bytes([0, 0, 0])
        out += seg(0xDA, sos) + dc_bits
        # AC scans (one component each, Ss=1 Se=63)
        for ci in range(channels):
            sos = bytes([1, ci + 1, 0x00 if ci == 0 else 0x01, 1, 63, 0])
            out += seg(0xDA, sos) + ac_scans[ci]
    else:
        sos = bytes([channels])
        for ci in range(channels):
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)
