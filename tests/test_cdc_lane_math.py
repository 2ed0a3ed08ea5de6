"""The cdc_chunks lane's constructive-oracle math: on a constant-byte
blob the gear hash reaches the fixed point −gear[b] (mod 2^64) after
64 bytes, so boundary behavior is fully determined by
(−gear[b]) & mask — the property the DuckDB oracle's arithmetic chunk
reconstruction rests on."""

from __future__ import annotations

from machine_readability_checker_spark.operators.cdc import (
    _GEAR,
    _MASK64,
    cdc_boundaries,
)

MASK = 255  # avg_size=256, the lane's parameters
MIN, MAX = 100, 700


def _fixed_point(b: int) -> int:
    return (-_GEAR[b]) & _MASK64


def test_gear_fixed_point_after_64_bytes():
    """h_i = (2^i − 1)·g mod 2^64 → −g for every i ≥ 64, any byte."""
    for b in (ord("p"), ord("a"), ord("x"), 0, 255):
        g = _GEAR[b]
        h = 0
        for i in range(1, 200):
            h = ((h << 1) + g) & _MASK64
            assert h == ((pow(2, i, 1 << 64) - 1) * g) & _MASK64
            if i >= 64:
                assert h == _fixed_point(b)


def test_lane_byte_choices():
    """'p' cuts at mask 255 (hash-driven boundary), 'a'/'x' never do
    (force-cut path) — the partition of doc_ids the lane + oracle use."""
    assert _fixed_point(ord("p")) & MASK == 0
    assert _fixed_point(ord("a")) & MASK != 0
    assert _fixed_point(ord("x")) & MASK != 0


def test_constant_run_boundaries_match_arithmetic():
    """cdc_boundaries on constant blobs == the oracle's closed form:
    chunk size s = MIN+1 for a cutting byte, MAX otherwise; offsets at
    i·s with a LEAST(s, L−i·s) tail."""
    for ch, s in (("p", MIN + 1), ("a", MAX), ("x", MAX)):
        for L in (400, 617, 834, 2570, MAX, MAX + 1, s, s - 1):
            got = cdc_boundaries(ch.encode() * L, 256, MIN, MAX)
            want = []
            off = 0
            while off < L:
                want.append((off, min(s, L - off)))
                off += s
            assert got == want, (ch, L)
