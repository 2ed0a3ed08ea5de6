"""Perceptual image hashing + near-dup pairing (operators/imagehash.py).

Hash values are pinned through ``dhash_target_image`` — the exact
inverse construction — so every assertion is hand-derivable; payloads
go through the repo's REAL codecs (PNG/BMP/GIF/JPEG), so a codec
regression fails here as a wrong hash.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.core.bmp import encode_bmp
from machine_readability_checker_spark.core.gif import encode_gif
from machine_readability_checker_spark.core.jpeg import encode_jpeg
from machine_readability_checker_spark.core.png import encode_png
from machine_readability_checker_spark.operators import imagehash as IH


def _png_of(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return encode_png(w, h, 1, arr.astype(np.uint8).tobytes())


def test_dhash_inverse_construction_roundtrip():
    for h in (0, 1, 0x0123456789ABCDEF, -1, -(1 << 63), (1 << 63) - 1):
        img = IH.dhash_target_image(h)
        got = IH.dhash_gray(img.astype(np.float64))
        want = h if h < 1 << 63 else h - (1 << 64)
        assert got == want, (hex(h), hex(got))


def test_dhash_brightness_shift_invariant():
    h = 0x00FF00FF12345678
    base = IH.dhash_gray(IH.dhash_target_image(h).astype(np.float64))
    # walk range is [16, 240]; jitter 12 keeps every pixel unclipped
    shifted = IH.dhash_gray(IH.dhash_target_image(h, jitter=12).astype(np.float64))
    assert base == shifted


def test_dhash_resize_invariant_on_replication():
    # 2x pixel replication box-averages back to the identical 9x8 grid
    img = IH.dhash_target_image(0x5A5A_1234_DEAD_BEEF)
    big = np.kron(img, np.ones((2, 2), dtype=np.uint8))
    assert IH.dhash_gray(big.astype(np.float64)) == IH.dhash_gray(
        img.astype(np.float64)
    )


def test_cross_container_pixel_digest_and_dhash(spark):
    img = IH.dhash_target_image(0x1122334455667788)
    px = img.tobytes()
    rows = [
        ("png", bytearray(encode_png(9, 8, 1, px))),
        ("bmp", bytearray(encode_bmp(9, 8, 1, px))),
        ("gif", bytearray(encode_gif(9, 8, 1, px))),
    ]
    out = IH.image_hashes(
        spark.createDataFrame(rows, "media_ref string, content binary")
    ).collect()
    md5s = {r.pixel_md5 for r in out}
    dhs = {r.dhash for r in out}
    assert len(md5s) == 1 and len(dhs) == 1  # identical pixels collide
    assert all(r.decode_error is None for r in out)
    assert dhs == {0x1122334455667788}


def test_jpeg_reencode_keeps_dhash(spark):
    # ±14-step gradients survive baseline-JPEG quantization noise
    img = IH.dhash_target_image(0x0F0F_F0F0_3C3C_C3C3)
    rows = [
        ("png", bytearray(encode_png(9, 8, 1, img.tobytes()))),
        ("jpg", bytearray(encode_jpeg(9, 8, 1, img.tobytes()))),
    ]
    out = {
        r.media_ref: r.dhash
        for r in IH.image_hashes(
            spark.createDataFrame(rows, "media_ref string, content binary")
        ).collect()
    }
    assert out["png"] == out["jpg"]


def test_quarantine_row_has_no_hash_and_never_pairs(spark):
    rows = [
        ("ok", bytearray(_png_of(IH.dhash_target_image(7)))),
        ("ok2", bytearray(_png_of(IH.dhash_target_image(7)))),
        ("bad", bytearray(b"\x00\x01not an image")),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    hashed = IH.image_hashes(df).collect()
    bad = [r for r in hashed if r.media_ref == "bad"][0]
    assert bad.dhash is None and bad.decode_error is not None
    pairs = IH.image_near_dups(df).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {("ok", "ok2")}


def test_band_join_equals_all_pairs_filter(spark):
    # hashes engineered at Hamming 0/1/2/3/4 from a base; max_hamming=2
    base = 0x00FF00FF00FF00FF
    hashes = {
        "a": base,
        "b": base ^ 0b1,            # d(a,b)=1
        "c": base ^ 0b11,           # d(a,c)=2, d(b,c)=1
        "d": base ^ 0b111,          # d(a,d)=3 — out vs a, in vs c (1)
        "e": base ^ ((1 << 63) | (1 << 40) | (1 << 21) | 1),  # far
    }
    rows = [(k, bytearray(_png_of(IH.dhash_target_image(v))))
            for k, v in hashes.items()]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    got = {
        (p.id_a, p.id_b): p.hamming
        for p in IH.image_near_dups(df, max_hamming=2).collect()
    }

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    want = {
        tuple(sorted((i, j))): ham(hashes[i], hashes[j])
        for i in hashes
        for j in hashes
        if i < j and ham(hashes[i], hashes[j]) <= 2
    }
    assert got == want
    assert ("a", "d") not in got and ("c", "d") in got


def test_exact_image_dups_groups(spark):
    px1 = IH.dhash_target_image(11).tobytes()
    px2 = IH.dhash_target_image(22).tobytes()
    rows = [
        ("p1", bytearray(encode_png(9, 8, 1, px1))),
        ("b1", bytearray(encode_bmp(9, 8, 1, px1))),
        ("g1", bytearray(encode_gif(9, 8, 1, px1))),
        ("p2", bytearray(encode_png(9, 8, 1, px2))),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    groups = IH.exact_image_dups(df).collect()
    assert len(groups) == 1
    assert groups[0].n_copies == 3
    assert groups[0].members == ["b1", "g1", "p1"]


def test_pair_plan_joins_on_bands_no_cartesian(spark):
    df = spark.createDataFrame(
        [("x", bytearray(_png_of(IH.dhash_target_image(3))))],
        "media_ref string, content binary",
    )
    plan = (
        IH.image_near_dups(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_band_width_guard():
    # 2 bands of 32 bits cannot guarantee recall at max_hamming=2
    with pytest.raises(ValueError):
        IH.hamming_band_pairs(None, "id", band_bits=32, max_hamming=2)
