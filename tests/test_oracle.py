"""Native C++ oracle parity vs golden fixtures (mirrors reference tier-1:
test/source/simple_test.cpp:77-210 encode/decode exactness)."""

import numpy as np

from qoipp_tpu import Channels, Colorspace, Desc
from qoipp_tpu import oracle

DESC3 = Desc(29, 17, Channels.RGB, Colorspace.SRGB)
DESC4 = Desc(24, 14, Channels.RGBA, Colorspace.SRGB)


def test_encode_golden_rgb(raw3, qoi3):
    out, complete = oracle.encode(raw3, DESC3)
    assert complete
    assert np.array_equal(out, qoi3)


def test_encode_golden_rgba(raw4, qoi4):
    out, complete = oracle.encode(raw4, DESC4)
    assert complete
    assert np.array_equal(out, qoi4)


def test_decode_golden(raw3, qoi3, raw4, qoi4):
    assert np.array_equal(oracle.decode(qoi3, DESC3, Channels.RGB), raw3)
    assert np.array_equal(oracle.decode(qoi4, DESC4, Channels.RGBA), raw4)


def test_decode_channel_conversion(raw3, qoi3, raw4, qoi4):
    # RGB stream -> RGBA: alpha 0xFF; RGBA -> RGB: alpha dropped
    # (reference: source/util.hpp:281-296)
    rgba = oracle.decode(qoi3, DESC3, Channels.RGBA).reshape(-1, 4)
    assert np.array_equal(rgba[:, :3].reshape(-1), raw3)
    assert np.all(rgba[:, 3] == 0xFF)
    rgb = oracle.decode(qoi4, DESC4, Channels.RGB)
    assert np.array_equal(rgb, raw4.reshape(-1, 4)[:, :3].reshape(-1))


def test_decode_incomplete_tolerant(qoi3_incomplete, qoi4_incomplete):
    # Truncated input still decodes deterministically
    # (reference: simple_test.cpp:316-322, simple.cpp:106-113)
    out3 = oracle.decode(qoi3_incomplete, DESC3, Channels.RGB)
    assert out3.size == 29 * 17 * 3
    out4 = oracle.decode(qoi4_incomplete, DESC4, Channels.RGBA)
    assert out4.size == 24 * 14 * 4


def test_partial_encode_no_torn_chunk(raw3, qoi3):
    # Reference: a 1007-byte buffer stops exactly at a chunk boundary
    # (simple_test.cpp:24-25, 98-107: partial size 1007 of 1019).
    out, complete = oracle.encode(raw3, DESC3, out_cap=1007)
    assert not complete
    assert out.size <= 1007
    assert np.array_equal(out, qoi3[: out.size])


def test_partial_encode_sweep(raw3, qoi3):
    # Every output cap must yield a clean prefix of the golden stream.
    for cap in range(14, qoi3.size + 1, 7):
        out, complete = oracle.encode(raw3, DESC3, out_cap=cap)
        assert np.array_equal(out, qoi3[: out.size]), f"cap={cap}"
        assert complete == (cap >= qoi3.size)


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    for ch in (Channels.RGB, Channels.RGBA):
        desc = Desc(63, 41, ch)
        # Low-entropy pixels exercise RUN/INDEX/DIFF/LUMA ops.
        raw = (rng.integers(0, 5, 63 * 41 * int(ch)) * 3).astype(np.uint8)
        enc, complete = oracle.encode(raw, desc)
        assert complete
        dec = oracle.decode(enc, desc, ch)
        assert np.array_equal(dec, raw)


def test_flip_vertical(raw3):
    flipped = oracle.flip_vertical(raw3, DESC3)
    rows = raw3.reshape(17, 29 * 3)
    assert np.array_equal(flipped.reshape(17, 29 * 3), rows[::-1])
