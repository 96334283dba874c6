"""JAX parallel decoder parity vs the native oracle and golden fixtures."""

import numpy as np
import pytest

from qoipp_tpu import Channels, Colorspace, Desc
from qoipp_tpu import oracle
from qoipp_tpu.ops import decode as dec_ops

DESC3 = Desc(29, 17, Channels.RGB, Colorspace.SRGB)
DESC4 = Desc(24, 14, Channels.RGBA, Colorspace.SRGB)


def check_roundtrip(raw, desc, dst=None):
    dst = dst if dst is not None else desc.channels
    enc, complete = oracle.encode(raw, desc)
    assert complete
    want = oracle.decode(enc, desc, dst)
    got = dec_ops.decode_single(enc, desc, dst)
    diff = np.nonzero(got != want)[0]
    assert diff.size == 0, f"first pixel-byte mismatch at {diff[:5]} of {want.size}"


def test_golden_rgb(raw3, qoi3):
    got = dec_ops.decode_single(qoi3, DESC3, Channels.RGB)
    assert np.array_equal(got, raw3)


def test_golden_rgba(raw4, qoi4):
    got = dec_ops.decode_single(qoi4, DESC4, Channels.RGBA)
    assert np.array_equal(got, raw4)


def test_golden_channel_conversion(raw3, qoi3, raw4, qoi4):
    rgba = dec_ops.decode_single(qoi3, DESC3, Channels.RGBA).reshape(-1, 4)
    assert np.array_equal(rgba[:, :3].reshape(-1), raw3)
    assert np.all(rgba[:, 3] == 0xFF)
    rgb = dec_ops.decode_single(qoi4, DESC4, Channels.RGB)
    assert np.array_equal(rgb, raw4.reshape(-1, 4)[:, :3].reshape(-1))


def test_incomplete_tolerant(qoi3_incomplete, qoi4_incomplete):
    # Truncated stream decodes identically to the reference's zero-fill loop
    # (reference: simple_test.cpp:316-322).
    want = oracle.decode(qoi3_incomplete, DESC3, Channels.RGB)
    got = dec_ops.decode_single(qoi3_incomplete, DESC3, Channels.RGB)
    assert np.array_equal(got, want)
    want4 = oracle.decode(qoi4_incomplete, DESC4, Channels.RGBA)
    got4 = dec_ops.decode_single(qoi4_incomplete, DESC4, Channels.RGBA)
    assert np.array_equal(got4, want4)


@pytest.mark.parametrize("ch", [Channels.RGB, Channels.RGBA])
@pytest.mark.parametrize("seed", [0, 1])
def test_low_entropy_roundtrip(ch, seed):
    rng = np.random.default_rng(seed)
    desc = Desc(41, 19, ch)
    raw = (rng.integers(0, 4, 41 * 19 * int(ch)) * 9).astype(np.uint8)
    check_roundtrip(raw, desc)


def test_high_entropy_roundtrip():
    rng = np.random.default_rng(5)
    desc = Desc(64, 48, Channels.RGBA)
    raw = rng.integers(0, 256, 64 * 48 * 4).astype(np.uint8)
    check_roundtrip(raw, desc)


def test_runs_and_index_heavy():
    # Long runs (multi-62) and palette reuse -> RUN + INDEX chains cross
    # tile boundaries in the speculative replay.
    desc = Desc(500, 4, Channels.RGB)
    palette = np.array([[1, 2, 3], [9, 9, 9], [1, 2, 3], [30, 60, 90]], np.uint8)
    ids = np.zeros(2000, np.int64)
    ids[100:800] = 1  # 700-pixel run
    ids[800:] = np.arange(1200) % 4
    raw = palette[ids]
    check_roundtrip(raw.reshape(-1), desc)


def test_many_tiles_fixpoint():
    # Large image with stale index slots: INDEX ops referring to pixels many
    # tiles back force multiple reconciliation rounds.
    rng = np.random.default_rng(11)
    w, h = 512, 64
    n = w * h
    base = rng.integers(0, 256, (64, 3)).astype(np.uint8)
    ids = rng.integers(0, 64, n)
    # long stretches of a single color, then references to early colors
    ids[: n // 2] = rng.integers(0, 4, n // 2)
    raw = base[ids]
    check_roundtrip(raw.reshape(-1), Desc(w, h, Channels.RGB))


@pytest.mark.parametrize("n", [1, 2, 63, 64, 127, 1000])
def test_odd_sizes(n):
    rng = np.random.default_rng(n)
    desc = Desc(n, 1, Channels.RGBA)
    raw = (rng.integers(0, 5, n * 4) * 17).astype(np.uint8)
    check_roundtrip(raw, desc)


def test_crafted_index_seed_slot():
    # A stream whose first chunk is OP_INDEX 53 must yield the seeded start
    # pixel (decoder seeds seen[hash(start)] pre-loop — simple.cpp:108).
    from qoipp_tpu.common import write_header, END_MARKER

    desc = Desc(2, 1, Channels.RGBA)
    stream = np.frombuffer(
        write_header(desc) + bytes([0x00 | 53, 0x00 | 53]) + END_MARKER, np.uint8
    )
    want = oracle.decode(stream, desc, Channels.RGBA)
    got = dec_ops.decode_single(stream, desc, Channels.RGBA)
    assert np.array_equal(got, want)
    assert got.reshape(-1, 4)[0].tolist() == [0, 0, 0, 255]


def test_run_clamped_at_end():
    # Stream owing more RUN pixels than the image holds: clamped
    # (reference: simple.cpp:156-163).
    from qoipp_tpu.common import write_header, END_MARKER

    desc = Desc(3, 1, Channels.RGB)
    stream = np.frombuffer(
        write_header(desc) + bytes([0xFE, 7, 8, 9, 0xC0 | 61]) + END_MARKER,
        np.uint8,
    )
    want = oracle.decode(stream, desc, Channels.RGB)
    got = dec_ops.decode_single(stream, desc, Channels.RGB)
    assert np.array_equal(got, want)
