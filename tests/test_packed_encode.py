"""Encode-side stream packing: exactness across in-lane stream boundaries.

Differential vs the native oracle (reference semantics:
source/simple.cpp:36-95).  The packed encoder concatenates whole raw
images into pixel lanes with segment resets; the crafted cases pin the
three carried-state resets (prev pixel, run counter, 64-entry table) at
stream seams, plus the tail-slot trailing-run/end-marker protocol.
"""

import numpy as np
import pytest

from qoipp_tpu import Channels, Desc, oracle
from qoipp_tpu.models.packed import PackedEncoder


def _check(cases, lane_px=4096):
    enc = PackedEncoder(lane_px=lane_px)
    got = enc.encode([r for r, _ in cases], [d for _, d in cases])
    for i, (raw, desc) in enumerate(cases):
        ref, complete = oracle.encode(raw, desc)
        assert complete
        assert got[i].size == ref.size, (
            f"case {i} ({desc.width}x{desc.height}x{int(desc.channels)}): "
            f"length {got[i].size} != {ref.size}"
        )
        assert (got[i] == ref).all(), f"case {i}: byte mismatch"


def test_mixed_corpus_parity():
    rng = np.random.default_rng(7)
    cases = []
    for k in range(20):
        w = 5 + 7 * (k % 5)
        h = 3 + k % 4
        ch = Channels.RGBA if k % 3 else Channels.RGB
        d = Desc(w, h, ch)
        n = w * h * int(ch)
        kind = k % 4
        if kind == 0:
            raw = rng.integers(0, 256, n, np.uint8)
        elif kind == 1:  # palette -> INDEX-heavy
            pal = rng.integers(0, 256, (5, int(ch)), np.uint8)
            raw = pal[rng.integers(0, 5, w * h)].reshape(-1)
        elif kind == 2:  # flat -> RUN-heavy
            raw = np.full(n, (k * 37) % 256, np.uint8)
        else:  # gradient -> DIFF/LUMA
            x = (np.arange(w * h) // 3) % 256
            raw = np.stack([x] * int(ch), 1).astype(np.uint8).reshape(-1)
        cases.append((raw, d))
    _check(cases)


def test_seam_prev_pixel_reset():
    """Stream B's first pixel equals stream A's LAST pixel: without the
    prev reset, B would open with a bogus RUN instead of a literal op."""
    a_last = np.array([9, 8, 7], np.uint8)
    da = Desc(4, 1, Channels.RGB)
    raw_a = np.concatenate([np.array([1, 2, 3] * 3, np.uint8), a_last])
    db = Desc(3, 1, Channels.RGB)
    raw_b = np.concatenate([a_last, np.array([5, 5, 5, 6, 6, 6], np.uint8)])
    _check([(raw_a, da), (raw_b, db)])


def test_seam_table_reset():
    """Stream B repeats stream A's palette: with a leaked table, B's first
    occurrences would emit INDEX where the reference emits literals."""
    rng = np.random.default_rng(3)
    pal = rng.integers(1, 256, (4, 3), np.uint8)
    d = Desc(30, 2, Channels.RGB)
    raw = pal[rng.integers(0, 4, 60)].reshape(-1)
    _check([(raw.copy(), d), (raw.copy(), d), (raw.copy(), d)])


def test_seam_zero_pixel_fresh_table():
    """Pixel (0,0,0,0) INDEX-hits a FRESH zero table (slot 0 reads packed
    0).  Stream B opening with it must hit, even though stream A just
    overwrote slot 0 with something else."""
    # slot 0 occupant for A: find a pixel hashing to 0 that isn't zero
    # hash = (3r+5g+7b+11a) % 64; r=64 g=b=a=0 -> 192 % 64 = 0
    da = Desc(2, 1, Channels.RGBA)
    raw_a = np.array([64, 0, 0, 0, 1, 2, 3, 4], np.uint8)
    db = Desc(3, 1, Channels.RGBA)
    raw_b = np.array([0, 0, 0, 0, 7, 7, 7, 7, 1, 1, 1, 1], np.uint8)
    _check([(raw_a, da), (raw_b, db)])


def test_run_lengths_and_flushes():
    """Runs of 61/62/63/124/125 px at stream heads and tails, incl.
    all-run streams whose only chunks are 62-flush rows."""
    cases = []
    for n in (1, 2, 61, 62, 63, 124, 125, 200):
        d = Desc(n, 1, Channels.RGB)
        cases.append((np.zeros(3 * n, np.uint8), d))  # head run == START
        d2 = Desc(n, 2, Channels.RGB)
        raw = np.zeros((2 * n, 3), np.uint8)
        raw[:n] = [3, 1, 4]  # noise-ish head, then a run to the end
        cases.append((raw.reshape(-1).copy(), d2))
    _check(cases)


def test_single_pixel_streams():
    cases = []
    for px in ([0, 0, 0], [1, 2, 3], [255, 255, 255]):
        cases.append((np.array(px, np.uint8), Desc(1, 1, Channels.RGB)))
    cases.append((np.array([0, 0, 0, 255], np.uint8), Desc(1, 1, Channels.RGBA)))
    cases.append((np.array([0, 0, 0, 0], np.uint8), Desc(1, 1, Channels.RGBA)))
    _check(cases)


def test_alpha_seams():
    """RGBA streams where alpha changes at the seam vs within: the RGBA-op
    gate must compare against the reset prev (a=255), not the neighbor."""
    da = Desc(3, 1, Channels.RGBA)
    raw_a = np.array([10, 20, 30, 7, 10, 20, 30, 7, 1, 1, 1, 7], np.uint8)
    db = Desc(2, 1, Channels.RGBA)
    # first pixel keeps a=255 (no RGBA op despite A ending at a=7)
    raw_b = np.array([9, 9, 9, 255, 2, 2, 2, 9], np.uint8)
    _check([(raw_a, da), (raw_b, db)])


def test_many_streams_multi_lane():
    """More streams than fit one lane; verify lane planning + per-stream
    slicing end-to-end, mixed channels."""
    rng = np.random.default_rng(17)
    cases = []
    for k in range(60):
        ch = Channels.RGBA if k % 2 else Channels.RGB
        w = 4 + k % 9
        h = 2 + k % 5
        raw = rng.integers(0, 256, w * h * int(ch), np.uint8)
        cases.append((raw, Desc(w, h, ch)))
    _check(cases, lane_px=2048)


def test_oversized_stream_raises():
    enc = PackedEncoder(lane_px=2048)
    d = Desc(64, 64, Channels.RGB)  # 4096 px > 2046
    with pytest.raises(ValueError, match="lane capacity"):
        enc.encode([np.zeros(64 * 64 * 3, np.uint8)], [d])


def test_randomized_differential():
    rng = np.random.default_rng(23)
    for trial in range(4):
        cases = []
        for _ in range(rng.integers(3, 12)):
            ch = Channels.RGBA if rng.integers(0, 2) else Channels.RGB
            w = int(rng.integers(1, 40))
            h = int(rng.integers(1, 12))
            n = w * h
            style = rng.integers(0, 4)
            if style == 0:
                raw = rng.integers(0, 256, n * int(ch), np.uint8)
            elif style == 1:
                pal = rng.integers(0, 256, (3, int(ch)), np.uint8)
                raw = pal[rng.integers(0, 3, n)].reshape(-1)
            elif style == 2:
                raw = np.zeros(n * int(ch), np.uint8)
            else:
                base = rng.integers(0, 256, int(ch), np.uint8)
                raw = np.tile(base, n)
                mut = rng.integers(0, raw.size, max(1, n // 8))
                raw[mut] = rng.integers(0, 256, mut.size)
            cases.append((raw, Desc(w, h, ch)))
        _check(cases)
