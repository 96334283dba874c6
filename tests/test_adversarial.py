"""Adversarial / crafted-stream decode parity.

A conforming encoder can never emit OP_INDEX against a never-written slot,
but the decoder must still match the reference byte-for-byte on such
streams (the INDEX write-back then mutates slot hash(read_value), which
the replay kernel models literally — ops/replay_kernel.py docstring T1
discussion in examples/wave_engine.py)."""

import numpy as np
import pytest

from qoipp_tpu import Channels, Desc, END_MARKER, oracle, write_header
from qoipp_tpu.ops import decode as dec_ops


def check(desc, body: bytes):
    stream = np.frombuffer(write_header(desc) + body + END_MARKER, np.uint8)
    want = oracle.decode(stream, desc, desc.channels)
    got = dec_ops.decode_single(stream, desc, desc.channels)
    assert np.array_equal(got, want)


def test_index_unwritten_slot_then_reuse():
    # INDEX on unwritten slot 7 reads zeros and writes them to slot 0
    # (hash(0,0,0,0) = 0), clobbering whatever lived there.
    desc = Desc(6, 1, Channels.RGBA)
    body = bytes(
        [0xFF, 64, 0, 0, 0]  # RGBA (64,0,0,0) -> hash 0 -> slot 0
        + [0x00 | 7]         # INDEX 7 (unwritten) -> zeros; writes slot 0!
        + [0x00 | 0]         # INDEX 0 -> now zeros, NOT (64,0,0,0)
        + [0xFF, 64, 0, 0, 0]
        + [0x00 | 0]
        + [0x00 | 7]
    )
    check(desc, body)


def test_index_chain_through_unwritten_slots():
    desc = Desc(8, 1, Channels.RGB)
    body = bytes([0x00 | s for s in (5, 12, 63, 53, 0, 5, 12, 63)])
    check(desc, body)


def test_diff_luma_off_unwritten_index():
    desc = Desc(5, 1, Channels.RGB)
    body = bytes(
        [0x00 | 9]                  # zeros from unwritten slot 9
        + [0x40 | 0b111111]         # DIFF +1,+1,+1
        + [0x80 | 63, 0xFF]         # LUMA extremes (wraparound)
        + [0x40 | 0]                # DIFF -2,-2,-2 (wrap under 0)
        + [0xC0 | 0]                # RUN 1
    )
    check(desc, body)


def test_run_spam_overproduce():
    # more RUN pixels than the image holds: reference clamps per-chunk
    desc = Desc(10, 1, Channels.RGB)
    body = bytes([0xFE, 1, 2, 3] + [0xC0 | 61] * 4)
    check(desc, body)


def test_rgba_tags_in_rgb_stream():
    # channels=3 header but RGBA ops in the stream: decode is tag-driven
    desc = Desc(4, 1, Channels.RGB)
    body = bytes([0xFF, 10, 20, 30, 99] + [0x40 | 0b101010] + [0xC0 | 1])
    check(desc, body)
    # ... and converting that stream to RGBA must surface the alpha
    stream = np.frombuffer(write_header(desc) + body + END_MARKER, np.uint8)
    want = oracle.decode(stream, desc, Channels.RGBA)
    got = dec_ops.decode_single(stream, desc, Channels.RGBA)
    assert np.array_equal(got, want)
    assert got.reshape(-1, 4)[0, 3] == 99


def test_garbage_payload_fuzz_mini():
    rng = np.random.default_rng(99)
    for trial in range(8):
        w = int(rng.integers(1, 24))
        h = int(rng.integers(1, 24))
        ch = Channels.RGBA if trial % 2 else Channels.RGB
        desc = Desc(w, h, ch)
        body = bytes(rng.integers(0, 256, int(rng.integers(0, 4 * w * h + 20)),
                                  dtype=np.uint8))
        check(desc, body)
