"""Hypothesis structured/stateful differential fuzzing.

The reference runs coverage-guided libFuzzer+ASan over decode, encode and
the stream codecs (example/source/99_fuzz.cpp:95-169, example/
CMakeLists.txt:70-74).  Atheris isn't available in this image; the analog
here is hypothesis's structured generation + shrinking: streams are built
from a grammar of QOI ops (runs at the 62-flush boundary, INDEX on
written/unwritten slots, DIFF/LUMA wraparound edges), images from a
grammar of pixel moves (repeats, deltas, back-references), and the stream
codecs are driven by stateful rule machines with arbitrary buffer
schedules.  Every check is differential against the native oracle, which
is itself golden-tested (tests/test_oracle.py) against the reference's
committed fixtures.

Example budget: QOIPP_FUZZ_EXAMPLES (default 25 — a fast CI smoke slice;
crank it for a long fuzz session, e.g. 2000 ~= 30 min).
"""

import os

import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
)

import qoipp_tpu as q
from qoipp_tpu import oracle
from qoipp_tpu.ops import decode as dec_ops

MAX_EXAMPLES = int(os.environ.get("QOIPP_FUZZ_EXAMPLES", "25"))
SETTINGS = settings(
    max_examples=MAX_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

# Fixed descs keep the JAX compile count bounded (each (qb, n_cap) bucket
# is one XLA program); content, not geometry, is what the grammar varies.
DESCS = [
    q.Desc(8, 8, q.Channels.RGB),
    q.Desc(16, 4, q.Channels.RGBA),
    q.Desc(24, 14, q.Channels.RGBA),
]


# ---------------------------------------------------------------------------
# Chunk-stream grammar (decoder-side fuzzing)
# ---------------------------------------------------------------------------

_byte = st.integers(0, 255)

_chunk = st.one_of(
    st.tuples(st.just("RGB"), _byte, _byte, _byte),
    st.tuples(st.just("RGBA"), _byte, _byte, _byte, _byte),
    # run lengths clustered on the flush boundary 62 and its neighbors
    st.tuples(
        st.just("RUN"),
        st.one_of(st.sampled_from([1, 2, 61, 62]), st.integers(1, 62)),
    ),
    st.tuples(st.just("INDEX"), st.integers(0, 63)),
    st.tuples(st.just("DIFF"), st.integers(0, 63)),
    st.tuples(st.just("LUMA"), st.integers(0, 63), _byte),
)


def _serialize(ops) -> bytes:
    out = bytearray()
    for op in ops:
        tag = op[0]
        if tag == "RGB":
            out += bytes([0xFE, op[1], op[2], op[3]])
        elif tag == "RGBA":
            out += bytes([0xFF, op[1], op[2], op[3], op[4]])
        elif tag == "RUN":
            out.append(0xC0 | (op[1] - 1))
        elif tag == "INDEX":
            out.append(op[1])
        elif tag == "DIFF":
            out.append(0x40 | op[1])
        else:  # LUMA
            out += bytes([0x80 | op[1], op[2]])
    return bytes(out)


@SETTINGS
@given(
    di=st.integers(0, len(DESCS) - 1),
    ops=st.lists(_chunk, max_size=200),
    cut=st.one_of(st.none(), st.integers(0, 1000)),
)
def test_structured_stream_differential(di, ops, cut):
    """Grammar-built chunk streams (incl. truncated ones) decode
    identically on the oracle and the kernel pipeline."""
    desc = DESCS[di]
    body = _serialize(ops)
    stream = q.write_header(desc) + body + q.END_MARKER
    if cut is not None:
        stream = stream[: 14 + min(cut, len(stream) - 14)]
    blob = np.frombuffer(stream, np.uint8)
    want = oracle.decode(blob, desc, desc.channels)
    got = dec_ops.decode_single(blob, desc, desc.channels)
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# Image grammar (encoder-side fuzzing): moves designed to walk the encoder
# op-precedence lattice (RUN > INDEX > DIFF > LUMA > RGB/RGBA) and the
# int8-wraparound LUMA narrowing (SURVEY.md §0).
# ---------------------------------------------------------------------------

_signed_small = st.sampled_from([-9, -8, -3, -2, -1, 0, 1, 2, 3, 7, 8, 32, 128])

_move = st.one_of(
    st.tuples(st.just("repeat"), st.sampled_from([1, 2, 61, 62, 63, 124])),
    st.tuples(st.just("delta"), _signed_small, _signed_small, _signed_small),
    st.tuples(st.just("back"), st.integers(1, 70)),
    st.tuples(st.just("new"), _byte, _byte, _byte, _byte),
    st.tuples(st.just("alpha"), _byte),
)


def _build_image(moves, n_px: int, channels: int) -> np.ndarray:
    px = np.array([0, 0, 0, 255], np.int64)
    hist = []
    out = []
    mi = 0
    while len(out) < n_px:
        mv = moves[mi % len(moves)] if moves else ("repeat", 62)
        mi += 1
        if mv[0] == "repeat":
            out.extend([px.copy()] * mv[1])
        elif mv[0] == "delta":
            px[:3] = (px[:3] + mv[1:4]) % 256
            out.append(px.copy())
        elif mv[0] == "back":
            if hist:
                px = hist[-min(mv[1], len(hist))].copy()
            out.append(px.copy())
        elif mv[0] == "new":
            px = np.array(mv[1:5], np.int64)
            out.append(px.copy())
        else:  # alpha
            px[3] = mv[1]
            out.append(px.copy())
        hist.append(px.copy())
    arr = np.array(out[:n_px], np.uint8)
    return arr[:, :channels].reshape(-1)


@SETTINGS
@given(di=st.integers(0, len(DESCS) - 1), moves=st.lists(_move, max_size=60))
def test_structured_image_encode_differential(di, moves):
    """Grammar-built images encode identically on the device path and the
    oracle (op precedence + LUMA narrowing corners)."""
    desc = DESCS[di]
    raw = _build_image(moves, desc.width * desc.height, int(desc.channels))
    want, complete = oracle.encode(raw, desc)
    assert complete
    got = q.encode(raw, desc, backend="jax").value()
    assert np.array_equal(np.asarray(got), want)


# ---------------------------------------------------------------------------
# Stateful stream-codec machines (buffer-schedule fuzzing)
# ---------------------------------------------------------------------------


class StreamEncoderMachine(RuleBasedStateMachine):
    """Feed pixel slices through StreamEncoder under arbitrary output
    buffer sizes; at finalize the concatenated output must equal the
    oracle's one-shot encoding of everything consumed."""

    @initialize(di=st.integers(0, len(DESCS) - 1))
    def start(self, di):
        self.desc = DESCS[di]
        self.ch = int(self.desc.channels)
        self.n_px = self.desc.width * self.desc.height
        self.enc = q.StreamEncoder()
        out = np.zeros(64, np.uint8)
        n = self.enc.initialize(out, self.desc).value()
        self.out_parts = bytearray(out[:n].tobytes())
        self.fed = bytearray()
        self.consumed = 0

    @precondition(lambda self: self.consumed < self.n_px * self.ch)
    @rule(
        moves=st.lists(_move, min_size=1, max_size=8),
        npx=st.integers(1, 64),
        buf=st.integers(5, 257),
    )
    def feed(self, moves, npx, buf):
        want = min(npx * self.ch, self.n_px * self.ch - self.consumed)
        raw = _build_image(moves, -(-want // self.ch), self.ch)[:want]
        self.fed += raw.tobytes()
        out = np.zeros(buf, np.uint8)
        data = np.frombuffer(bytes(self.fed[self.consumed:]), np.uint8)
        r = self.enc.encode(out, data).value()
        self.out_parts += out[: r.written].tobytes()
        self.consumed += r.processed

    @rule()
    def accessors(self):
        # always-available (keeps hypothesis from deadlocking once the
        # stream is full) and exercises the accessor surface
        assert self.enc.is_initialized()
        assert int(self.enc.channels()) == self.ch

    @invariant()
    def whole_pixels(self):
        if hasattr(self, "consumed"):
            assert self.consumed % self.ch == 0  # qoi_ref.cpp:357 analog

    def teardown(self):
        if not hasattr(self, "consumed"):
            return
        # drain whatever is still unconsumed, then finalize
        guard = 0
        while self.consumed < len(self.fed):
            out = np.zeros(512, np.uint8)
            data = np.frombuffer(bytes(self.fed[self.consumed:]), np.uint8)
            r = self.enc.encode(out, data).value()
            self.out_parts += out[: r.written].tobytes()
            self.consumed += r.processed
            guard += 1
            assert guard < 10_000
        fin = np.zeros(16, np.uint8)
        n = self.enc.finalize(fin).value()
        self.out_parts += fin[:n].tobytes()
        n_fed = len(self.fed) // self.ch
        desc = q.Desc(n_fed or 1, 1, q.Channels(self.ch))
        raw = np.frombuffer(bytes(self.fed), np.uint8)
        if n_fed:
            want, complete = oracle.encode(raw, desc)
            assert complete
            got = np.frombuffer(bytes(self.out_parts), np.uint8)
            # headers differ (desc geometry unknown to the stream user);
            # compare chunk payload + end marker
            assert np.array_equal(got[14:], want[14:])


class StreamDecoderMachine(RuleBasedStateMachine):
    """Drive StreamDecoder with arbitrary input/output buffer schedules;
    the pixels produced must prefix-match the oracle's one-shot decode."""

    @initialize(
        di=st.integers(0, len(DESCS) - 1),
        moves=st.lists(_move, max_size=20),
    )
    def start(self, di, moves):
        self.desc = DESCS[di]
        self.ch = int(self.desc.channels)
        raw = _build_image(moves, self.desc.width * self.desc.height, self.ch)
        self.blob, _ = oracle.encode(raw, self.desc)
        self.want = raw.tobytes()
        self.dec = q.StreamDecoder()
        got = self.dec.initialize(self.blob[:14]).value()
        assert (got.width, got.height) == (self.desc.width, self.desc.height)
        self.pos = 14
        self.out = bytearray()

    @precondition(lambda self: self.pos < self.blob.size - 8)
    @rule(inn=st.integers(1, 300), buf=st.integers(4, 513))
    def step(self, inn, buf):
        end = min(self.pos + inn, self.blob.size - 8)
        out = np.zeros(buf, np.uint8)
        r = self.dec.decode(out, self.blob[self.pos:end]).value()
        self.out += out[: r.written].tobytes()
        self.pos += r.processed

    @precondition(lambda self: getattr(self, "dec", None) and self.dec.has_run_count())
    @rule(buf=st.integers(4, 257))
    def drain(self, buf):
        out = np.zeros(buf, np.uint8)
        n = self.dec.drain_run(out).value()
        self.out += out[:n].tobytes()

    @rule()
    def accessors(self):
        assert self.dec.is_initialized()
        # channels() reports the *target* until decode finishes — the
        # reference's quirk (stream.cpp:302-304) matched by stream.py
        assert self.dec.channels() is not None

    @invariant()
    def prefix_matches(self):
        if hasattr(self, "out"):
            assert bytes(self.out) == self.want[: len(self.out)]


TestStreamEncoderFuzz = StreamEncoderMachine.TestCase
TestStreamEncoderFuzz.settings = SETTINGS
TestStreamDecoderFuzz = StreamDecoderMachine.TestCase
TestStreamDecoderFuzz.settings = SETTINGS
