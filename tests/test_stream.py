"""Streaming codec tests, mirroring the reference's stream_test buffer-size
sweep (test/source/stream_test.cpp:192-252): every chunk-boundary/rollback
edge case is brute-forced by driving the codecs with all buffer sizes."""

import numpy as np
import pytest

import qoipp_tpu as q

DESC3 = q.Desc(29, 17, q.Channels.RGB)
DESC4 = q.Desc(24, 14, q.Channels.RGBA)


def drive_encode(enc, raw, desc, buf_size):
    """Chunk-by-chunk encode driver (mirrors stream_test.cpp:43-80): a
    dedicated 14-byte header buffer, then input fed in out-buffer-sized
    slices (exercising whole-pixel truncation + re-feed)."""
    hdr = np.zeros(14, np.uint8)
    result = bytearray()
    n = enc.initialize(hdr, desc).value()
    assert n == 14
    result += hdr.tobytes()

    out = np.zeros(buf_size, np.uint8)
    consumed = 0
    raw = np.asarray(raw, np.uint8)
    while consumed < raw.size:
        chunk = raw[consumed : consumed + max(buf_size, int(desc.channels))]
        r = enc.encode(out, chunk).value()
        result += out[: r.written].tobytes()
        consumed += r.processed
    need = 8 + (1 if enc.has_run_count() else 0)
    fin = np.zeros(need, np.uint8)
    n = enc.finalize(fin).value()
    assert n == need
    result += fin[:n].tobytes()
    return np.frombuffer(bytes(result), np.uint8)


def drive_decode(dec, data, desc, buf_size, target=None):
    """Chunk-by-chunk decode driver (mirrors stream_test.cpp:82-123):
    input stops before the end marker, then pending runs are drained."""
    data = np.asarray(data, np.uint8)
    d = dec.initialize(data[:14], target).value()
    out = np.zeros(buf_size, np.uint8)
    result = bytearray()
    consumed = 14
    end = data.size - 8
    while consumed < end:
        chunk = data[consumed : consumed + buf_size]
        r = dec.decode(out, chunk).value()
        result += out[: r.written].tobytes()
        consumed += r.processed
        if r.processed == 0 and r.written == 0:
            break
    while dec.has_run_count():
        n = dec.drain_run(out).value()
        result += out[:n].tobytes()
    dec.reset()
    expected = d.width * d.height * int(d.channels)
    return d, np.frombuffer(bytes(result), np.uint8)[:expected]


# Exhaustive buffer-size sweep 5..1024 inclusive — EVERY size, like the
# reference (test/source/stream_test.cpp:192-252).  Banded into ranges of
# 64 sizes per pytest case so a failure localizes to a narrow band while
# the collected-case count stays sane (the codec is native-backed, so the
# full sweep costs seconds).
_BANDS = [
    (lo, min(lo + 64, 1025)) for lo in range(5, 1025, 64)
]


def _drive_decode_incomplete(dec, data, buf_size, target=None):
    """Reference incomplete-input driver (stream_test.cpp:243-252 via
    :81-123): feed the truncated stream minus the last 8 bytes (the
    driver always reserves end_marker_size), drain pending runs, return
    whatever was produced WITHOUT trimming to the full image size."""
    data = np.asarray(data, np.uint8)
    dec.initialize(data[:14], target).value()
    out = np.zeros(buf_size, np.uint8)
    result = bytearray()
    consumed = 14
    end = data.size - 8
    while consumed < end:
        chunk = data[consumed : consumed + buf_size]
        r = dec.decode(out, chunk).value()
        result += out[: r.written].tobytes()
        consumed += r.processed
        if r.processed == 0 and r.written == 0:
            break
    while dec.has_run_count():
        n = dec.drain_run(out).value()
        result += out[:n].tobytes()
    dec.reset()
    return np.frombuffer(bytes(result), np.uint8)


@pytest.mark.parametrize("band", _BANDS, ids=lambda b: f"{b[0]}-{b[1]-1}")
def test_encode_sweep_rgb(raw3, qoi3, band):
    enc = q.StreamEncoder()
    for buf_size in range(*band):
        got = drive_encode(enc, raw3, DESC3, buf_size)
        assert np.array_equal(got, qoi3), f"buf={buf_size}"


@pytest.mark.parametrize("band", _BANDS, ids=lambda b: f"{b[0]}-{b[1]-1}")
def test_encode_sweep_rgba(raw4, qoi4, band):
    enc = q.StreamEncoder()
    for buf_size in range(*band):
        got = drive_encode(enc, raw4, DESC4, buf_size)
        assert np.array_equal(got, qoi4), f"buf={buf_size}"


@pytest.mark.parametrize("band", _BANDS, ids=lambda b: f"{b[0]}-{b[1]-1}")
def test_decode_sweep_rgb(raw3, qoi3, band):
    dec = q.StreamDecoder()
    raw3_rgba = np.concatenate(
        [raw3.reshape(-1, 3),
         np.full((raw3.size // 3, 1), 255, np.uint8)], axis=1
    ).reshape(-1)
    for buf_size in range(*band):
        d, got = drive_decode(dec, qoi3, DESC3, buf_size)
        assert d == DESC3
        assert np.array_equal(got, raw3), f"buf={buf_size}"
        # target-conversion sweeps (stream_test.cpp:215-241)
        _, got_rgb = drive_decode(dec, qoi3, DESC3, buf_size,
                                  target=q.Channels.RGB)
        assert np.array_equal(got_rgb, raw3), f"buf={buf_size} ->RGB"
        _, got_rgba = drive_decode(dec, qoi3, DESC3, buf_size,
                                   target=q.Channels.RGBA)
        assert np.array_equal(got_rgba, raw3_rgba), f"buf={buf_size} ->RGBA"


@pytest.mark.parametrize("band", _BANDS, ids=lambda b: f"{b[0]}-{b[1]-1}")
def test_decode_sweep_rgba(raw4, qoi4, band):
    dec = q.StreamDecoder()
    raw4_rgb = np.ascontiguousarray(
        raw4.reshape(-1, 4)[:, :3]
    ).reshape(-1)
    for buf_size in range(*band):
        d, got = drive_decode(dec, qoi4, DESC4, buf_size)
        assert np.array_equal(got, raw4), f"buf={buf_size}"
        _, got_rgba = drive_decode(dec, qoi4, DESC4, buf_size,
                                   target=q.Channels.RGBA)
        assert np.array_equal(got_rgba, raw4), f"buf={buf_size} ->RGBA"
        _, got_rgb = drive_decode(dec, qoi4, DESC4, buf_size,
                                  target=q.Channels.RGB)
        assert np.array_equal(got_rgb, raw4_rgb), f"buf={buf_size} ->RGB"


@pytest.mark.parametrize("band", _BANDS, ids=lambda b: f"{b[0]}-{b[1]-1}")
def test_decode_sweep_incomplete_rgb(raw3, qoi3_incomplete, band):
    # incomplete input still decodes a strict prefix at EVERY buffer size
    # (stream_test.cpp:243-252)
    dec = q.StreamDecoder()
    for buf_size in range(*band):
        got = _drive_decode_incomplete(dec, qoi3_incomplete, buf_size)
        assert got.size < raw3.size, f"buf={buf_size}"
        assert np.array_equal(got, raw3[: got.size]), f"buf={buf_size}"


@pytest.mark.parametrize("band", _BANDS, ids=lambda b: f"{b[0]}-{b[1]-1}")
def test_decode_sweep_incomplete_rgba(raw4, qoi4_incomplete, band):
    dec = q.StreamDecoder()
    for buf_size in range(*band):
        got = _drive_decode_incomplete(dec, qoi4_incomplete, buf_size)
        assert got.size < raw4.size, f"buf={buf_size}"
        assert np.array_equal(got, raw4[: got.size]), f"buf={buf_size}"


def test_decoder_reuse_across_images(qoi3, raw3, qoi4, raw4):
    # One instance reused across images (stream_test.cpp:189-190).
    dec = q.StreamDecoder()
    for data, desc, raw in [(qoi3, DESC3, raw3), (qoi4, DESC4, raw4)] * 2:
        _, got = drive_decode(dec, data, desc, 57)
        assert np.array_equal(got, raw)


def test_encoder_reuse(raw3, qoi3):
    enc = q.StreamEncoder()
    for _ in range(3):
        got = drive_encode(enc, raw3, DESC3, 41)
        assert np.array_equal(got, qoi3)


def test_decode_target_conversion(qoi3, raw3):
    dec = q.StreamDecoder()
    d, got = drive_decode(dec, qoi3, DESC3, 100, target=q.Channels.RGBA)
    assert d.channels == q.Channels.RGBA
    px = got.reshape(-1, 4)
    assert np.array_equal(px[:, :3].reshape(-1), raw3)
    assert np.all(px[:, 3] == 255)


def test_encoder_errors(raw3):
    enc = q.StreamEncoder()
    out = np.zeros(100, np.uint8)
    assert enc.encode(out, raw3).error() == q.Error.NOT_INITIALIZED
    assert enc.finalize(out).error() == q.Error.NOT_INITIALIZED
    assert enc.initialize(np.zeros(0, np.uint8), DESC3).error() == q.Error.EMPTY
    assert enc.initialize(np.zeros(13, np.uint8), DESC3).error() == q.Error.TOO_SHORT
    assert enc.initialize(out, DESC3).value() == 14
    assert enc.initialize(out, DESC3).error() == q.Error.ALREADY_INITIALIZED
    assert enc.encode(np.zeros(4, np.uint8), raw3).error() == q.Error.TOO_SHORT
    assert enc.encode(out, b"").error() == q.Error.EMPTY
    enc.reset()
    assert not enc.is_initialized()


def test_decoder_errors(qoi3):
    dec = q.StreamDecoder()
    out = np.zeros(100, np.uint8)
    assert dec.decode(out, qoi3).error() == q.Error.NOT_INITIALIZED
    assert dec.drain_run(out).error() == q.Error.NOT_INITIALIZED
    assert dec.initialize(b"").error() == q.Error.EMPTY
    assert dec.initialize(b"qoif").error() == q.Error.TOO_SHORT
    assert dec.initialize(b"nope" * 4).error() == q.Error.NOT_QOI
    assert dec.initialize(qoi3[:14]).value() == DESC3
    assert dec.initialize(qoi3[:14]).error() == q.Error.ALREADY_INITIALIZED
    assert dec.decode(np.zeros(2, np.uint8), qoi3[14:]).error() == q.Error.TOO_SHORT
    dec.reset()
    assert not dec.is_initialized()


def test_stream_roundtrip_random_sizes():
    rng = np.random.default_rng(42)
    for trial in range(3):
        w, h = int(rng.integers(10, 80)), int(rng.integers(10, 60))
        ch = q.Channels.RGBA if trial % 2 else q.Channels.RGB
        desc = q.Desc(w, h, ch)
        raw = (rng.integers(0, 6, w * h * int(ch)) * 13).astype(np.uint8)
        want, _ = __import__("qoipp_tpu.oracle", fromlist=["x"]).encode(raw, desc)

        enc_buf = int(rng.integers(5, 200))
        dec_buf = int(rng.integers(int(ch), 200))
        enc = q.StreamEncoder()
        got_enc = drive_encode(enc, raw, desc, enc_buf)
        assert np.array_equal(got_enc, want)

        dec = q.StreamDecoder()
        _, got_dec = drive_decode(dec, got_enc, desc, dec_buf)
        assert np.array_equal(got_dec, raw)


def test_pending_run_across_calls():
    # A long trailing run must persist in state after input is exhausted
    # and be emitted via drain_run (stream.hpp:179-194).
    desc = q.Desc(63, 1, q.Channels.RGB)
    raw = np.full(189, 9, np.uint8)
    raw[:3] = (1, 2, 3)
    from qoipp_tpu import oracle

    enc, _ = oracle.encode(raw, desc)
    dec = q.StreamDecoder()
    dec.initialize(enc[:14]).value()
    out = np.zeros(30, np.uint8)  # 10 pixels per call
    result = bytearray()
    consumed = 14
    end = enc.size - 8  # stop before the end marker, like the reference driver
    while consumed < end:
        r = dec.decode(out, enc[consumed:end]).value()
        result += out[: r.written].tobytes()
        consumed += r.processed
        if r.processed == 0 and r.written == 0:
            break
    assert dec.has_run_count()
    while dec.has_run_count():
        n = dec.drain_run(out).value()
        result += out[:n].tobytes()
    got = np.frombuffer(bytes(result), np.uint8)[:189]
    assert np.array_equal(got, raw)
