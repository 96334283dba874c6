"""Edge-path coverage: pipeline target conversion, device-stream target
channels, jax-backend buffer semantics, colorspace propagation."""

import numpy as np
import pytest

import qoipp_tpu as q
from qoipp_tpu import oracle


def make(desc, seed=0):
    rng = np.random.default_rng(seed)
    n = desc.width * desc.height
    pal = rng.integers(0, 256, (5, int(desc.channels))).astype(np.uint8)
    raw = pal[rng.integers(0, 5, n)].reshape(-1)
    blob, _ = oracle.encode(raw, desc)
    return raw, blob


def test_pipeline_target_conversion():
    import jax.numpy as jnp

    desc = q.Desc(48, 24, q.Channels.RGB)
    raw, blob = make(desc)
    pipe = q.BatchPipeline(desc)
    streams, sizes = pipe.pack_streams([blob, blob])
    rgba = np.asarray(
        pipe.decode(jnp.asarray(streams), jnp.asarray(sizes), target=q.Channels.RGBA)
    )
    assert rgba.shape == (2, 24, 48, 4)
    assert np.array_equal(rgba[0, :, :, :3].reshape(-1), raw)
    assert np.all(rgba[:, :, :, 3] == 255)


def test_device_stream_rgba_to_rgb():
    from qoipp_tpu.ops.device_stream import DeviceStreamDecoder

    desc = q.Desc(32, 16, q.Channels.RGBA)
    raw, blob = make(desc, seed=1)
    dec = DeviceStreamDecoder(window_cap=256)
    d = dec.initialize(blob[:14], target=q.Channels.RGB).value()
    assert d.channels == q.Channels.RGB
    got = dec.decode_window(blob[14:-8]).value()
    assert np.array_equal(got, raw.reshape(-1, 4)[:, :3].reshape(-1))


def test_jax_backend_encode_into_buffer():
    desc = q.Desc(40, 20, q.Channels.RGB)
    raw, blob = make(desc, seed=2)
    buf = np.zeros(q.worst_size(desc).value(), np.uint8)
    st = q.encode_into(buf, raw, desc, backend="jax").value()
    assert st.complete and st.written == blob.size
    assert np.array_equal(buf[: st.written], blob)
    # insufficient buffer falls back to the oracle's partial semantics
    small = np.zeros(blob.size - 10, np.uint8)
    st2 = q.encode_into(small, raw, desc, backend="jax").value()
    assert not st2.complete
    assert np.array_equal(small[: st2.written], blob[: st2.written])


def test_colorspace_roundtrip():
    desc = q.Desc(8, 8, q.Channels.RGB, q.Colorspace.LINEAR)
    raw, blob = make(desc, seed=3)
    assert blob[13] == 1  # colorspace byte preserved
    img = q.decode(blob).value()
    assert img.desc.colorspace == q.Colorspace.LINEAR
    # colorspace must not affect encoded chunk bytes (common.hpp:48-53)
    desc_srgb = desc.replace(colorspace=q.Colorspace.SRGB)
    blob2, _ = oracle.encode(raw, desc_srgb)
    assert np.array_equal(blob[14:], blob2[14:])


def test_single_pixel_image():
    for ch in (q.Channels.RGB, q.Channels.RGBA):
        desc = q.Desc(1, 1, ch)
        raw = np.array([7, 8, 9, 200][: int(ch)], np.uint8)
        blob = q.encode(raw, desc, backend="jax").value()
        want, _ = oracle.encode(raw, desc)
        assert np.array_equal(blob, want)
        img = q.decode(blob, backend="jax").value()
        assert np.array_equal(img.data, raw)


def test_max_run_image():
    # image that is exactly one maximal run after the first pixel
    desc = q.Desc(63, 1, q.Channels.RGBA)
    raw = np.tile(np.array([1, 2, 3, 4], np.uint8), 63)
    blob = q.encode(raw, desc, backend="jax").value()
    want, _ = oracle.encode(raw, desc)
    assert np.array_equal(blob, want)
    img = q.decode(blob, backend="jax").value()
    assert np.array_equal(img.data, raw)


def test_decode_into_larger_buffer_tail_untouched():
    desc = q.Desc(16, 8, q.Channels.RGB)
    raw, blob = make(desc, seed=4)
    buf = np.full(raw.size + 50, 0xAB, np.uint8)
    d = q.decode_into(buf, blob).value()
    assert d.channels == q.Channels.RGB
    assert np.array_equal(buf[: raw.size], raw)
    assert np.all(buf[raw.size :] == 0xAB)  # past-the-end untouched
