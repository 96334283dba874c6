"""Differential tests: the Pallas fields kernel vs the XLA field pass.

The kernel (ops/fields_kernel.py) must reproduce ops/encode._encode_fields
bit-for-bit (packed through _pack_template_planes) on every content class
that stresses the carried state: runs crossing block boundaries and the
62-flush, INDEX hits referring to pixels in earlier blocks, DIFF/LUMA
wraparound edges, alpha variation, and partial final blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qoipp_tpu.ops import encode as enc_ops

import importlib.util as _ilu
import pathlib as _pl

_spec = _ilu.spec_from_file_location(
    "fields_kernel", _pl.Path(__file__).parent / "fields_kernel.py"
)
fk = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(fk)
from qoipp_tpu.ops.bitops import pixels_to_packed

NB = 3 * fk.BLK  # 3 blocks


def xla_reference(packed, n_px, channels):
    template, nbytes, tail, has_trail = jax.vmap(
        lambda p: enc_ops._encode_fields(p, jnp.int32(n_px), channels)
    )(packed)
    tlo, thn = enc_ops._pack_template_planes(template, nbytes)
    # trailing run length per image from the tail bytes
    trail = np.where(
        np.asarray(has_trail), (np.asarray(tail)[:, 0] & 0x3F) + 1, 0
    )
    return np.asarray(tlo), np.asarray(thn), trail


def contents(rng, n_px, ch):
    out = []
    # pure noise (RGB/RGBA chunks, few runs)
    out.append(rng.integers(0, 256, (n_px, 4), np.uint8))
    # long runs incl. >62 and whole-block spans + palette (INDEX across blocks)
    palette = rng.integers(0, 256, (6, 4), np.uint8)
    px = np.zeros((n_px, 4), np.uint8)
    i = 0
    while i < n_px:
        if rng.random() < 0.5:
            ln = int(rng.integers(1, 3000))
            px[i : i + ln] = px[i - 1] if i else palette[0]
        else:
            px[i] = palette[rng.integers(0, 6)]
            ln = 1
        i += ln
    out.append(px)
    # smooth deltas (DIFF/LUMA) with wraparound edges
    base = np.array([250, 3, 128, 255], np.int64)
    steps = rng.integers(-2, 2, (n_px, 3))
    big = rng.random(n_px) < 0.02
    steps[big] = rng.integers(-30, 30, (int(big.sum()), 3))
    px = np.zeros((n_px, 4), np.uint8)
    cur = base.copy()
    for i in range(n_px):
        cur[:3] = (cur[:3] + steps[i]) % 256
        px[i] = cur
    out.append(px)
    # alpha variation
    px = out[2].copy()
    px[:, 3] = np.where(rng.random(n_px) < 0.05,
                        rng.integers(0, 256, n_px), 255).astype(np.uint8)
    out.append(px)
    # all-equal image (one giant run), and equal-to-start-pixel prefix
    px = np.tile(np.array([7, 7, 7, 255], np.uint8), (n_px, 1))
    out.append(px)
    px = np.tile(np.array([0, 0, 0, 255], np.uint8), (n_px, 1))
    px[n_px // 2 :] = [1, 2, 3, 255]
    out.append(px)
    return out


@pytest.mark.parametrize("channels", [3, 4])
@pytest.mark.parametrize("n_px", [NB, NB - 777, fk.BLK + 1])
def test_fields_kernel_differential(channels, n_px):
    rng = np.random.default_rng(n_px * channels)
    imgs = contents(rng, n_px, channels)
    if channels == 3:
        for im in imgs:
            im[:, 3] = 255
    packed = jnp.stack([
        jnp.pad(pixels_to_packed(jnp.asarray(im[:, :channels].reshape(-1)),
                                 channels), (0, NB - n_px))
        for im in imgs
    ])
    want_tlo, want_thn, want_trail = xla_reference(packed, n_px, channels)
    got_tlo, got_thn, run_out = fk.encode_fields_planes(
        packed, jnp.int32(n_px), channels
    )
    got_tlo, got_thn = np.asarray(got_tlo), np.asarray(got_thn)
    valid = np.arange(NB) < n_px
    for b in range(len(imgs)):
        assert np.array_equal(got_tlo[b][valid], want_tlo[b][valid]), f"img {b} tlo"
        assert np.array_equal(got_thn[b][valid], want_thn[b][valid]), f"img {b} thn"
    # outgoing run of the block holding pixel n_px-1 == the stream's
    # trailing run count
    blk = (n_px - 1) // fk.BLK
    got_trail = np.asarray(run_out)[:, blk]
    assert np.array_equal(got_trail, want_trail)
