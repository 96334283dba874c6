"""The alternative decode engines (scan fixpoint; the Jacobi wave solve,
retired to examples/wave_engine.py) must stay bit-exact even though the
Pallas kernel is the production path."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from qoipp_tpu import Channels, Desc, oracle
from qoipp_tpu.ops import boundary, decode as dec_ops
from qoipp_tpu.ops.bitops import packed_to_pixels

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
from wave_engine import wave_decode  # noqa: E402


def prep(desc, enc):
    n_px = desc.width * desc.height
    qb = dec_ops._bucket(enc.size - 14, boundary.BLOCK)
    region = np.zeros(qb + 8, np.uint8)
    region[: enc.size - 14] = enc[14:]
    region_j = jnp.asarray(region)
    info = boundary.analyze_region(
        region_j[:qb], jnp.int32(enc.size - 22), jnp.int32(n_px)
    )
    return region_j, info, qb, n_px


def images():
    rng = np.random.default_rng(3)
    out = []
    for ch in (Channels.RGB, Channels.RGBA):
        desc = Desc(96, 40, ch)
        pal = rng.integers(0, 256, (8, int(ch))).astype(np.uint8)
        raw = pal[rng.integers(0, 8, 96 * 40)].reshape(-1)
        enc, _ = oracle.encode(raw, desc)
        out.append((desc, raw, enc))
    return out


@pytest.mark.parametrize("desc,raw,enc", images(), ids=["rgb", "rgba"])
def test_scan_engine(desc, raw, enc):
    region, info, qb, n_px = prep(desc, enc)
    s_tiles = dec_ops.pick_tiles(qb)
    packed, filled = dec_ops.decode_bytes(
        region, info["real"], info["produced"], info["pix_before"],
        jnp.int32(n_px), s_tiles=s_tiles, n_cap=dec_ops._bucket(n_px, 128),
    )
    assert int(filled) == n_px
    got = np.asarray(packed_to_pixels(packed[:n_px], int(desc.channels)))
    assert np.array_equal(got, raw)


@pytest.mark.parametrize("desc,raw,enc", images(), ids=["rgb", "rgba"])
def test_wave_engine(desc, raw, enc):
    region, info, qb, n_px = prep(desc, enc)
    packed, filled, crafted = wave_decode(
        region, info["real"], info["produced"], info["pix_before"],
        jnp.int32(n_px), n_cap=dec_ops._bucket(n_px, 128),
    )
    assert not bool(crafted)
    got = np.asarray(packed_to_pixels(packed[:n_px], int(desc.channels)))
    assert np.array_equal(got, raw)
