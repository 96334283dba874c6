"""JAX parallel encoder parity vs the native oracle and golden fixtures
(acceptance bar per SURVEY.md §4: bit-exact byte output)."""

import numpy as np
import pytest

from qoipp_tpu import Channels, Colorspace, Desc
from qoipp_tpu import oracle
from qoipp_tpu.ops import jax_backend

DESC3 = Desc(29, 17, Channels.RGB, Colorspace.SRGB)
DESC4 = Desc(24, 14, Channels.RGBA, Colorspace.SRGB)


def check_parity(raw, desc):
    want, complete = oracle.encode(raw, desc)
    assert complete
    got = jax_backend.encode_single(raw, desc)
    assert got.size == want.size, f"size {got.size} != {want.size}"
    diff = np.nonzero(got != want)[0]
    assert diff.size == 0, f"first mismatch at byte {diff[:5]} of {want.size}"


def test_golden_rgb(raw3, qoi3):
    got = jax_backend.encode_single(raw3, DESC3)
    assert np.array_equal(got, qoi3)


def test_golden_rgba(raw4, qoi4):
    got = jax_backend.encode_single(raw4, DESC4)
    assert np.array_equal(got, qoi4)


@pytest.mark.parametrize("ch", [Channels.RGB, Channels.RGBA])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_low_entropy_random(ch, seed):
    rng = np.random.default_rng(seed)
    desc = Desc(37, 23, ch)
    raw = (rng.integers(0, 4, 37 * 23 * int(ch)) * 5).astype(np.uint8)
    check_parity(raw, desc)


@pytest.mark.parametrize("ch", [Channels.RGB, Channels.RGBA])
def test_high_entropy_random(ch):
    rng = np.random.default_rng(7)
    desc = Desc(64, 64, ch)
    raw = rng.integers(0, 256, 64 * 64 * int(ch)).astype(np.uint8)
    check_parity(raw, desc)


def test_all_equal_start_pixel():
    # Entire image equals the codec start pixel -> pure runs incl. trailing.
    desc = Desc(100, 3, Channels.RGBA)
    raw = np.tile(np.array([0, 0, 0, 255], np.uint8), 300)
    check_parity(raw, desc)


def test_run_limit_boundaries():
    # Runs of exactly 61, 62, 63, 124 pixels around the 62-limit flush.
    for runlen in (61, 62, 63, 124, 125):
        n = runlen + 2
        desc = Desc(n, 1, Channels.RGB)
        raw = np.full((n, 3), 10, np.uint8)
        raw[0] = (1, 2, 3)
        raw[-1] = (200, 5, 9)
        check_parity(raw.reshape(-1), desc)


def test_trailing_run_exact_62():
    desc = Desc(63, 1, Channels.RGB)
    raw = np.full((63, 3), 77, np.uint8)
    raw[0] = (1, 2, 3)  # 62 equal pixels after the first -> exact flush, no trail
    check_parity(raw.reshape(-1), desc)


def test_alpha_changes():
    rng = np.random.default_rng(3)
    desc = Desc(50, 8, Channels.RGBA)
    raw = rng.integers(0, 3, (400, 4)).astype(np.uint8) * 7
    raw[:, 3] = rng.integers(0, 2, 400).astype(np.uint8) * 255
    check_parity(raw.reshape(-1), desc)


def test_gradient_diff_luma():
    # Smooth gradients exercise DIFF and LUMA ranges incl. wraparound.
    desc = Desc(128, 16, Channels.RGB)
    x = np.arange(128 * 16)
    raw = np.stack(
        [(x % 256), (x // 2 % 256), (255 - x % 256)], axis=1
    ).astype(np.uint8)
    check_parity(raw.reshape(-1), desc)


def test_int8_wraparound_luma():
    # Deltas whose dr-dg wraps around int8 (e.g. 248 -> -8 qualifies LUMA).
    desc = Desc(4, 1, Channels.RGB)
    raw = np.array(
        [[0, 0, 0], [120, 240, 120], [10, 10, 10], [250, 20, 250]], np.uint8
    )
    check_parity(raw.reshape(-1), desc)


def test_index_hits_and_collisions():
    # Repeated palette -> INDEX ops; engineered hash collisions.
    desc = Desc(16, 4, Channels.RGB)
    palette = np.array(
        [[1, 2, 3], [4, 5, 6], [1, 2, 3], [64, 0, 0], [0, 0, 0], [1, 2, 3]],
        np.uint8,
    )
    raw = palette[np.arange(64) % len(palette)]
    check_parity(raw.reshape(-1), desc)


def test_transparent_black_initial_index():
    # (0,0,0,0) matches the zero-initialized table slot 0 on first sight.
    desc = Desc(3, 1, Channels.RGBA)
    raw = np.array([[5, 5, 5, 255], [0, 0, 0, 0], [0, 0, 0, 0]], np.uint8)
    check_parity(raw.reshape(-1), desc)


@pytest.mark.parametrize("n", [1, 2, 63, 64, 65, 127, 128, 129, 1000])
def test_odd_sizes(n):
    rng = np.random.default_rng(n)
    desc = Desc(n, 1, Channels.RGB)
    raw = (rng.integers(0, 6, n * 3) * 11).astype(np.uint8)
    check_parity(raw, desc)


def test_larger_image():
    rng = np.random.default_rng(99)
    desc = Desc(640, 480, Channels.RGB)
    # Piecewise-flat image: realistic mix of runs/index/diff/luma/rgb.
    base = rng.integers(0, 256, (30, 3)).astype(np.uint8)
    ids = rng.integers(0, 30, 640 * 480)
    ids = np.maximum.accumulate(
        np.where(rng.random(640 * 480) < 0.05, ids, 0)
    ) % 30
    raw = base[ids]
    check_parity(raw.reshape(-1), desc)


def test_encode_packed_chunked_matches_per_subbatch():
    # the single-dispatch whole-batch encode (lax.map over sub-batches)
    # must equal the per-sub-batch path and the oracle, bit-exactly
    import jax.numpy as jnp

    from qoipp_tpu import oracle
    from qoipp_tpu.models.pipeline import BatchPipeline
    from qoipp_tpu.ops.bitops import pixels_to_packed

    rng = np.random.default_rng(17)
    desc = Desc(48, 40, Channels.RGB)
    raws, blobs = [], []
    for i in range(6):
        raw = (rng.integers(0, 5, 48 * 40 * 3) * 50).astype(np.uint8)
        enc, complete = oracle.encode(raw, desc)
        assert complete
        raws.append(raw)
        blobs.append(enc)
    ml = max(b.size for b in blobs)
    pipe = BatchPipeline(desc, max_stream_len=ml, max_encode_len=ml + 1024)
    packed = jnp.stack(
        [jnp.pad(pixels_to_packed(jnp.asarray(r), 3),
                 (0, pipe.nb - pipe.n_px)) for r in raws]
    )
    out, lengths, ok = pipe.encode_packed_chunked(packed, sub=2)
    assert bool(jnp.all(ok))
    for i in range(6):
        assert int(lengths[i]) == blobs[i].size
        assert np.array_equal(np.asarray(out[i, : blobs[i].size]), blobs[i])
    with pytest.raises(ValueError):
        pipe.encode_packed_chunked(packed, sub=4)  # 6 % 4 != 0


def test_encode_raws_fused_path():
    # BatchPipeline.encode on (B, H, W, C) raw images: the fused
    # pack+pad+encode program (encode_raw_checked) must equal the oracle
    # bit-exactly and raise on max_encode_len overflow
    import jax.numpy as jnp

    from qoipp_tpu import oracle
    from qoipp_tpu.models.pipeline import BatchPipeline

    rng = np.random.default_rng(23)
    desc = Desc(40, 32, Channels.RGBA)
    n = 40 * 32 * 4
    raws = [
        (rng.integers(0, 4, n) * 60).astype(np.uint8),
        rng.integers(0, 256, n, dtype=np.uint8),  # noise: near-worst size
        np.zeros(n, np.uint8),
    ]
    blobs = [oracle.encode(r, desc)[0] for r in raws]
    pipe = BatchPipeline(desc)
    out, lengths = pipe.encode(np.stack(raws).reshape(3, 32, 40, 4))
    for i, b_ in enumerate(blobs):
        assert int(lengths[i]) == b_.size
        assert np.array_equal(np.asarray(out[i, : b_.size]), b_), f"img {i}"

    assert min(b_.size for b_ in blobs[:2]) > 1024  # bound really is tight
    tight = BatchPipeline(desc, max_encode_len=1024)
    with pytest.raises(ValueError, match="encode overflow"):
        tight.encode(jnp.asarray(np.stack(raws)))
