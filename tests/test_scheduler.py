"""Bucketed scheduler: parity + ordering on mixed-density corpora."""

import numpy as np
import pytest

from qoipp_tpu import Channels, Desc, oracle
from qoipp_tpu.models.scheduler import BucketedCodec

DESC = Desc(64, 48, Channels.RGB)


def mixed_corpus(b=21, seed=0):
    rng = np.random.default_rng(seed)
    n = DESC.width * DESC.height
    raws, blobs = [], []
    for i in range(b):
        kind = i % 3
        if kind == 0:  # tiny streams (flat)
            raw = np.full(n * 3, (i * 7) % 256, np.uint8)
        elif kind == 1:  # palette
            pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
            raw = pal[rng.integers(0, 8, n)].reshape(-1)
        else:  # noise (dense streams)
            raw = rng.integers(0, 256, n * 3, np.uint8)
        enc, _ = oracle.encode(raw, DESC)
        raws.append(raw)
        blobs.append(enc)
    return raws, blobs


def test_bucketed_decode_parity_and_order():
    raws, blobs = mixed_corpus()
    codec = BucketedCodec(DESC, min_len=1 << 10)
    imgs = codec.decode(blobs)
    assert imgs.shape == (len(blobs), DESC.height, DESC.width, 3)
    for i, raw in enumerate(raws):
        assert np.array_equal(imgs[i].reshape(-1), raw), f"image {i}"
    # several distinct buckets must actually have been used
    assert len(codec._pipes) >= 2


def test_bucketed_encode_with_hints_and_overflow_retry():
    raws, blobs = mixed_corpus(b=12, seed=3)
    codec = BucketedCodec(DESC, min_len=1 << 10)
    # deliberately under-hint the dense images: the overflow retry path
    # must re-encode them in a larger bucket, still bit-exact
    hints = [max(b_.size // 2, 100) for b_ in blobs]
    streams = codec.encode(np.stack([r for r in raws]), size_hints=hints)
    for i, b_ in enumerate(blobs):
        assert np.array_equal(streams[i], b_), f"image {i}"


def test_bucketed_decode_rgba_target_conversion():
    raws, blobs = mixed_corpus(b=6, seed=5)
    codec = BucketedCodec(DESC, min_len=1 << 10)
    imgs = codec.decode(blobs, target=Channels.RGBA)
    assert imgs.shape[-1] == 4
    for i, raw in enumerate(raws):
        want = oracle.decode(blobs[i], DESC, Channels.RGBA)
        assert np.array_equal(imgs[i].reshape(-1), want)


def test_pad_b_grid_bounds_waste():
    # the batch pad grid must cover 1..256 with <= 50% padded waste so
    # singleton-geometry serving images stop paying 8x padded batches
    from qoipp_tpu.models.scheduler import _B_GRID, _pad_b

    assert _pad_b(1) == 1 and _pad_b(2) == 2
    for n in range(1, 257):
        p = _pad_b(n)
        assert p >= n and p in _B_GRID
        assert p * 2 <= n * 3, (n, p)  # <= 1.5x
    for n in range(1, 17):  # small corpora: tighter
        assert _pad_b(n) * 3 <= n * 4, n
