"""Differential tests for the MXU compaction kernel vs its XLA oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from qoipp_tpu.ops.compact_kernel import (
    BLK,
    compact_rows,
    compact_rows_reference,
)


@pytest.mark.parametrize("density", [0.0, 0.03, 0.4, 1.0])
@pytest.mark.parametrize("b,n", [(3, 2 * BLK), (1, 4 * BLK)])
def test_compact_differential(density, b, n):
    rng = np.random.default_rng(int(density * 100) + b)
    keep = rng.random((b, n)) < density
    planes = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, (b, n), np.uint64).astype(np.uint32))
        for _ in range(2)
    )
    cap = ((int(keep.sum(axis=1).max()) + BLK + 256) // 128 + 1) * 128
    got, counts = compact_rows(planes, jnp.asarray(keep), cap=cap)
    want, wcounts = compact_rows_reference(planes, jnp.asarray(keep), cap=cap)
    assert np.array_equal(np.asarray(counts), np.asarray(wcounts))
    for g, w in zip(got, want):
        for i in range(b):
            c = int(counts[i])
            assert np.array_equal(np.asarray(g[i, :c]), np.asarray(w[i, :c]))


def test_compact_three_planes_block_edges():
    # keeps clustered at block boundaries + a full block kept
    b, n = 2, 3 * BLK
    rng = np.random.default_rng(9)
    keep = np.zeros((b, n), bool)
    keep[:, BLK - 5 : BLK + 5] = True
    keep[0, BLK : 2 * BLK] = True  # full middle block
    keep[1, ::97] = True
    planes = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, (b, n), np.uint64).astype(np.uint32))
        for _ in range(3)
    )
    cap = ((int(keep.sum(axis=1).max()) + BLK + 256) // 128 + 1) * 128
    got, counts = compact_rows(planes, jnp.asarray(keep), cap=cap)
    want, _ = compact_rows_reference(planes, jnp.asarray(keep), cap=cap)
    for g, w in zip(got, want):
        for i in range(b):
            c = int(counts[i])
            assert np.array_equal(np.asarray(g[i, :c]), np.asarray(w[i, :c]))


def test_compact_active_quarters():
    # planes with reduced active-quarter counts: values bounded by the
    # quarter budget compact identically to the 4-quarter path
    b, n = 3, 2 * BLK
    rng = np.random.default_rng(11)
    keep = rng.random((b, n)) < 0.4
    p4 = jnp.asarray(rng.integers(0, 1 << 32, (b, n), np.uint64).astype(np.uint32))
    p3 = jnp.asarray(rng.integers(0, 1 << 24, (b, n), np.uint64).astype(np.uint32))
    p1 = jnp.asarray(rng.integers(0, 1 << 8, (b, n), np.uint64).astype(np.uint32))
    planes = (p4, p3, p1)
    cap = ((int(keep.sum(axis=1).max()) + BLK + 256) // 128 + 1) * 128
    got, counts = compact_rows(planes, jnp.asarray(keep), cap=cap,
                               quarters=(4, 3, 1))
    want, wcounts = compact_rows_reference(planes, jnp.asarray(keep), cap=cap)
    assert np.array_equal(np.asarray(counts), np.asarray(wcounts))
    for g, w in zip(got, want):
        for i in range(b):
            c = int(counts[i])
            assert np.array_equal(np.asarray(g[i, :c]), np.asarray(w[i, :c]))


def test_compact_secbits16():
    # 16-bit halfword sections (HIGHEST-precision dot) compact identically
    # to the 8-bit default; exactness on the real MXU is pinned by
    # benchmarks/expt_compact.py (interpret mode runs f32 either way).
    b, n = 3, 2 * BLK
    rng = np.random.default_rng(12)
    keep = rng.random((b, n)) < 0.4
    p2 = jnp.asarray(rng.integers(0, 1 << 32, (b, n), np.uint64).astype(np.uint32))
    p1 = jnp.asarray(rng.integers(0, 1 << 16, (b, n), np.uint64).astype(np.uint32))
    planes = (p2, p1)
    cap = ((int(keep.sum(axis=1).max()) + BLK + 256) // 128 + 1) * 128
    got, counts = compact_rows(planes, jnp.asarray(keep), cap=cap,
                               quarters=(2, 1), secbits=16)
    want, wcounts = compact_rows_reference(planes, jnp.asarray(keep), cap=cap)
    assert np.array_equal(np.asarray(counts), np.asarray(wcounts))
    for g, w in zip(got, want):
        for i in range(b):
            c = int(counts[i])
            assert np.array_equal(np.asarray(g[i, :c]), np.asarray(w[i, :c]))
