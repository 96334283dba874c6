#!/usr/bin/env python
"""R4-3 experiment: stacked-plane overwrite fill for the encode table scan.

The packed-encode table stage (`ops/encode._last_same_hash_value_seg`,
round-4 profile: 5.9 ms of 26.1 on the real corpus) carries THREE
(s, 64) planes — value, seg, written — through a log-shift forward
fill (log2(s) iterations x 3 concats + 3 wheres), then three one-hot
masked sums at both the per-tile summary and per-pixel lookup.

Candidate (this file): merge seg+written into ONE key plane
(key = seg+1, 0 = unwritten — valid because lane seg ids are
nondecreasing ints >= 0), and stack (value, key) along the LANE axis
into one (s, 128) array so each fill iteration is 1 concat + 1 where.
The merge also drops one (s, 64, TILE) masked sum in the per-tile
summary (t_seg rides the same one-hot as t_written used to) and one
(s, TILE, 64) masked sum in the lookup (px_w & (px_d == sg) becomes
pxkey == sg+1).

Run on the real TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/expt_table_stack.py
"""

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from qoipp_tpu.ops import encode as enc_ops
from qoipp_tpu.ops.encode import TILE
from qoipp_tpu.utils.timing import device_time_ms, enable_compile_cache


def _last_same_hash_value_seg_stacked(packed, h, noneq, seg, tile=TILE):
    """Candidate: see module docstring. Bit-identical output required.

    `tile` sweeps the micro-tile size: the pairwise + local one-hot
    planes scale with nb*tile while the slot planes stay nb*64, so
    tile=32 halves the two largest builds at the cost of one more fill
    iteration and 2x summary rows."""
    nb = packed.shape[0]
    s = nb // tile
    ph = packed.reshape(s, tile)
    hh = h.reshape(s, tile).astype(jnp.int32)
    ne = noneq.reshape(s, tile)
    sg = seg.reshape(s, tile).astype(jnp.int32)

    j_ids = jnp.arange(tile, dtype=jnp.int32)

    pair = (
        (hh[:, None, :] == hh[:, :, None])
        & (j_ids[None, None, :] < j_ids[None, :, None])
        & ne[:, None, :]
        & (sg[:, None, :] == sg[:, :, None])
    )
    lastj = jnp.max(jnp.where(pair, j_ids[None, None, :], -1), axis=2)
    local_found = lastj >= 0
    local_hot = lastj[:, :, None] == j_ids[None, None, :]
    local_val = jnp.sum(
        jnp.where(local_hot, ph[:, None, :], jnp.uint32(0)), axis=2
    )

    # per-tile per-slot summary: (value, key) where key = seg+1, 0=unwritten
    slot_ids = jnp.arange(64, dtype=jnp.int32)
    covers = (hh[:, None, :] == slot_ids[None, :, None]) & ne[:, None, :]
    tj = jnp.max(jnp.where(covers, j_ids[None, None, :], -1), axis=2)
    t_hot = tj[:, :, None] == j_ids[None, None, :]  # empty row when tj == -1
    t_val = jnp.sum(jnp.where(t_hot, ph[:, None, :], jnp.uint32(0)), axis=2)
    t_key = jnp.sum(
        jnp.where(t_hot, (sg + 1).astype(jnp.uint32)[:, None, :],
                  jnp.uint32(0)),
        axis=2,
    )

    # stacked log-shift overwrite fill: one (s, 128) plane
    st = jnp.concatenate([t_val, t_key], axis=1)  # lanes 0..63 val, 64..127 key
    k = 1
    while k < s:
        pz = jnp.concatenate([jnp.zeros((k, 128), st.dtype), st[:-k]], axis=0)
        w = st[:, 64:] > 0  # (s, 64) written mask, per slot
        st = jnp.where(jnp.concatenate([w, w], axis=1), st, pz)
        k *= 2
    inc = jnp.concatenate([jnp.zeros((1, 128), st.dtype), st[:-1]], axis=0)
    inc_v, inc_k = inc[:, :64], inc[:, 64:]

    slot_hot = hh[:, :, None] == slot_ids[None, None, :]
    px_v = jnp.sum(jnp.where(slot_hot, inc_v[:, None, :], jnp.uint32(0)), axis=2)
    px_k = jnp.sum(jnp.where(slot_hot, inc_k[:, None, :], jnp.uint32(0)), axis=2)
    # entry applies iff written AND from this pixel's segment: key == seg+1
    fallback = jnp.where(px_k == (sg + 1).astype(jnp.uint32), px_v,
                         jnp.uint32(0))
    return jnp.where(local_found, local_val, fallback).reshape(-1)


def _last_same_hash_value_stacked(packed, h, noneq, incoming=None):
    """Plain-variant candidate: stack (value, written) along the lane axis
    so the fill shifts one (s, 128) plane per iteration instead of two."""
    nb = packed.shape[0]
    s = nb // TILE
    ph = packed.reshape(s, TILE)
    hh = h.reshape(s, TILE).astype(jnp.int32)
    ne = noneq.reshape(s, TILE)

    j_ids = jnp.arange(TILE, dtype=jnp.int32)

    pair = (
        (hh[:, None, :] == hh[:, :, None])
        & (j_ids[None, None, :] < j_ids[None, :, None])
        & ne[:, None, :]
    )
    lastj = jnp.max(jnp.where(pair, j_ids[None, None, :], -1), axis=2)
    local_found = lastj >= 0
    local_hot = lastj[:, :, None] == j_ids[None, None, :]
    local_val = jnp.sum(
        jnp.where(local_hot, ph[:, None, :], jnp.uint32(0)), axis=2
    )

    slot_ids = jnp.arange(64, dtype=jnp.int32)
    covers = (hh[:, None, :] == slot_ids[None, :, None]) & ne[:, None, :]
    tj = jnp.max(jnp.where(covers, j_ids[None, None, :], -1), axis=2)
    t_hot = tj[:, :, None] == j_ids[None, None, :]
    t_val = jnp.sum(jnp.where(t_hot, ph[:, None, :], jnp.uint32(0)), axis=2)
    t_w = jnp.sum(jnp.where(t_hot, jnp.uint32(1), jnp.uint32(0)), axis=2)

    st = jnp.concatenate([t_val, t_w], axis=1)  # (s, 128)
    k = 1
    while k < s:
        pz = jnp.concatenate([jnp.zeros((k, 128), st.dtype), st[:-k]], axis=0)
        w = st[:, 64:] > 0
        st = jnp.where(jnp.concatenate([w, w], axis=1), st, pz)
        k *= 2
    if incoming is None:
        incoming = jnp.zeros(64, jnp.uint32)
    inc = jnp.concatenate([jnp.zeros((1, 128), st.dtype), st[:-1]], axis=0)
    table = jnp.where(inc[:, 64:] > 0, inc[:, :64], incoming[None, :])

    slot_hot = hh[:, :, None] == slot_ids[None, None, :]
    inc_at_px = jnp.sum(
        jnp.where(slot_hot, table[:, None, :], jnp.uint32(0)), axis=2
    )
    return jnp.where(local_found, local_val, inc_at_px).reshape(-1)


def _rand_case(rng, n, n_seg):
    """Adversarial-ish segmented lane: low-entropy pixels so hash slots
    collide hard across segment boundaries."""
    vals = rng.integers(0, 6, size=(n, 4)).astype(np.uint32)
    packed = vals[:, 0] | (vals[:, 1] << 8) | (vals[:, 2] << 16) | (vals[:, 3] << 24)
    noneq = rng.random(n) < 0.7
    cuts = np.sort(rng.choice(n, size=n_seg - 1, replace=False))
    seg = np.zeros(n, np.int32)
    for c in cuts:
        seg[c:] += 1
    h = (3 * vals[:, 0] + 5 * vals[:, 1] + 7 * vals[:, 2] + 11 * vals[:, 3]) % 64
    return (jnp.asarray(packed), jnp.asarray(h.astype(np.uint32)),
            jnp.asarray(noneq), jnp.asarray(seg))


def main():
    corr_only = "--correctness-only" in sys.argv
    if corr_only:
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()
    rng = np.random.default_rng(7)

    # -- correctness: bit-identical to the shipped implementation ----------
    base = jax.jit(enc_ops._last_same_hash_value_seg)
    cand = jax.jit(_last_same_hash_value_seg_stacked)
    cand32 = jax.jit(lambda p, h, nq, sg:
                     _last_same_hash_value_seg_stacked(p, h, nq, sg, tile=32))
    for n, n_seg in [(TILE, 1), (4 * TILE, 3), (64 * TILE, 9),
                     (1024 * TILE, 40)]:
        args = _rand_case(rng, n, n_seg)
        a = np.asarray(base(*args))
        b = np.asarray(cand(*args))
        assert np.array_equal(a, b), f"MISMATCH at n={n} n_seg={n_seg}"
        c = np.asarray(cand32(*args))
        assert np.array_equal(a, c), f"t32 MISMATCH at n={n} n_seg={n_seg}"
    print("correctness: identical on 4 segmented cases (tile 64 + 32)",
          file=sys.stderr)

    # plain variant (batched encode, encode.py:512; device_stream windows)
    pbase = jax.jit(enc_ops._last_same_hash_value)
    pcand = jax.jit(_last_same_hash_value_stacked)
    for n in [TILE, 4 * TILE, 64 * TILE, 1024 * TILE]:
        pk, h, nq, _ = _rand_case(rng, n, 1)
        inc = jnp.asarray(
            rng.integers(0, 6, size=(64, 4)).astype(np.uint32) @
            np.array([1, 1 << 8, 1 << 16, 1 << 24], np.uint32)
        )
        for incoming in (None, inc):
            a = np.asarray(pbase(pk, h, nq, incoming))
            b = np.asarray(pcand(pk, h, nq, incoming))
            assert np.array_equal(a, b), f"PLAIN MISMATCH at n={n}"
    print("correctness: plain variant identical (w/ + w/o incoming)",
          file=sys.stderr)
    if corr_only:
        return

    # -- device timing at the real packed-encode shape ----------------------
    # 12 lanes x 448K chunk rows (the compacted chunk domain the production
    # path feeds this function; vmapped over lanes like encode.py:791)
    L, N = 12, 448 * 1024
    args = [jnp.stack(x) for x in zip(*(_rand_case(rng, N, 20) for _ in range(L)))]
    vb = jax.jit(jax.vmap(enc_ops._last_same_hash_value_seg))
    vc = jax.jit(jax.vmap(_last_same_hash_value_seg_stacked))
    vc32 = jax.jit(jax.vmap(
        lambda p, h, nq, sg:
        _last_same_hash_value_seg_stacked(p, h, nq, sg, tile=32)))
    for name, fn in [("seg baseline", vb), ("seg stacked", vc),
                     ("seg stacked t32", vc32)]:
        fn(*args)  # compile
        ts = [device_time_ms(lambda: fn(*args), runs=10) for _ in range(3)]
        print(f"{name}: {min(ts):.2f} ms (best of 3x10, L={L} N={N})")

    # plain variant at the batched-encode chunk-domain shape: 32-image
    # sub-batch, ~520K chunk rows per 1080p image after compaction
    B2, N2 = 32, 512 * 1024
    pargs = [jnp.stack(x)
             for x in zip(*(_rand_case(rng, N2, 1)[:3] for _ in range(B2)))]
    pvb = jax.jit(jax.vmap(lambda p, h, nq: enc_ops._last_same_hash_value(p, h, nq)))
    pvc = jax.jit(jax.vmap(lambda p, h, nq: _last_same_hash_value_stacked(p, h, nq)))
    for name, fn in [("plain baseline", pvb), ("plain stacked", pvc)]:
        fn(*pargs)
        ts = [device_time_ms(lambda: fn(*pargs), runs=10) for _ in range(3)]
        print(f"{name}: {min(ts):.2f} ms (best of 3x10, B={B2} N={N2})")


if __name__ == "__main__":
    main()
