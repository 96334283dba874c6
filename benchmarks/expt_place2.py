#!/usr/bin/env python
"""Place-kernel v2 experiment: two windows per grid step + predicated fill.

The round-3 stage profile (benchmarks/profile_r3.py) puts place_fill at
78 ms of the 109 ms B=128 decode batch; arithmetic attributes ~34 ms to
per-window FIXED cost (DMA issue/wait pairs, span scalar work, loop
machinery) and ~16 ms to the 6 log-shift fill passes.  Two candidate cuts,
both exactness-preserving:

  * process TWO 8192-px windows per grid step from ONE double-buffered
    fetch (halves the windows -> halves fixed cost; the slab dot still
    contracts only its own half's 64 stripes, so slab cost is unchanged);
  * track the max produced-per-chunk in each half during the slab loop and
    run fill passes k=8,16,32 only when a gap > 8 exists (flag coverage
    only ever needs to reach the previous writer; positions before a
    half's first writer are carry-filled regardless of pass count).

This file is a standalone copy for parity + timing; if it wins it gets
ported into qoipp_tpu/ops/place_kernel.py.
"""

import sys
from functools import partial
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qoipp_tpu.ops import place_kernel as PK
from qoipp_tpu.ops.place_kernel import WIN, SW, SLAB, _flat_shift, \
    window_base_rows
from qoipp_tpu.utils.timing import enable_compile_cache, device_time_ms

TRANCHE2 = 32
LENR2 = 2 * 5 * WIN // SLAB + 24
LENR_BUF2 = -(-LENR2 // TRANCHE2) * TRANCHE2


def _kernel2(base_ref, pb_hbm, emit_hbm, out_ref,
             pb_buf, em_buf, sems, carry_ref):
    b = pl.program_id(0)
    s2 = pl.program_id(1)
    nsteps2 = pl.num_programs(1)

    def _span(bb, ss2):
        b0 = base_ref[bb, 2 * ss2]
        ba = (b0 // 8) * 8
        lr = b0 - ba
        need = jnp.minimum(lr + base_ref[bb, 2 * ss2 + 2] - b0 + 3, LENR2)
        return ba, lr, need

    def xfer(start, slot, bb, ss2):
        ba, _, need = _span(bb, ss2)
        ntr = (need + TRANCHE2 - 1) // TRANCHE2

        def tr(t, _):
            for hbm, buf, c in ((pb_hbm, pb_buf, 0), (emit_hbm, em_buf, 1)):
                cp = pltpu.make_async_copy(
                    hbm.at[bb, pl.ds(ba + t * TRANCHE2, TRANCHE2), :],
                    buf.at[slot, pl.ds(t * TRANCHE2, TRANCHE2)],
                    sems.at[slot, c])
                if start:
                    cp.start()
                else:
                    cp.wait()
            return 0

        jax.lax.fori_loop(0, ntr, tr, 0)

    slot = jax.lax.rem(s2, 2)

    @pl.when(s2 == 0)
    def _prologue():
        carry_ref[0] = 0
        xfer(True, slot, b, s2)

    xfer(False, slot, b, s2)

    @pl.when(s2 + 1 < nsteps2)
    def _prefetch():
        xfer(True, 1 - slot, b, s2 + 1)

    ba, _, _ = _span(b, s2)

    stripe_ids = jax.lax.broadcasted_iota(jnp.int32, (SW, 128), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    out_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    for half in (0, 1):
        wi = 2 * s2 + half
        w0 = wi * WIN
        lrh = base_ref[b, wi] - ba
        n = jnp.minimum(base_ref[b, wi + 1] - base_ref[b, wi] + 1,
                        LENR2 - 1 - lrh)

        def _slab(pbr, nxtr, vr, acc, gv):
            covers = nxtr > pbr
            t = pbr - w0
            m = covers & (t >= 0) & (t < WIN)
            ts = jnp.where(m, t >> 7, -1)
            tl = jnp.where(m, t & 127, -1)
            planes = [((vr & 0xFF) + 1).astype(jnp.float32),
                      ((vr >> 8) & 0xFF).astype(jnp.float32),
                      ((vr >> 16) & 0xFF).astype(jnp.float32),
                      ((vr >> 24) & 0xFF).astype(jnp.float32)]
            hot = ts == stripe_ids
            a = jnp.concatenate(
                [jnp.where(hot, p, 0.0) for p in planes], axis=0)
            bm_t = (out_l == tl).astype(jnp.float32)
            acc = acc + jax.lax.dot_general(
                a, bm_t, (((1,), (1,)), ((), ())),
                precision="default", preferred_element_type=jnp.float32)
            gv = jnp.maximum(gv, jnp.where(m, nxtr - pbr, 0))
            return acc, gv

        G = 8

        def group(g, carry):
            acc, gv = carry
            g0 = lrh + g * G
            pbg = pb_buf[slot, pl.ds(g0, G + 1), :]
            emg = pltpu.bitcast(em_buf[slot, pl.ds(g0, G), :], jnp.int32)
            rolled = pltpu.roll(pbg, 127, axis=1)
            for k in range(G):
                nxtr = jnp.where(
                    lane1[0:1] < 127, rolled[k : k + 1], rolled[k + 1 : k + 2]
                )
                acc, gv = _slab(pbg[k : k + 1], nxtr, emg[k : k + 1], acc, gv)
            return acc, gv

        def trip(rr, carry):
            acc, gv = carry
            pbr2 = pb_buf[slot, pl.ds(lrh + rr, 2), :]
            rolled = pltpu.roll(pbr2, 127, axis=1)
            nxtr = jnp.where(lane1[0:1] < 127, rolled[0:1], rolled[1:2])
            vr = pltpu.bitcast(em_buf[slot, pl.ds(lrh + rr, 1), :], jnp.int32)
            return _slab(pbr2[0:1], nxtr, vr, acc, gv)

        acc = jnp.zeros((4 * SW, 128), jnp.float32)
        gv = jnp.zeros((1, 128), jnp.int32)
        acc, gv = jax.lax.fori_loop(0, n // G, group, (acc, gv))
        acc, gv = jax.lax.fori_loop((n // G) * G, n, trip, (acc, gv))

        b0f = acc[:SW].astype(jnp.int32)
        b1f = acc[SW : 2 * SW].astype(jnp.int32)
        b2f = acc[2 * SW : 3 * SW].astype(jnp.int32)
        b3f = acc[3 * SW :].astype(jnp.int32)
        flag = (b0f != 0).astype(jnp.int32)
        word = (b0f - flag) | (b1f << 8) | (b2f << 16) | (b3f << 24)

        for k in (1, 2, 4):
            word = jnp.where(flag != 0, word, _flat_shift(word, k))
            flag = flag | _flat_shift(flag, k)

        gmax = jnp.max(gv)
        nrem = jnp.where(gmax > 8, 3, 0)

        def fill_rem(i, wf):
            word, flag = wf
            k = 8 << i
            word = jnp.where(flag != 0, word, _flat_shift(word, k))
            flag = flag | _flat_shift(flag, k)
            return word, flag

        word, flag = jax.lax.fori_loop(0, nrem, fill_rem, (word, flag))

        merged = jnp.where(flag != 0, word, carry_ref[0])
        carry_ref[0] = merged[SW - 1, 127]
        out_ref[0, half * SW : (half + 1) * SW] = pltpu.bitcast(
            merged, jnp.uint32)


@partial(jax.jit, static_argnames=("n_cap", "interpret"))
def place_fill2(pb, emits, base_step, n_cap: int,
                interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, q = pb.shape
    assert q % 128 == 0 and n_cap % (2 * WIN) == 0
    nsteps = n_cap // WIN
    assert base_step.shape == (b, nsteps + 1)

    pad_q = (-q) % SLAB
    if pad_q:
        pb = jnp.pad(pb, ((0, 0), (0, pad_q)), constant_values=n_cap)
        emits = jnp.pad(emits, ((0, 0), (0, pad_q)))
        q += pad_q
    qr = q // SLAB
    pad_r = LENR_BUF2 + TRANCHE2
    pb3 = jnp.pad(
        pb.reshape(b, qr, SLAB), ((0, 0), (0, pad_r), (0, 0)),
        constant_values=n_cap,
    )
    em3 = jnp.pad(emits.reshape(b, qr, SLAB), ((0, 0), (0, pad_r), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nsteps // 2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 2 * SW, 128), lambda i, j, ref: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, LENR_BUF2, SLAB), jnp.int32),
            pltpu.VMEM((2, LENR_BUF2, SLAB), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _kernel2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_cap // 128, 128), jnp.uint32),
        interpret=interpret,
    )(base_step, pb3, em3)
    return out.reshape(b, n_cap)


def make_case(b, q, density, run_frac, seed=0):
    rng = np.random.default_rng(seed)
    inc = np.zeros((b, q), np.int64)
    r = rng.random((b, q))
    inc[r < density] = 1
    runs = r < run_frac
    inc[runs] = rng.integers(5, 63, runs.sum())
    pb = np.cumsum(inc, axis=1) - inc
    n_cap = -(-int(pb.max() + 70) // (2 * WIN)) * (2 * WIN)
    emits = rng.integers(0, 1 << 32, (b, q), dtype=np.uint64).astype(np.uint32)
    return (jnp.asarray(pb, jnp.int32), jnp.asarray(emits), n_cap)


def main():
    enable_compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    cases = [
        # bench-corpus-like: ~7.3 pixels/byte (chunks/byte 0.567, heavy
        # runs) -> ~8.7 content slabs per 8192-px window, 255 windows/img
        ("bench-like", 8 if not on_tpu else 128, (1 << 13) if not on_tpu
         else 284928 // 128 * 128, 0.40, 0.20),
        ("photo-ish", 8 if not on_tpu else 128, (1 << 13) if not on_tpu
         else 284928 // 128 * 128, 0.40, 0.002),
        ("flat-runs", 8 if not on_tpu else 128, (1 << 13) if not on_tpu
         else 284928 // 128 * 128, 0.05, 0.01),
    ]
    for name, b, q, dens, rf in cases:
        pb, emits, n_cap = make_case(b, q, dens, rf)
        base = window_base_rows(pb, n_cap)
        ref = jax.block_until_ready(PK.place_fill(pb, emits, base, n_cap))
        got = jax.block_until_ready(place_fill2(pb, emits, base, n_cap))
        okp = np.array_equal(np.asarray(ref), np.asarray(got))
        print(f"[{name}] parity {'OK' if okp else 'FAIL'}")
        if not okp:
            r0, g0 = np.asarray(ref), np.asarray(got)
            bad = np.argwhere(r0 != g0)
            print("  first mismatches:", bad[:5],
                  r0[tuple(bad[0])], g0[tuple(bad[0])])
            continue
        if on_tpu:
            t1 = device_time_ms(PK.place_fill, pb, emits, base, n_cap,
                                runs=10)
            t2 = device_time_ms(place_fill2, pb, emits, base, n_cap, runs=10)
            print(f"  v1 {t1:.2f} ms  v2 {t2:.2f} ms  ({t1/t2:.2f}x)")


if __name__ == "__main__":
    main()
