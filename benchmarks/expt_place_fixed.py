#!/usr/bin/env python
"""Localize the place_fill per-window FIXED cost (~8.3 us/window measured
round 3): ablation variants of the production kernel with stages knocked
out (timing only — outputs are wrong for ablated variants)."""

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
from qoipp_tpu.ops.place_kernel import (
    WIN, SW, SLAB, TRANCHE, LENR, LENR_BUF, _flat_shift, window_base_rows,
)
from qoipp_tpu.utils.timing import enable_compile_cache, device_time_ms

_F32_HI = jax.lax.Precision.HIGHEST


def make_kernel(do_dma, do_slabs, n_fill, prec=_F32_HI):
    bytes4 = prec == "bytes4"
    def kernel(base_ref, pb_hbm, emit_hbm, out_ref,
               pb_buf, em_buf, sems, carry_ref):
        b = pl.program_id(0)
        s = pl.program_id(1)
        nsteps = pl.num_programs(1)

        def _span(bb, ss):
            b0 = base_ref[bb, ss]
            ba = (b0 // 8) * 8
            lr = b0 - ba
            need = jnp.minimum(lr + base_ref[bb, ss + 1] - b0 + 3, LENR)
            return ba, lr, need

        def xfer(op, slot, bb, ss):
            ba, _, need = _span(bb, ss)
            ntr = (need + TRANCHE - 1) // TRANCHE

            def tr(t, _):
                op(pb_hbm.at[bb, pl.ds(ba + t * TRANCHE, TRANCHE), :],
                   pb_buf.at[slot, pl.ds(t * TRANCHE, TRANCHE)],
                   sems.at[slot, 0])
                op(emit_hbm.at[bb, pl.ds(ba + t * TRANCHE, TRANCHE), :],
                   em_buf.at[slot, pl.ds(t * TRANCHE, TRANCHE)],
                   sems.at[slot, 1])
                return 0

            jax.lax.fori_loop(0, ntr, tr, 0)

        issue = lambda *a: xfer(
            lambda s_, d, m: pltpu.make_async_copy(s_, d, m).start(), *a)
        wait = lambda *a: xfer(
            lambda s_, d, m: pltpu.make_async_copy(s_, d, m).wait(), *a)

        slot = jax.lax.rem(s, 2)

        @pl.when(s == 0)
        def _prologue():
            carry_ref[0] = 0
            if do_dma:
                issue(slot, b, s)

        if do_dma:
            wait(slot, b, s)

            @pl.when(s + 1 < nsteps)
            def _prefetch():
                issue(1 - slot, b, s + 1)

        w0 = s * WIN
        _, lr, need = _span(b, s)
        n = jnp.minimum(need - lr - 2, LENR - 1 - lr)

        stripe_ids = jax.lax.broadcasted_iota(jnp.int32, (SW, 128), 0)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
        out_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        stripe_ids_bf = stripe_ids.astype(jnp.bfloat16)
        out_l_bf = out_l.astype(jnp.bfloat16)

        def _slab(pbr, nxtr, vr, acc):
            covers = nxtr > pbr
            t = pbr - w0
            m = covers & (t >= 0) & (t < WIN)
            ts = jnp.where(m, t >> 7, -1)
            tl = jnp.where(m, t & 127, -1)
            hot = ts == stripe_ids
            if bytes4:
                # 8-bit planes are exact in single-pass bf16 (values
                # <= 256 fit bf16's 8 significand bits; every output
                # element receives exactly one contribution).  Compares
                # run in bf16 so the i1 mask lands in the packed 16-bit
                # layout (an i32-compare mask forces an invalid
                # relayout against bf16 selects).
                planes = [((vr & 0xFF) + 1).astype(jnp.float32),
                          ((vr >> 8) & 0xFF).astype(jnp.float32),
                          ((vr >> 16) & 0xFF).astype(jnp.float32),
                          ((vr >> 24) & 0xFF).astype(jnp.float32)]
                a = jnp.concatenate(
                    [jnp.where(hot, pl_, 0.0) for pl_ in planes], axis=0)
                bm_t = (out_l == tl).astype(jnp.float32)
                return acc + jax.lax.dot_general(
                    a, bm_t, (((1,), (1,)), ((), ())),
                    precision="default", preferred_element_type=jnp.float32)
            lo1 = ((vr & 0xFFFF) + 1).astype(jnp.float32)
            hi = ((vr >> 16) & 0xFFFF).astype(jnp.float32)
            a = jnp.concatenate(
                [jnp.where(hot, lo1, 0.0), jnp.where(hot, hi, 0.0)], axis=0)
            bm_t = (out_l == tl).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                a, bm_t, (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)

        G = 8

        def group(g, acc):
            g0 = lr + g * G
            pbg = pb_buf[slot, pl.ds(g0, G + 1), :]
            emg = pltpu.bitcast(em_buf[slot, pl.ds(g0, G), :], jnp.int32)
            rolled = pltpu.roll(pbg, 127, axis=1)
            for k in range(G):
                nxtr = jnp.where(
                    lane1[0:1] < 127, rolled[k:k + 1], rolled[k + 1:k + 2])
                acc = _slab(pbg[k:k + 1], nxtr, emg[k:k + 1], acc)
            return acc

        def trip(rr, acc):
            pbr2 = pb_buf[slot, pl.ds(lr + rr, 2), :]
            rolled = pltpu.roll(pbr2, 127, axis=1)
            nxtr = jnp.where(lane1[0:1] < 127, rolled[0:1], rolled[1:2])
            vr = pltpu.bitcast(em_buf[slot, pl.ds(lr + rr, 1), :], jnp.int32)
            return _slab(pbr2[0:1], nxtr, vr, acc)

        acc = jnp.zeros(((4 if bytes4 else 2) * SW, 128), jnp.float32)
        if do_slabs:
            acc = jax.lax.fori_loop(0, n // G, group, acc)
            acc = jax.lax.fori_loop((n // G) * G, n, trip, acc)

        if bytes4:
            b0f = acc[:SW].astype(jnp.int32)
            b1f = acc[SW:2 * SW].astype(jnp.int32)
            b2f = acc[2 * SW:3 * SW].astype(jnp.int32)
            b3f = acc[3 * SW:].astype(jnp.int32)
            flag = (b0f != 0).astype(jnp.int32)
            word = (b0f - flag) | (b1f << 8) | (b2f << 16) | (b3f << 24)
        else:
            lo1_f = acc[:SW].astype(jnp.int32)
            hi_f = acc[SW:].astype(jnp.int32)
            flag = (lo1_f != 0).astype(jnp.int32)
            word = (lo1_f - flag) | (hi_f << 16)

        shifts = (1, 2, 4, 8, 16, 32)[:n_fill]
        for k in shifts:
            word = jnp.where(flag != 0, word, _flat_shift(word, k))
            flag = flag | _flat_shift(flag, k)

        merged = jnp.where(flag != 0, word, carry_ref[0])
        carry_ref[0] = merged[SW - 1, 127]
        out_ref[0] = pltpu.bitcast(merged, jnp.uint32)

    return kernel


@partial(jax.jit, static_argnames=("n_cap", "do_dma", "do_slabs", "n_fill",
                                   "prec"))
def place_variant(pb, emits, base_step, n_cap, do_dma=True, do_slabs=True,
                  n_fill=6, prec="highest"):
    b, q = pb.shape
    nsteps = n_cap // WIN
    qr = q // SLAB
    pad_r = LENR_BUF + TRANCHE
    pb3 = jnp.pad(pb.reshape(b, qr, SLAB), ((0, 0), (0, pad_r), (0, 0)),
                  constant_values=n_cap)
    em3 = jnp.pad(emits.reshape(b, qr, SLAB), ((0, 0), (0, pad_r), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nsteps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, SW, 128), lambda i, j, ref: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, LENR_BUF, SLAB), jnp.int32),
            pltpu.VMEM((2, LENR_BUF, SLAB), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        make_kernel(do_dma, do_slabs, n_fill, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_cap // 128, 128), jnp.uint32),
    )(base_step, pb3, em3)
    return out.reshape(b, n_cap)


def main():
    enable_compile_cache()
    rng = np.random.default_rng(0)
    b, q = 8, 1 << 19
    inc = np.zeros((b, q), np.int64)
    r = rng.random((b, q))
    inc[r < 0.40] = 1
    runs = r < 0.002
    inc[runs] = rng.integers(5, 63, runs.sum())
    pb = np.cumsum(inc, axis=1) - inc
    n_cap = -(-int(pb.max() + 70) // WIN) * WIN
    emits = rng.integers(0, 1 << 32, (b, q), dtype=np.uint64).astype(np.uint32)
    pbj = jnp.asarray(pb, jnp.int32)
    emj = jnp.asarray(emits)
    base = window_base_rows(pbj, n_cap)
    nwin = b * n_cap // WIN
    from qoipp_tpu.ops import place_kernel as PKm
    ref = np.asarray(jax.jit(PKm.place_fill, static_argnames=("n_cap",))(
        pbj, emj, base, n_cap=n_cap))
    for prec in ("highest", "bytes4"):
        got = place_variant(pbj, emj, base, n_cap, prec=prec)
        print(f"prec={prec}: parity "
              f"{'OK' if np.array_equal(np.asarray(got), ref) else 'FAIL'}")
        t = device_time_ms(
            lambda: place_variant(pbj, emj, base, n_cap, prec=prec), runs=5)
        print(f"  full/{prec}: {t:6.2f} ms")
    cfgs = [
        ("no-fill", dict(n_fill=0)),
        ("fill-3", dict(n_fill=3)),
        ("no-slabs", dict(do_slabs=False)),
        ("no-dma", dict(do_dma=False, do_slabs=False)),
        ("dma-only", dict(do_slabs=False, n_fill=0)),
        ("bare", dict(do_dma=False, do_slabs=False, n_fill=0)),
        ("b4-nofill", dict(n_fill=0, prec="bytes4")),
        ("b4-fill3", dict(n_fill=3, prec="bytes4")),
        ("b4-noslab", dict(do_slabs=False, prec="bytes4")),
        ("b4-dmaonly", dict(do_slabs=False, n_fill=0, prec="bytes4")),
    ]
    for name, kw in cfgs:
        t = device_time_ms(
            lambda: place_variant(pbj, emj, base, n_cap, **kw), runs=5)
        print(f"{name:>9}: {t:6.2f} ms  ({t/nwin*1e3:5.2f} us/window)")


if __name__ == "__main__":
    main()
