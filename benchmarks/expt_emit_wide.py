#!/usr/bin/env python
"""Emit-kernel WIDE experiment: 2 chunk-row slabs per visit (256 lanes).

Companion to benchmarks/expt_place_wide.py — the emit kernel
(ops/emit_kernel.py) shares the place kernel's per-slab structure
(mask + stripe/lane one-hots + one MXU dot per 128-row slab) and sits at
the same ~200 ns per-slab-visit issue floor (BASELINE.md roofline note;
its 16-stripe dynamic acc tile cut MXU MACs 4x and measured SLOWER).
This experiment halves slab VISITS instead:

  * 256-LANE candidate slabs (off/tlo/thn HBM planes reshaped
    (B, C/256, 256)) — one visit covers two production slabs; the dot
    contracts 256 candidate lanes, acc stays (6*SW, 128);
  * group-hoisted mask/plane arithmetic ((G, lanes) ops once per group,
    static sublane slices per row);
  * aligned-group loads (g*8 from buffer row 0 — provably 8-aligned, as
    >128-lane VMEM arrays require; the <= 7 leading pre-window slabs are
    masked exactly since their off < w0).

Exactness: identical emission algebra to ops/emit_kernel.py (reference
stream layout source/simple.cpp:36-95, util.hpp:116-252); parity is
asserted against the production kernel before any timing.

Status: CPU-exact (interpret-mode parity green); CHIP TIMING PENDING —
queued with expt_place_wide.py behind the docs/BACKLOG.md outage list.
Lands in ops/emit_kernel.py only on a chip-timing win + chip parity at
production shapes.
"""

import argparse
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

from qoipp_tpu.ops import emit_kernel as EK
from qoipp_tpu.ops.emit_kernel import WIN, SW
from qoipp_tpu.ops.place_kernel import _flat_shift
from qoipp_tpu.utils.timing import enable_compile_cache, device_time_ms


def make_wide_kernel(lanes: int, hoist: bool, lenr: int, fetch_pad: int,
                     tranche: int):
    G = 8

    def kernel(base_ref, off_hbm, tlo_hbm, thn_hbm, out_ref,
               off_buf, tlo_buf, thn_buf, sems, carry_ref):
        b = pl.program_id(0)
        s = pl.program_id(1)
        nsteps = pl.num_programs(1)

        def _span(bb, ss):
            b0 = base_ref[bb, ss]
            ba = (b0 // 8) * 8
            lr = b0 - ba
            need = jnp.minimum(
                lr + base_ref[bb, ss + 1] - b0 + 3 + fetch_pad,
                lenr + fetch_pad)
            return ba, lr, need

        def _tranches(fn, slot, bb, ss):
            ba, _, need = _span(bb, ss)
            ntr = (need + tranche - 1) // tranche

            def tr(t, _):
                r0 = t * tranche
                fn(off_hbm.at[bb, pl.ds(ba + r0, tranche), :],
                   off_buf.at[slot, pl.ds(r0, tranche)], sems.at[slot, 0])
                fn(tlo_hbm.at[bb, pl.ds(ba + r0, tranche), :],
                   tlo_buf.at[slot, pl.ds(r0, tranche)], sems.at[slot, 1])
                fn(thn_hbm.at[bb, pl.ds(ba + r0, tranche), :],
                   thn_buf.at[slot, pl.ds(r0, tranche)], sems.at[slot, 2])
                return 0

            jax.lax.fori_loop(0, ntr, tr, 0)

        issue = lambda *a: _tranches(
            lambda s_, d, m: pltpu.make_async_copy(s_, d, m).start(), *a)
        wait = lambda *a: _tranches(
            lambda s_, d, m: pltpu.make_async_copy(s_, d, m).wait(), *a)

        slot = jax.lax.rem(s, 2)

        @pl.when(s == 0)
        def _prologue():
            carry_ref[0] = 0
            carry_ref[1] = 0
            carry_ref[2] = 0
            carry_ref[3] = 8
            issue(slot, b, s)

        wait(slot, b, s)

        @pl.when(s + 1 < nsteps)
        def _prefetch():
            issue(1 - slot, b, s + 1)

        w0 = s * WIN
        _, lr, _ = _span(b, s)
        n = jnp.minimum(base_ref[b, s + 1] - base_ref[b, s] + 1,
                        lenr - 1 - lr)
        ngroups = (lr + n + G - 1) // G

        stripe_ids = jax.lax.broadcasted_iota(jnp.int32, (SW, lanes), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (G, lanes), 1)
        out_l = jax.lax.broadcasted_iota(jnp.int32, (128, lanes), 0)

        def _visit(offr, nxtr, tlo, thn, acc):
            covers = nxtr > offr
            t = offr - w0
            m = covers & (t >= 0) & (t < WIN)
            ts = jnp.where(m, t >> 7, -1)
            tl = jnp.where(m, t & 127, -1)
            planes = [((tlo & 0xFF) + 1).astype(jnp.float32),
                      ((tlo >> 8) & 0xFF).astype(jnp.float32),
                      ((tlo >> 16) & 0xFF).astype(jnp.float32),
                      ((tlo >> 24) & 0xFF).astype(jnp.float32),
                      (thn & 0xFF).astype(jnp.float32),
                      ((thn >> 8) & 0xFF).astype(jnp.float32)]
            hot = ts == stripe_ids
            a = jnp.concatenate(
                [jnp.where(hot, p, 0.0) for p in planes], axis=0)
            bm_t = (out_l == tl).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                a, bm_t, (((1,), (1,)), ((), ())),
                precision="default", preferred_element_type=jnp.float32)

        def group_plain(g, acc):
            g0 = g * G
            offg = off_buf[slot, pl.ds(g0, G + 1), :]
            tlog = pltpu.bitcast(tlo_buf[slot, pl.ds(g0, G), :], jnp.int32)
            thng = pltpu.bitcast(thn_buf[slot, pl.ds(g0, G), :], jnp.int32)
            rolled = pltpu.roll(offg, lanes - 1, axis=1)
            for k in range(G):
                nxtr = jnp.where(lane_i[0:1] < lanes - 1,
                                 rolled[k:k + 1], rolled[k + 1:k + 2])
                acc = _visit(offg[k:k + 1], nxtr, tlog[k:k + 1],
                             thng[k:k + 1], acc)
            return acc

        def group_hoist(g, acc):
            g0 = g * G
            offg = off_buf[slot, pl.ds(g0, G + 1), :]
            tlog = pltpu.bitcast(tlo_buf[slot, pl.ds(g0, G), :], jnp.int32)
            thng = pltpu.bitcast(thn_buf[slot, pl.ds(g0, G), :], jnp.int32)
            rolled = pltpu.roll(offg, lanes - 1, axis=1)
            off_all = offg[:G]
            nxt_all = jnp.where(lane_i < lanes - 1, rolled[:G], rolled[1:])
            covers = nxt_all > off_all
            t = off_all - w0
            m = covers & (t >= 0) & (t < WIN)
            ts_all = jnp.where(m, t >> 7, -1)
            tl_all = jnp.where(m, t & 127, -1)
            p0 = ((tlog & 0xFF) + 1).astype(jnp.float32)
            p1 = ((tlog >> 8) & 0xFF).astype(jnp.float32)
            p2 = ((tlog >> 16) & 0xFF).astype(jnp.float32)
            p3 = ((tlog >> 24) & 0xFF).astype(jnp.float32)
            p4 = (thng & 0xFF).astype(jnp.float32)
            p5 = ((thng >> 8) & 0xFF).astype(jnp.float32)
            for k in range(G):
                hot = ts_all[k:k + 1] == stripe_ids
                a = jnp.concatenate(
                    [jnp.where(hot, p[k:k + 1], 0.0)
                     for p in (p0, p1, p2, p3, p4, p5)], axis=0)
                bm_t = (out_l == tl_all[k:k + 1]).astype(jnp.float32)
                acc = acc + jax.lax.dot_general(
                    a, bm_t, (((1,), (1,)), ((), ())),
                    precision="default",
                    preferred_element_type=jnp.float32)
            return acc

        acc = jnp.zeros((6 * SW, 128), jnp.float32)
        acc = jax.lax.fori_loop(
            0, ngroups, group_hoist if hoist else group_plain, acc)

        p = [acc[k * SW:(k + 1) * SW].astype(jnp.int32) for k in range(6)]
        flag = (p[0] != 0).astype(jnp.int32)
        h0 = (p[0] - flag) | (p[1] << 8)
        h1 = p[2] | (p[3] << 8)
        h2 = p[4] | (p[5] << 8)
        d = jnp.zeros((SW, 128), jnp.int32)

        for k in (1, 2, 4):
            take = flag == 0
            h0 = jnp.where(take, _flat_shift(h0, k), h0)
            h1 = jnp.where(take, _flat_shift(h1, k), h1)
            h2 = jnp.where(take, _flat_shift(h2, k), h2)
            d = jnp.where(take, _flat_shift(d, k) + k, d)
            flag = flag | _flat_shift(flag, k)

        flatpos = stripe_ids[:, :128] * 128 + jax.lax.broadcasted_iota(
            jnp.int32, (SW, 128), 1)
        filled = flag != 0
        fh0 = jnp.where(filled, h0, carry_ref[0])
        fh1 = jnp.where(filled, h1, carry_ref[1])
        fh2 = jnp.where(filled, h2, carry_ref[2])
        fd = jnp.where(filled, d, jnp.minimum(carry_ref[3] + 1 + flatpos, 8))

        carry_ref[0] = fh0[SW - 1, 127]
        carry_ref[1] = fh1[SW - 1, 127]
        carry_ref[2] = fh2[SW - 1, 127]
        carry_ref[3] = jnp.minimum(fd[SW - 1, 127], 8)

        dc = jnp.minimum(fd, 7)
        hi = dc >> 1
        half = jnp.where(hi == 0, fh0, jnp.where(hi == 1, fh1,
                         jnp.where(hi == 2, fh2, 0)))
        out_ref[0] = (half >> (8 * (dc & 1))) & 0xFF

    return kernel


@partial(jax.jit, static_argnames=("out_cap", "lanes", "hoist", "interpret"))
def emit_wide(off, tlo, thn, base_step, out_cap: int, lanes: int = 256,
              hoist: bool = True, interpret: bool | None = None):
    """emit_bytes over ``lanes``-wide candidate slabs (drop-in semantics).

    base_step must be produced by window_base_rows_w(off, out_cap, lanes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, c = off.shape
    assert out_cap % WIN == 0
    nsteps = out_cap // WIN
    assert base_step.shape == (b, nsteps + 1)

    tranche = max(2048 // lanes, 8)
    lenr = 5 * WIN // lanes // 4 + 16  # >= WIN/lanes rows can write a window
    fetch_pad = 8
    lenr_buf = -(-(lenr + fetch_pad) // tranche) * tranche

    pad_c = (-c) % lanes
    if pad_c:
        off = jnp.pad(off, ((0, 0), (0, pad_c)),
                      constant_values=out_cap + WIN)
        tlo = jnp.pad(tlo, ((0, 0), (0, pad_c)))
        thn = jnp.pad(thn, ((0, 0), (0, pad_c)))
        c += pad_c
    cr = c // lanes
    pad_r = lenr_buf + tranche
    off3 = jnp.pad(off.reshape(b, cr, lanes), ((0, 0), (0, pad_r), (0, 0)),
                   constant_values=out_cap + WIN)
    tlo3 = jnp.pad(tlo.reshape(b, cr, lanes), ((0, 0), (0, pad_r), (0, 0)))
    thn3 = jnp.pad(thn.reshape(b, cr, lanes), ((0, 0), (0, pad_r), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nsteps),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, SW, 128), lambda i, j, ref: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, lenr_buf, lanes), jnp.int32),
            pltpu.VMEM((2, lenr_buf, lanes), jnp.uint32),
            pltpu.VMEM((2, lenr_buf, lanes), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SMEM((4,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        make_wide_kernel(lanes, hoist, lenr, fetch_pad, tranche),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, out_cap // 128, 128), jnp.int32),
        interpret=interpret,
    )(base_step, off3, tlo3, thn3)
    return out.reshape(b, out_cap)


def window_base_rows_w(off, out_cap: int, lanes: int):
    nwin = out_cap // WIN
    pad_c = (-off.shape[1]) % lanes
    if pad_c:
        off = jnp.pad(off, ((0, 0), (0, pad_c)),
                      constant_values=out_cap + WIN)
    lastoff = off[:, lanes - 1::lanes]
    bounds = (jnp.arange(nwin + 1, dtype=jnp.int32) * WIN)[None, None, :]
    return jnp.sum((lastoff[:, :, None] < bounds).astype(jnp.int32), axis=1)


def gen_inputs(rng, b, c, fill=0.75):
    """Random compacted chunk rows mimicking ops/encode.py's emit input:
    strictly increasing off on real rows (1..6 bytes each), a sentinel
    row after the last real chunk, flat padding beyond."""
    nreal = int(c * fill) - 2
    nb = rng.integers(1, 7, (b, c))
    off = 14 + np.cumsum(nb, axis=1) - nb
    sent = off[:, nreal]  # sentinel: one past the last real chunk's end
    off[:, nreal:] = sent[:, None]
    tlo = rng.integers(0, 1 << 32, (b, c), dtype=np.uint64).astype(np.uint32)
    thn = rng.integers(0, 1 << 16, (b, c), dtype=np.uint64).astype(np.uint32)
    out_cap = -(-int(off.max() + 8) // WIN) * WIN
    return (jnp.asarray(off, jnp.int32), jnp.asarray(tlo),
            jnp.asarray(thn), out_cap)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 17)
    ap.add_argument("-b", type=int, default=8)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--parity-only", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon site hook pins "
                         "JAX_PLATFORMS; env vars do not override it)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    off, tlo, thn, out_cap = gen_inputs(rng, args.b, args.rows)
    nwin = args.b * out_cap // WIN

    base128 = EK.window_base_rows(off, out_cap)
    ref = np.asarray(EK.emit_bytes(off, tlo, thn, base128, out_cap=out_cap))

    variants = [
        ("wide256", dict(lanes=256, hoist=False)),
        ("wide256+hoist", dict(lanes=256, hoist=True)),
        ("wide512+hoist", dict(lanes=512, hoist=True)),
        ("128+hoist", dict(lanes=128, hoist=True)),
    ]
    for name, kw in variants:
        try:
            base = window_base_rows_w(off, out_cap, kw["lanes"])
            got = np.asarray(emit_wide(off, tlo, thn, base, out_cap, **kw))
        except Exception as e:  # one Mosaic rejection must not kill the run
            print(f"{name:>20}: ERROR {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}")
            continue
        ok = np.array_equal(got, ref)
        print(f"{name:>20}: parity {'OK' if ok else 'FAIL'}")
        if not ok:
            continue
        if on_tpu and not args.parity_only:
            t = device_time_ms(
                lambda kw=kw, base=base: emit_wide(
                    off, tlo, thn, base, out_cap, **kw), runs=args.runs)
            print(f"{'':>20}  {t:6.2f} ms ({t / nwin * 1e3:5.2f} us/win)")
    if on_tpu and not args.parity_only:
        t0 = device_time_ms(
            lambda: EK.emit_bytes(off, tlo, thn, base128, out_cap=out_cap),
            runs=args.runs)
        print(f"{'production base':>20}  {t0:6.2f} ms "
              f"({t0 / nwin * 1e3:5.2f} us/win)")


if __name__ == "__main__":
    main()
