#!/usr/bin/env python
"""Place-kernel WIDE experiment: 2 byte-row slabs per visit (256 lanes).

The round-4 roofline note (BASELINE.md) pins batched decode at a per-slab
ISSUE floor of ~200 ns per 128-row slab visit: every variant that cut MXU
or fill work while keeping slab count measured neutral-or-worse, and the
one change that cut slab VISITS (whole-group loops) gained 24%.  This
experiment attacks the visit count directly, two ways:

  * ``wide``: candidate rows stream through the kernel as 256-LANE slabs
    (pb/emit HBM planes reshaped (B, Q/256, 256)), so one mask+one-hot+dot
    visit covers TWO production slabs.  The dot contracts 256 candidate
    lanes against the same (128, lanes) out-lane one-hot — acc stays
    (4*SW, 128); per-visit VPU element count doubles but per-op issue
    overhead is paid half as often.
  * ``hoist``: the per-row mask/plane arithmetic (covers/t/m/ts/tl + the
    four byte planes) moves OUT of the per-row loop onto whole
    (G, lanes) group arrays, sliced per row with static sublane slices
    (cheap, unlike lane-broadcasts).  Applies at both widths.

Alignment landmine dodged (CLAUDE.md: dynamic sublane offsets on
>128-lane arrays must be provably 8-aligned): group loads start at
``g*8`` from buffer row 0 — provably aligned — instead of the
production kernel's ``lr + g*8``.  The <= 7 leading slabs belong to
earlier windows (their pb < w0: base_step counts slabs whose LAST pb is
below the window start, and pb is nondecreasing), so the in-window mask
zeroes them exactly; the cost is at most one extra group per window.

Exactness: identical placement algebra to ops/place_kernel.py (reference
semantics source/simple.cpp:111-170); parity is asserted against the
production kernel on every variant before any timing.

Status: CPU-exact (interpret-mode parity green); CHIP TIMING PENDING —
queued behind the docs/BACKLOG.md outage list.  Lands in
ops/place_kernel.py only if the chip timing wins AND parity holds on
chip at production shapes.
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

from qoipp_tpu.ops import place_kernel as PK
from qoipp_tpu.ops.place_kernel import WIN, SW, _flat_shift
from qoipp_tpu.utils.timing import enable_compile_cache, device_time_ms


def make_wide_kernel(lanes: int, hoist: bool, lenr: int, fetch_pad: int,
                     tranche: int, lenr_buf: int):
    """Place+fill kernel over ``lanes``-wide candidate slabs."""
    G = 8

    def kernel(base_ref, pb_hbm, emit_hbm, out_ref,
               pb_buf, em_buf, sems, carry_ref):
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

        def xfer(op, slot, bb, ss):
            ba, _, need = _span(bb, ss)
            ntr = (need + tranche - 1) // tranche

            def tr(t, _):
                op(pb_hbm.at[bb, pl.ds(ba + t * tranche, tranche), :],
                   pb_buf.at[slot, pl.ds(t * tranche, tranche)],
                   sems.at[slot, 0])
                op(emit_hbm.at[bb, pl.ds(ba + t * tranche, tranche), :],
                   em_buf.at[slot, pl.ds(t * tranche, tranche)],
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
            issue(slot, b, s)

        wait(slot, b, s)

        @pl.when(s + 1 < nsteps)
        def _prefetch():
            issue(1 - slot, b, s + 1)

        w0 = s * WIN
        _, lr, _ = _span(b, s)
        n = jnp.minimum(base_ref[b, s + 1] - base_ref[b, s] + 1,
                        lenr - 1 - lr)
        # groups start at provably-aligned g*8 (row 0 of the buffer); the
        # lr leading slabs are pre-window rows the mask kills exactly.
        ngroups = (lr + n + G - 1) // G

        stripe_ids = jax.lax.broadcasted_iota(jnp.int32, (SW, lanes), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (G, lanes), 1)
        out_l = jax.lax.broadcasted_iota(jnp.int32, (128, lanes), 0)

        def _visit(pbr, nxtr, vr, acc):
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
            return acc + jax.lax.dot_general(
                a, bm_t, (((1,), (1,)), ((), ())),
                precision="default", preferred_element_type=jnp.float32)

        def group_plain(g, acc):
            g0 = g * G
            pbg = pb_buf[slot, pl.ds(g0, G + 1), :]
            emg = pltpu.bitcast(em_buf[slot, pl.ds(g0, G), :], jnp.int32)
            rolled = pltpu.roll(pbg, lanes - 1, axis=1)
            for k in range(G):
                nxtr = jnp.where(lane_i[0:1] < lanes - 1,
                                 rolled[k:k + 1], rolled[k + 1:k + 2])
                acc = _visit(pbg[k:k + 1], nxtr, emg[k:k + 1], acc)
            return acc

        def group_hoist(g, acc):
            g0 = g * G
            pbg = pb_buf[slot, pl.ds(g0, G + 1), :]
            emg = pltpu.bitcast(em_buf[slot, pl.ds(g0, G), :], jnp.int32)
            rolled = pltpu.roll(pbg, lanes - 1, axis=1)
            # whole-group mask/plane arithmetic: (G, lanes) ops once,
            # static sublane slices per row below
            pb_all = pbg[:G]
            nxt_all = jnp.where(lane_i < lanes - 1, rolled[:G], rolled[1:])
            covers = nxt_all > pb_all
            t = pb_all - w0
            m = covers & (t >= 0) & (t < WIN)
            ts_all = jnp.where(m, t >> 7, -1)
            tl_all = jnp.where(m, t & 127, -1)
            p0 = ((emg & 0xFF) + 1).astype(jnp.float32)
            p1 = ((emg >> 8) & 0xFF).astype(jnp.float32)
            p2 = ((emg >> 16) & 0xFF).astype(jnp.float32)
            p3 = ((emg >> 24) & 0xFF).astype(jnp.float32)
            for k in range(G):
                hot = ts_all[k:k + 1] == stripe_ids
                a = jnp.concatenate(
                    [jnp.where(hot, p[k:k + 1], 0.0)
                     for p in (p0, p1, p2, p3)], axis=0)
                bm_t = (out_l == tl_all[k:k + 1]).astype(jnp.float32)
                acc = acc + jax.lax.dot_general(
                    a, bm_t, (((1,), (1,)), ((), ())),
                    precision="default",
                    preferred_element_type=jnp.float32)
            return acc

        acc = jnp.zeros((4 * SW, 128), jnp.float32)
        acc = jax.lax.fori_loop(
            0, ngroups, group_hoist if hoist else group_plain, acc)

        b0f = acc[:SW].astype(jnp.int32)
        b1f = acc[SW:2 * SW].astype(jnp.int32)
        b2f = acc[2 * SW:3 * SW].astype(jnp.int32)
        b3f = acc[3 * SW:].astype(jnp.int32)
        flag = (b0f != 0).astype(jnp.int32)
        word = (b0f - flag) | (b1f << 8) | (b2f << 16) | (b3f << 24)

        for k in (1, 2, 4, 8, 16, 32):
            word = jnp.where(flag != 0, word, _flat_shift(word, k))
            flag = flag | _flat_shift(flag, k)

        merged = jnp.where(flag != 0, word, carry_ref[0])
        carry_ref[0] = merged[SW - 1, 127]
        out_ref[0] = pltpu.bitcast(merged, jnp.uint32)

    return kernel


@partial(jax.jit, static_argnames=("n_cap", "lanes", "hoist", "interpret"))
def place_wide(pb, emits, base_step, n_cap: int, lanes: int = 256,
               hoist: bool = True, interpret: bool | None = None):
    """place_fill over ``lanes``-wide candidate slabs (drop-in semantics).

    base_step must be produced by window_base_rows_w(pb, n_cap, lanes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, q = pb.shape
    assert n_cap % WIN == 0
    nsteps = n_cap // WIN
    assert base_step.shape == (b, nsteps + 1)

    tranche = max(2048 // lanes, 8)          # ~same bytes/tranche as prod
    lenr = 5 * WIN // lanes + 16
    fetch_pad = 8
    lenr_buf = -(-(lenr + fetch_pad) // tranche) * tranche

    pad_q = (-q) % lanes
    if pad_q:
        pb = jnp.pad(pb, ((0, 0), (0, pad_q)), constant_values=n_cap)
        emits = jnp.pad(emits, ((0, 0), (0, pad_q)))
        q += pad_q
    qr = q // lanes
    pad_r = lenr_buf + tranche
    pb3 = jnp.pad(pb.reshape(b, qr, lanes), ((0, 0), (0, pad_r), (0, 0)),
                  constant_values=n_cap)
    em3 = jnp.pad(emits.reshape(b, qr, lanes), ((0, 0), (0, pad_r), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nsteps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, SW, 128), lambda i, j, ref: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, lenr_buf, lanes), jnp.int32),
            pltpu.VMEM((2, lenr_buf, lanes), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        make_wide_kernel(lanes, hoist, lenr, fetch_pad, tranche, lenr_buf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_cap // 128, 128), jnp.uint32),
        interpret=interpret,
    )(base_step, pb3, em3)
    return out.reshape(b, n_cap)


def window_base_rows_w(pb, n_cap: int, lanes: int):
    """window_base_rows in ``lanes``-row slab units."""
    nwin = n_cap // WIN
    pad_q = (-pb.shape[1]) % lanes
    if pad_q:
        pb = jnp.pad(pb, ((0, 0), (0, pad_q)), constant_values=n_cap)
    lastpb = pb[:, lanes - 1::lanes]
    bounds = (jnp.arange(nwin + 1, dtype=jnp.int32) * WIN)[None, None, :]
    return jnp.sum((lastpb[:, :, None] < bounds).astype(jnp.int32), axis=1)


def gen_inputs(rng, b, q, density=0.40, run_p=0.002):
    inc = np.zeros((b, q), np.int64)
    r = rng.random((b, q))
    inc[r < density] = 1
    runs = r < run_p
    inc[runs] = rng.integers(5, 63, runs.sum())
    pb = np.cumsum(inc, axis=1) - inc
    n_cap = -(-int(pb.max() + 70) // WIN) * WIN
    emits = rng.integers(0, 1 << 32, (b, q), dtype=np.uint64).astype(
        np.uint32)
    return (jnp.asarray(pb, jnp.int32), jnp.asarray(emits), n_cap)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 19)
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
    pbj, emj, n_cap = gen_inputs(rng, args.b, args.rows)
    nwin = args.b * n_cap // WIN

    base128 = PK.window_base_rows(pbj, n_cap)
    ref = np.asarray(PK.place_fill(pbj, emj, base128, n_cap=n_cap))

    variants = [
        ("wide256", dict(lanes=256, hoist=False)),
        ("wide256+hoist", dict(lanes=256, hoist=True)),
        ("wide512+hoist", dict(lanes=512, hoist=True)),
        ("128+hoist", dict(lanes=128, hoist=True)),
        ("128 aligned-groups", dict(lanes=128, hoist=False)),
    ]
    for name, kw in variants:
        try:
            base = window_base_rows_w(pbj, n_cap, kw["lanes"])
            got = np.asarray(place_wide(pbj, emj, base, n_cap, **kw))
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
                lambda kw=kw, base=base: place_wide(
                    pbj, emj, base, n_cap, **kw), runs=args.runs)
            nslab = args.b * pbj.shape[1] // 128
            print(f"{'':>20}  {t:6.2f} ms  ({t / nwin * 1e3:5.2f} us/win, "
                  f"{t * 1e6 / nslab:5.1f} ns per 128 rows)")
    if on_tpu and not args.parity_only:
        t0 = device_time_ms(
            lambda: PK.place_fill(pbj, emj, base128, n_cap=n_cap),
            runs=args.runs)
        print(f"{'production base':>20}  {t0:6.2f} ms "
              f"({t0 / nwin * 1e3:5.2f} us/win)")


if __name__ == "__main__":
    main()
