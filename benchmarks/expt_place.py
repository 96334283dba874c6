#!/usr/bin/env python
"""Variant timing experiments for the place_fill kernel (round-2 tuning)."""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/qoipp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from qoipp_tpu.utils.timing import device_time_ms


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_variant(WIN, G, precision, fuse_dot, emit_whole,
                 lr_mode="cnt", static_inputs=False):
    # lr_mode: "cnt" in-kernel count; "static" lr=0 (wrong results, timing
    # only); "smem" per-window offsets from the scalar-prefetch array
    SW = WIN // 128
    CBR = WIN // 128 + 2
    LENR = G * SW + 16

    def kernel(bstep_ref, pb_ref, emit_ref, out_ref, carry_ref):
        b = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            carry_ref[0] = 0

        if lr_mode == "smem":
            # block-relative offset of each window's first candidate slab
            base0 = ((bstep_ref[b, s * G].astype(jnp.int32) // 8) * 8)
        else:
            base0 = 0  # cnt/dyn/static compute lr from the loaded block
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        stripe_ids = jax.lax.broadcasted_iota(jnp.int32, (SW, 128), 0)

        pb_full = pb_ref[0]  # (LENR, 128) static read
        last_pb = pb_full[:, 127:128]  # (LENR, 1)

        sec = []
        for g in range(G):
            w0 = (s * G + g) * WIN
            if lr_mode in ("cnt", "dyn"):
                lr = jnp.sum((last_pb < w0).astype(jnp.int32))
            elif lr_mode == "static":
                lr = 0
            else:  # smem: full per-window array prefetched
                lr = bstep_ref[b, s * G + g].astype(jnp.int32) - base0
            pb_g = pb_ref[0, pl.ds(lr, CBR), :]
            t = pb_g - w0
            mask = (t >= 0) & (t < WIN)
            ts = jnp.where(mask, t >> 7, -1)
            tl = jnp.where(mask, t & 127, -1)

            if emit_whole:
                vg = pltpu.bitcast(emit_ref[0, pl.ds(lr, CBR), :], jnp.int32)

            if lr_mode == "dyn":
                # visit only the slabs that actually intersect the window
                first_pb = pb_full[:, 0:1]
                n_slabs = jnp.sum(
                    ((first_pb < w0 + WIN) & (last_pb >= w0)).astype(jnp.int32)
                ) + 1

                def body(rr, acc):
                    pbr = pb_ref[0, pl.ds(lr + rr, 1), :]
                    vr = pltpu.bitcast(
                        emit_ref[0, pl.ds(lr + rr, 1), :], jnp.int32)
                    tr = pbr - w0
                    mr = (tr >= 0) & (tr < WIN)
                    tsr = jnp.where(mr, tr >> 7, -1)
                    tlr = jnp.where(mr, tr & 127, -1)
                    lo = (vr & 0xFFFF).astype(jnp.float32)
                    hi = ((vr >> 16) & 0xFFFF).astype(jnp.float32)
                    hot = tsr == stripe_ids
                    a = jnp.concatenate(
                        [jnp.where(hot, lo, 0.0), jnp.where(hot, hi, 0.0),
                         jnp.where(hot, 1.0, 0.0)], axis=0)
                    bm = (tlr[0][:, None] == lanes[:128]).astype(jnp.float32)
                    return acc + jax.lax.dot(
                        a, bm, precision=precision,
                        preferred_element_type=jnp.float32)

                acc = jax.lax.fori_loop(
                    0, n_slabs, body, jnp.zeros((3 * SW, 128), jnp.float32))
                sec.append(acc)
                continue

            if fuse_dot:
                lo = (vg & 0xFFFF).astype(jnp.float32)
                hi = ((vg >> 16) & 0xFFFF).astype(jnp.float32)
                hot = ts[None] == stripe_ids[:, :1].reshape(SW, 1, 1)
                a = jnp.concatenate(
                    [jnp.where(hot, lo[None], 0.0),
                     jnp.where(hot, hi[None], 0.0),
                     jnp.where(hot, 1.0, 0.0)], axis=0)  # (3SW, CBR, 128)
                bmat = (tl[:, :, None] == lanes[None, :1, :]).astype(
                    jnp.float32)  # (CBR, 128, 128)
                acc = jax.lax.dot_general(
                    a, bmat, (((1, 2), (0, 1)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32)
            else:
                acc = jnp.zeros((3 * SW, 128), jnp.float32)
                for rr in range(CBR):
                    if emit_whole:
                        vr = vg[rr][None, :]
                    else:
                        vr = pltpu.bitcast(
                            emit_ref[0, pl.ds(lr + rr, 1), :], jnp.int32)
                    lo = (vr & 0xFFFF).astype(jnp.float32)
                    hi = ((vr >> 16) & 0xFFFF).astype(jnp.float32)
                    hot = ts[rr][None, :] == stripe_ids
                    a = jnp.concatenate(
                        [jnp.where(hot, lo, 0.0), jnp.where(hot, hi, 0.0),
                         jnp.where(hot, 1.0, 0.0)], axis=0)
                    bmat = (tl[rr][:, None] == lanes[:128]).astype(jnp.float32)
                    acc = acc + jax.lax.dot(
                        a, bmat, precision=precision,
                        preferred_element_type=jnp.float32)
            sec.append(acc)

        lo_f = jnp.concatenate([x[:SW] for x in sec], axis=0)
        hi_f = jnp.concatenate([x[SW:2 * SW] for x in sec], axis=0)
        fl_f = jnp.concatenate([x[2 * SW:] for x in sec], axis=0)
        word = lo_f.astype(jnp.int32) | (hi_f.astype(jnp.int32) << 16)
        flag = (fl_f > 0.5).astype(jnp.int32)
        for k in (1, 2, 4, 8, 16, 32):
            wsh_r = pltpu.roll(word, k, axis=1)
            wsh = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, word.shape, 1) >= k,
                wsh_r,
                jnp.concatenate([jnp.zeros((1, 128), word.dtype),
                                 wsh_r[:-1]], 0))
            fsh_r = pltpu.roll(flag, k, axis=1)
            fsh = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, flag.shape, 1) >= k,
                fsh_r,
                jnp.concatenate([jnp.zeros((1, 128), flag.dtype),
                                 fsh_r[:-1]], 0))
            word = jnp.where(flag != 0, word, wsh)
            flag = flag | fsh
        carry = carry_ref[0]
        merged = jnp.where(flag != 0, word, carry)
        carry_ref[0] = merged[G * SW - 1, 127]
        out_ref[0] = pltpu.bitcast(merged, jnp.uint32)

    @partial(jax.jit, static_argnames=())
    def run(pb_c, emit_c, base_step, n_cap=2088960):
        b, cap = pb_c.shape
        nwin = n_cap // WIN
        nsteps = nwin // G
        capr = cap // 128
        pad_r = LENR + 2
        pb3 = jnp.pad(pb_c.reshape(b, capr, 128),
                      ((0, 0), (0, pad_r), (0, 0)), constant_values=n_cap)
        em3 = jnp.pad(emit_c.reshape(b, capr, 128),
                      ((0, 0), (0, pad_r), (0, 0)))
        if lr_mode == "smem":
            imap = lambda i, j, ref: ((i, ((ref[i, j * G] // 8) * 8)
                                       .astype(jnp.int32), 0))
        else:
            imap = lambda i, j, ref: (i, (ref[i, j] // 8) * 8, 0)
        if static_inputs:
            in_specs = [
                pl.BlockSpec((1, LENR, 128), lambda i, j, ref: (i, 0, 0)),
                pl.BlockSpec((1, LENR, 128), lambda i, j, ref: (i, 0, 0)),
            ]
        else:
            bufmode = pl.Buffered(buffer_count=2, use_lookahead=False)
            in_specs = [
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(LENR), pl.Element(128)), imap,
                    pipeline_mode=bufmode),
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(LENR), pl.Element(128)), imap,
                    pipeline_mode=bufmode),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nsteps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, G * SW, 128),
                                   lambda i, j, ref: (i, j, 0)),
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, n_cap // 128, 128), jnp.uint32),
        )(base_step, pb3, em3)

    return run


def main():
    rng = np.random.default_rng(0)
    B, n_cap, cap = 128, 2088960, 286720
    pb = np.full((B, cap), n_cap, np.int32)
    em = np.zeros((B, cap), np.uint32)
    counts = np.zeros(B, np.int32)
    for b in range(B):
        produced = rng.choice([1, 1, 1, 1, 2, 3, 5, 17, 62], size=250000)
        pos = np.concatenate([[0], np.cumsum(produced)[:-1]])
        c = int(np.searchsorted(pos, n_cap))
        pb[b, :c] = pos[:c]
        em[b, :c] = rng.integers(0, 2**32, c, dtype=np.uint64).astype(np.uint32)
        counts[b] = c
    pbj, emj = jnp.asarray(pb), jnp.asarray(em)

    HI = jax.lax.Precision.HIGHEST
    variants = [
        ("W8192,G1 dyn STATIC-IN (timing)", 8192, 1, HI, False, True, "dyn",
         True),
        ("W8192,G1 dyn elem-in", 8192, 1, HI, False, True, "dyn", False),
    ]
    # reference output for exactness spot check
    want = {}
    for b in (0, 127):
        c = counts[b]
        w = np.zeros(n_cap, np.uint32)
        idx = pb[b, :c]
        w[idx] = em[b, :c]
        flag = np.zeros(n_cap, bool); flag[idx] = True
        last = np.maximum.accumulate(np.where(flag, np.arange(n_cap), -1))
        want[b] = np.where(last >= 0, w[np.maximum(last, 0)], 0)

    for name, WINv, Gv, prec, fuse, whole, lrm, *rest in variants:
        stat_in = rest[0] if rest else False
        lastpb = pb[:, 127::128]
        if lrm == "smem":
            nwin = n_cap // WINv
            bounds = (np.arange(nwin) * WINv)[None, None, :]
            dt = np.int16 if (128 * nwin * 4) > (1 << 20) - 65536 else np.int32
            base_step = jnp.asarray(
                np.sum(lastpb[:, :, None] < bounds, axis=1).astype(dt))
        else:
            nsteps = n_cap // WINv // Gv
            bounds = (np.arange(nsteps) * (Gv * WINv))[None, None, :]
            base_step = jnp.asarray(
                np.sum(lastpb[:, :, None] < bounds, axis=1).astype(np.int32))
        try:
            run = make_variant(WINv, Gv, prec, fuse, whole, lrm, stat_in)
            out = jax.block_until_ready(run(pbj, emj, base_step))
            ok = all(
                np.array_equal(np.asarray(out[b]).reshape(-1), want[b])
                for b in (0, 127))
            t = device_time_ms(lambda: run(pbj, emj, base_step), runs=6)
            log(f"[{name}] {t:.1f} ms  exact={ok}")
        except Exception as e:
            log(f"[{name}] FAILED: {type(e).__name__} {str(e)[:160]}")


if __name__ == "__main__":
    main()
