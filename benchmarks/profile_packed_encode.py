#!/usr/bin/env python
"""Stage breakdown of the packed-lane encoder at the real-corpus shapes.

Times cumulative prefixes of ops/encode._encode_lanes_impl so stage cost
= difference of consecutive prefixes (each prefix is one jit; the
returned arrays force materialization of that stage's outputs).
"""

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    import jax
    import jax.numpy as jnp

    from qoipp_tpu.models.packed import PackedEncoder
    from qoipp_tpu.ops import encode as E
    from qoipp_tpu.ops.bitops import hash6, unpack_channel, to_int8
    from qoipp_tpu.ops.compact_kernel import BLK as CBLK, compact_rows
    from qoipp_tpu.ops import emit_kernel
    from qoipp_tpu.utils.timing import enable_compile_cache, device_time_ms
    import local_corpus

    enable_compile_cache()
    items = local_corpus.build()
    raws, descs = [], []
    for _, _, raw, d, _ in items:
        if d.width * d.height <= (512 << 10) - 2:
            raws.append(raw)
            descs.append(d)
    raws = raws * 4
    descs = descs * 4
    total_px = sum(d.width * d.height for d in descs)

    enc = PackedEncoder(lane_px=512 << 10)
    packed, flags, where, caps = enc.plan_and_pack(raws, descs)
    L, Np = packed.shape
    chunk_cap, out_cap, ends_cap = (
        caps["chunk_cap"], caps["out_cap"], caps["ends_cap"])
    print(f"{L} lanes x {Np>>10}Kpx, chunk_cap {chunk_cap>>10}K, "
          f"out_cap {out_cap>>10}K, total {total_px/1e6:.1f} MPix",
          file=sys.stderr)

    packed_d = jnp.asarray(packed)
    flags_d = jnp.asarray(flags)

    def dense(packed, flags):
        l, np_ = packed.shape
        idx = jnp.broadcast_to(
            jnp.arange(np_, dtype=jnp.int32)[None, :], (l, np_))
        seg_start = (flags & E.FLAG_SEG_START) != 0
        t0_d = (flags & E.FLAG_TAIL0) != 0
        t1_d = (flags & E.FLAG_TAIL1) != 0
        valid = (flags & E.FLAG_VALID) != 0
        prev = jnp.concatenate(
            [jnp.full((l, 1), E.START_PIXEL_PACKED, jnp.uint32),
             packed[:, :-1]], axis=1)
        prev = jnp.where(seg_start, E.START_PIXEL_PACKED, prev)
        eq_raw = (packed == prev) & valid
        noneq = valid & ~eq_raw
        seg_base = jax.lax.cummax(jnp.where(seg_start, idx, 0), axis=1)
        last_brk = jnp.maximum(
            jax.lax.cummax(jnp.where(noneq, idx, -1), axis=1), seg_base - 1)
        cnt = idx - last_brk
        hit62 = eq_raw & (cnt % 62 == 0)
        trail_expr = jnp.where(eq_raw, cnt % 62, 0)
        trail_at = jnp.concatenate(
            [jnp.zeros((l, 1), jnp.int32), trail_expr[:, :-1]], axis=1)
        trail_at2 = jnp.concatenate(
            [jnp.zeros((l, 2), jnp.int32), trail_expr[:, :-2]], axis=1)
        trailing = jnp.where(t0_d, trail_at, jnp.where(t1_d, trail_at2, 0))
        has_trail_d = trailing > 0
        trail_byte_d = (E.TAG_RUN | ((trailing - 1) & 0x3F)).astype(jnp.uint32)
        packed_aug = jnp.where(
            t0_d, trail_byte_d | (has_trail_d.astype(jnp.uint32) << 8),
            jnp.where(t1_d, has_trail_d.astype(jnp.uint32) << 8, packed))
        posflag = (idx.astype(jnp.uint32)
                   | (t0_d.astype(jnp.uint32) << 26)
                   | (t1_d.astype(jnp.uint32) << 27)
                   | (noneq.astype(jnp.uint32) << 30))
        keep = noneq | hit62 | t0_d | t1_d
        return packed_aug, posflag, keep

    def compact(packed, flags):
        packed_aug, posflag, keep = dense(packed, flags)
        pad = (-packed.shape[1]) % CBLK
        if pad:
            packed_aug = jnp.pad(packed_aug, ((0, 0), (0, pad)))
            posflag = jnp.pad(posflag, ((0, 0), (0, pad)))
            keep = jnp.pad(keep, ((0, 0), (0, pad)))
        (pk_c, pf_c), counts = compact_rows(
            (packed_aug, posflag), keep, cap=chunk_cap)
        return pk_c, pf_c, counts

    def table(packed, flags):
        pk_c, pf_c, counts = compact(packed, flags)
        l = packed.shape[0]
        rows = jnp.arange(chunk_cap, dtype=jnp.int32)[None, :]
        valid_c = rows < counts[:, None]
        pk_c = jnp.where(valid_c, pk_c, 0)
        nq_c = valid_c & (((pf_c >> 30) & 1) == 1)
        t1 = valid_c & (((pf_c >> 27) & 1) == 1)
        t1_i = t1.astype(jnp.int32)
        seg_c = jnp.cumsum(t1_i, axis=1) - t1_i
        h = hash6(pk_c)
        tv = jax.vmap(E._last_same_hash_value_seg)(pk_c, h, nq_c, seg_c)
        return tv, counts

    def full(packed, flags):
        return E._encode_lanes_impl(packed, flags, chunk_cap, out_cap,
                                    ends_cap)

    for name, fn in [("dense", dense), ("compact", compact),
                     ("table", table), ("full", full)]:
        f = jax.jit(fn, static_argnames=())
        t = device_time_ms(lambda: f(packed_d, flags_d), runs=5)
        print(f"{name:>8}: {t:7.1f} ms  ({total_px/t/1e3:.0f} MPix/s)")


if __name__ == "__main__":
    main()
