#!/usr/bin/env python
"""Stage breakdown of the packed-lane decoder at the real-corpus shapes
(boundary -> fields -> replay -> place), mirroring profile_packed_encode.
"""

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=8)
    ap.add_argument("--lane-kb", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qoipp_tpu.models.packed import PackedDecoder
    from qoipp_tpu.ops import boundary, decode as dec_ops
    from qoipp_tpu.ops import place_kernel, replay_kernel as rk
    from qoipp_tpu.utils.timing import enable_compile_cache, device_time_ms
    import local_corpus

    enable_compile_cache()
    items = local_corpus.build()
    cap = args.lane_kb << 10
    blobs = [np.fromfile(p, np.uint8) for *_, p in items
             if Path(p).stat().st_size - 22 <= cap] * args.replicate
    descs = [d for _, _, _, d, p in items
             if Path(p).stat().st_size - 22 <= cap] * args.replicate
    total_px = sum(d.width * d.height for d in descs)

    dec = PackedDecoder(lane_bytes=cap)
    regions, seg, sizes, where, _, qb, n_cap, l_total = dec.plan_and_pack(blobs)
    L = l_total
    print(f"{L} lanes x {qb>>10}KB, n_cap {n_cap>>10}Kpx, "
          f"{total_px/1e6:.1f} MPix", file=sys.stderr)

    # stage fns want the full lane grid (this profiler measures device
    # stages, not transport, so pad on host)
    regions = np.pad(regions, ((0, l_total - regions.shape[0]), (0, 0)))
    regions_d = jnp.asarray(regions)
    seg_d = jnp.asarray(seg)
    sizes_d = jnp.asarray(sizes)

    def _flags(regions):
        f = jnp.zeros(l_total * qb, jnp.uint32).at[seg_d].set(
            1, indices_are_sorted=True, unique_indices=True)
        return f.reshape(l_total, qb)

    def st_boundary(regions, flags, sizes):
        return boundary.analyze_region_batch(
            regions[:, :qb], sizes, jnp.int32(0))

    def st_fields(regions, flags, sizes):
        info = st_boundary(regions, flags, sizes)
        meta, val = dec_ops.fields_dense_batch(regions, info["real"])
        meta = meta | (_flags(regions) << 9)
        return meta, val, info["pix_before"]

    def st_replay(regions, flags, sizes):
        meta, val, pix_before = st_fields(regions, flags, sizes)
        b = meta.shape[0]
        bpad, qpad = (-b) % 8, (-qb) % 512
        meta_t = jnp.pad(meta, ((0, bpad), (0, qpad))).T
        val_t = jnp.pad(val, ((0, bpad), (0, qpad))).T
        emits = rk.replay_batch(meta_t, val_t).T[:b, :qb]
        return emits, pix_before

    def st_full(regions, flags, sizes):
        from qoipp_tpu.models.packed import _decode_lanes
        return _decode_lanes(regions, seg_d, sizes, qb=qb, n_cap=n_cap,
                             l_total=l_total)

    for name, fn in [("boundary", st_boundary), ("fields", st_fields),
                     ("replay", st_replay), ("full", st_full)]:
        f = jax.jit(fn)
        t = device_time_ms(lambda: f(regions_d, seg_d, sizes_d), runs=5)
        print(f"{name:>9}: {t:7.1f} ms  ({total_px/t/1e3:.0f} MPix/s)")


if __name__ == "__main__":
    main()
