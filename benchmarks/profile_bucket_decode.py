#!/usr/bin/env python
"""Stage breakdown of the batched decode on the REAL over-cap photos —
the bucketed engine is the serving decode's dominant cost (round-3
dispatch profile: ~1.5-2 s of the composite's 1.4 s+ serve time).

Groups the over-cap corpus images by geometry exactly like ServingCodec,
then times cumulative prefixes of BatchPipeline._decode_impl per group:
boundary -> fields -> replay -> place.
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

    from qoipp_tpu.models.pipeline import BatchPipeline
    from qoipp_tpu.models.scheduler import _pad_b
    from qoipp_tpu.ops import boundary, decode as dec_ops
    from qoipp_tpu.ops import place_kernel, replay_kernel as rk
    from qoipp_tpu.utils.timing import enable_compile_cache, device_time_ms
    import local_corpus

    enable_compile_cache()
    items = local_corpus.build()
    cap = 256 << 10
    big = [(np.fromfile(p, np.uint8), d) for _, _, _, d, p in items
           if Path(p).stat().st_size - 22 > cap]
    rep = 8
    by_geom = {}
    for a, d in big:
        by_geom.setdefault((d.width, d.height, int(d.channels)),
                           []).append((a, d))
    print(f"{len(big)} over-cap images x{rep}, {len(by_geom)} geometries",
          file=sys.stderr)

    for key, group in by_geom.items():
        w, h, ch = key
        blobs = [a for a, _ in group] * rep
        d0 = group[0][1]
        bp = _pad_b(len(blobs))
        pipe = BatchPipeline(d0, max_stream_len=max(b.size for b in blobs))
        blobs_p = blobs + [blobs[0][:14]] * (bp - len(blobs))
        streams_np, sizes_np = pipe.pack_streams(blobs_p)
        streams = jnp.asarray(streams_np)
        sizes = jnp.asarray(sizes_np)
        qb, n_px, n_cap = pipe.qb, pipe.n_px, pipe.n_cap
        npx_tot = n_px * len(blobs)

        def st_boundary(streams, sizes):
            regions = streams[:, 14:]
            q = jnp.arange(regions.shape[1], dtype=jnp.int32)[None, :]
            regions = jnp.where(q < (sizes - 14)[:, None], regions, 0)
            info = boundary.analyze_region_batch(
                regions[:, :qb], sizes - 22, jnp.int32(n_px))
            return regions, info["real"], info["pix_before"]

        def st_fields(streams, sizes):
            regions, real, pix_before = st_boundary(streams, sizes)
            meta, val = dec_ops.fields_dense_batch(regions, real)
            return meta, val, pix_before

        def st_replay(streams, sizes):
            meta, val, pix_before = st_fields(streams, sizes)
            b = meta.shape[0]
            bpad, qpad = (-b) % 8, (-qb) % 512
            meta_t = jnp.pad(meta, ((0, bpad), (0, qpad))).T
            val_t = jnp.pad(val, ((0, bpad), (0, qpad))).T
            emits = rk.replay_batch(meta_t, val_t).T[:b, :qb]
            return emits, pix_before

        def st_full(streams, sizes):
            return pipe._decode(streams, sizes)

        line = [f"{w}x{h} ch{ch} B={len(blobs)}(pad {bp}) qb={qb>>10}K"]
        for name, fn in [("boundary", st_boundary), ("fields", st_fields),
                         ("replay", st_replay), ("place", st_full)]:
            f = jax.jit(fn)
            t = device_time_ms(lambda: f(streams, sizes), runs=5)
            line.append(f"{name} {t:.0f}ms")
        line.append(f"-> {npx_tot/1e3/t:.0f} MPix/s")
        print("  ".join(line))


if __name__ == "__main__":
    main()
