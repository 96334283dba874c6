#!/usr/bin/env python
"""Lane-count sweep for the packed encoder on the real corpus.

The plan search's cost model assumes per-slot device cost is
lane-count-independent; the synthetic 32-row batch runs ~6x cheaper per
slot than the 12-lane real-corpus plan, so measure the actual cost(L)
curve to recalibrate the model.
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
    print(f"corpus: {len(raws)} streams, {total_px/1e6:.1f} MPix",
          file=sys.stderr, flush=True)

    for L in (8, 12, 16, 24, 32, 48, 64):
        enc = PackedEncoder(lane_px=512 << 10, lane_counts=[L])
        packed, flags, where, caps = enc.plan_and_pack(raws, descs)
        l, np_ = packed.shape
        pd = jnp.asarray(packed)
        fd = jnp.asarray(flags)

        def run():
            return E._encode_lanes_impl(
                pd, fd, caps["chunk_cap"], caps["out_cap"],
                caps["ends_cap"])

        r = jax.block_until_ready(run())
        retried = not bool(r[3].all())
        if retried:
            def run():
                return E._encode_lanes_impl(
                    pd, fd, caps["safe_chunk"], caps["safe_out"],
                    caps["ends_cap"])
            jax.block_until_ready(run())
        t = device_time_ms(run, runs=6)
        util = total_px / (l * np_)
        print(f"L={l:3d} np={np_>>10:5d}K ccap={caps['chunk_cap']>>10:4d}K "
              f"util={util:.2f} {'RETRY ' if retried else ''}"
              f"{t:7.1f} ms  ({total_px/t/1e3:.0f} MPix/s)", flush=True)


if __name__ == "__main__":
    main()
