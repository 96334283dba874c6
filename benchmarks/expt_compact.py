#!/usr/bin/env python
"""Micro-bench of ops/compact_kernel.compact_rows at the real-corpus
packed-encode shapes: BLK sweep + section-packing ablations.

Shapes mirror profile_packed_encode.py: L lanes x Np pixel rows,
nplanes=2 (packed_aug u32 / posflag 31-bit), keep density from the real
corpus (~0.5)."""

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    import jax.numpy as jnp

    from qoipp_tpu.ops.compact_kernel import compact_rows
    from qoipp_tpu.utils.timing import enable_compile_cache, device_time_ms

    enable_compile_cache()
    rng = np.random.default_rng(0)
    L, NP = 12, 896 << 10
    CAP = 448 << 10
    # keep density ~0.45 with runs (realistic clustering: runs of eq)
    keep = rng.random((L, NP)) < 0.45
    p0 = rng.integers(0, 1 << 32, (L, NP), dtype=np.uint32)
    # posflag analog: 24-bit values (21-bit index + 3 flag bits), the
    # quarters=(4,3) layout of ops/encode at packed-lane shapes
    p1 = rng.integers(0, 1 << 24, (L, NP), dtype=np.uint32)
    keep_d = jnp.asarray(keep)
    p0_d, p1_d = jnp.asarray(p0), jnp.asarray(p1)

    total = L * NP

    # on-chip exactness of the 16-bit/HIGH mode vs the 8-bit/default mode
    ks = jnp.asarray(keep[:2, : 64 << 10])
    a0, a1 = jnp.asarray(p0[:2, : 64 << 10]), jnp.asarray(p1[:2, : 64 << 10])
    (r0, r1), c8 = compact_rows((a0, a1), ks, cap=64 << 10, quarters=(4, 3))
    (s0, s1), c16 = compact_rows((a0, a1), ks, cap=64 << 10,
                                 quarters=(2, 2), secbits=16)
    n0 = int(c8[0]); n1 = int(c8[1])
    assert np.array_equal(np.asarray(c8), np.asarray(c16))
    assert np.array_equal(np.asarray(r0[0, :n0]), np.asarray(s0[0, :n0]))
    assert np.array_equal(np.asarray(r1[1, :n1]), np.asarray(s1[1, :n1]))
    print("16-bit mode exactness vs 8-bit mode: OK", flush=True)

    for blk, q, sb in ((1024, (4, 3), 8), (2048, (4, 3), 8),
                       (4096, (4, 3), 8), (1024, (2, 2), 16),
                       (2048, (2, 2), 16), (4096, (2, 2), 16)):
        t = device_time_ms(
            lambda: compact_rows((p0_d, p1_d), keep_d, cap=CAP, blk=blk,
                                 quarters=q, secbits=sb),
            runs=5)
        print(f"blk={blk:5d} quarters={q} secbits={sb}: {t:6.2f} ms "
              f"({total / t / 1e3:.0f} Mrow/s)", flush=True)


if __name__ == "__main__":
    main()
