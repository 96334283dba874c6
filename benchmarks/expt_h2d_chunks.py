#!/usr/bin/env python
"""Axon-tunnel transport probe: H2D/D2H throughput vs TRANSFER GRANULARITY.

Round-3 transport numbers (BASELINE.md): H2D ~460 MB/s on small buffers
but only ~72 MB/s on tens-of-MB buffers; D2H ~14 MB/s.  Serving uploads
each tier's packed regions as ONE jnp.asarray (models/serving.py), so the
full-corpus serve pays the large-buffer rate — the documented "H2D floor"
(54.5 MB / 72 MB/s = 757 ms) assumes that rate is fixed.  If the tunnel
moves mid-size buffers materially faster, chunked uploads + ONE device-
side concatenate (a single extra dispatch, ~48 ms) beat the floor.

This probe measures, for a fixed ~54 MB payload:
  * H2D: wall time to device_put the payload as N pieces of size
    54MB/N (N = 1..256), block_until_ready on all pieces;
  * +reassembly: same, plus jnp.concatenate of the pieces into one
    array (what a packed-lane upload would need);
  * D2H: np.asarray fetch of the same payload in N pieces.

Interpretation guide: if piecewise H2D at some N beats 1-piece by more
than the concat dispatch cost, wire chunked staging into
PackedDecoder.stage_to_device / ServingCodec.decode_stage and re-measure
the serving row (VERDICT item 7: serve >= 85% of the floor — or a new,
lower floor).

Status: CHIP PENDING (transport probes are meaningless on the CPU
backend); queued behind the docs/BACKLOG.md outage list.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=54)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if jax.default_backend() != "tpu":
        print("transport probe needs the TPU tunnel; backend is",
              jax.default_backend())
        return
    total = args.mb << 20
    host = np.random.default_rng(0).integers(
        0, 256, total, dtype=np.uint8).reshape(-1, 128)
    rows = host.shape[0]

    # warm the transport + compile the concat shapes
    _ = jnp.asarray(host[:1024]).block_until_ready()

    print(f"payload {args.mb} MB as N pieces (best of {args.reps}):")
    print(f"{'N':>5} {'piece':>9} {'H2D MB/s':>9} {'+concat':>9} "
          f"{'D2H MB/s':>9}")
    for n in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        pr = rows // n
        pieces_h = [host[i * pr:(i + 1) * pr] for i in range(n)]

        def h2d():
            devs = [jax.device_put(p) for p in pieces_h]
            for d in devs:
                d.block_until_ready()
            return devs

        t_up = timeit(h2d, args.reps)

        def h2d_cat():
            devs = [jax.device_put(p) for p in pieces_h]
            return jnp.concatenate(devs, axis=0).block_until_ready()

        t_cat = timeit(h2d_cat, args.reps)

        devs = h2d()

        def d2h():
            for d in devs:
                np.asarray(d)

        t_dn = timeit(d2h, args.reps)
        mb = n * pr * 128 / (1 << 20)
        print(f"{n:>5} {pr * 128 >> 10:>7}KB {mb / t_up:>9.1f} "
              f"{mb / t_cat:>9.1f} {mb / t_dn:>9.1f}")


if __name__ == "__main__":
    main()
