#!/usr/bin/env python
"""Device pipeline throughput on REAL image content.

The qoiformat.org suite is unreachable here (no network); the corpus is
tests/local_corpus.py — real photos / screenshots / icons / textures from
locally-installed packages (the closest local analog of the reference's
acceptance corpus, test/fetch_test_images.sh:9).  Mixed geometries can't
share one batched program, so every image is tiled into uniform 512x512
patches (edge-replicated, local_corpus.patch_batch) — batch content is
100% real pixels.  Parity is checked against the native oracle on every
patch before timing (04_bench.cpp:685-731 analog).

Usage: python benchmarks/real_corpus_device.py [--channels 3|4]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=3, choices=(3, 4))
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--replicate", type=int, default=1,
                    help="repeat the patch corpus N times (amortizes "
                         "per-dispatch transport overhead)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qoipp_tpu import oracle
    from qoipp_tpu.models.pipeline import BatchPipeline
    from qoipp_tpu.ops.bitops import pixels_to_packed
    from qoipp_tpu.utils.timing import enable_compile_cache
    import local_corpus

    enable_compile_cache()
    if not local_corpus.available():
        print("local corpus unavailable on this host", file=sys.stderr)
        return 1

    desc, patches = local_corpus.patch_batch(args.side, args.channels)
    patches = patches * args.replicate
    n_px = desc.width * desc.height
    blobs = [oracle.encode(p, desc)[0] for p in patches]
    B = len(patches)
    total_px = B * n_px
    print(f"corpus: {B} patches {args.side}x{args.side} ch={args.channels} "
          f"(real content), streams {min(b.size for b in blobs)}.."
          f"{max(b.size for b in blobs)} B", file=sys.stderr)

    # oracle baseline
    t0 = time.perf_counter()
    for b_ in blobs:
        oracle.decode(b_, desc, desc.channels)
    t_dec0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in patches:
        oracle.encode(p, desc)
    t_enc0 = time.perf_counter() - t0
    print(f"oracle: decode {total_px/t_dec0/1e6:.1f} MPix/s, "
          f"encode {total_px/t_enc0/1e6:.1f} MPix/s", file=sys.stderr)

    max_len = max(b.size for b in blobs)
    pipe = BatchPipeline(desc, max_stream_len=max_len,
                         max_encode_len=max_len + 4096)
    streams_np, sizes_np = pipe.pack_streams(blobs)
    streams = jnp.asarray(streams_np)
    sizes = jnp.asarray(sizes_np)

    # parity first
    packed = jax.block_until_ready(pipe.decode_packed(streams, sizes))
    got = np.asarray(packed[:, :n_px])
    ch = args.channels
    dec_ok = True
    for i in range(B):
        want = oracle.decode(blobs[i], desc, desc.channels).reshape(-1, ch)
        planes = [got[i] & 0xFF, (got[i] >> 8) & 0xFF, (got[i] >> 16) & 0xFF]
        if ch == 4:
            planes.append((got[i] >> 24) & 0xFF)
        if not np.array_equal(
            np.stack(planes, 1).astype(np.uint8), want
        ):
            dec_ok = False
            print(f"DECODE PARITY FAIL patch {i}", file=sys.stderr)
    print(f"decode parity: {'100%' if dec_ok else 'FAILED'}", file=sys.stderr)

    for _ in range(3):
        jax.block_until_ready(pipe.decode_packed(streams, sizes))
    t0 = time.perf_counter()
    for _ in range(args.runs):
        out = pipe.decode_packed(streams, sizes)
    jax.block_until_ready(out)
    t_dec = (time.perf_counter() - t0) / args.runs

    packed_in = jnp.stack([
        jnp.pad(pixels_to_packed(jnp.asarray(p), ch), (0, pipe.nb - pipe.n_px))
        for p in patches
    ])
    enc_s, enc_l = jax.block_until_ready(pipe.encode_packed(packed_in))
    enc_ok = all(
        int(enc_l[i]) == blobs[i].size
        and np.array_equal(np.asarray(enc_s[i, : blobs[i].size]), blobs[i])
        for i in range(B)
    )
    print(f"encode parity: {'100%' if enc_ok else 'FAILED'}", file=sys.stderr)
    for _ in range(3):
        jax.block_until_ready(pipe.encode_packed_checked(packed_in))
    t0 = time.perf_counter()
    for _ in range(args.runs):
        out = pipe.encode_packed_checked(packed_in)
    jax.block_until_ready(out)
    t_enc = (time.perf_counter() - t0) / args.runs

    print(f"device: decode {total_px/t_dec/1e6:.1f} MPix/s "
          f"({t_dec*1e3:.1f} ms/batch), encode {total_px/t_enc/1e6:.1f} "
          f"MPix/s ({t_enc*1e3:.1f} ms/batch), parity "
          f"{'100%' if dec_ok and enc_ok else 'FAILED'}")

    # ---- length-bucketed scheduler (mixed-density remedy) ----------------
    from qoipp_tpu.models.scheduler import BucketedCodec

    codec = BucketedCodec(desc, min_len=1 << 15)
    imgs = codec.decode(blobs)  # cold (compiles every bucket) + parity
    bk_ok = all(
        np.array_equal(
            imgs[i].reshape(-1),
            oracle.decode(blobs[i], desc, desc.channels),
        )
        for i in range(B)
    )
    print(f"bucketed decode parity: {'100%' if bk_ok else 'FAILED'}",
          file=sys.stderr)
    # steady-state device throughput: streams staged once (as for the
    # un-bucketed number), all buckets dispatched back to back
    plan = codec.prepare(blobs)
    jax.block_until_ready([g for _, g in codec.decode_prepared(plan)])
    t0 = time.perf_counter()
    for _ in range(args.runs):
        groups = codec.decode_prepared(plan)
    jax.block_until_ready([g for _, g in groups])
    t_bk = (time.perf_counter() - t0) / args.runs
    print(f"bucketed: decode {total_px/t_bk/1e6:.1f} MPix/s "
          f"({t_bk*1e3:.1f} ms/batch device-resident, "
          f"{len(plan)} buckets), parity "
          f"{'100%' if bk_ok else 'FAILED'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
