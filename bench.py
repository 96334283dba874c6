#!/usr/bin/env python
"""Headline benchmark: batched QOI decode throughput on one TPU chip.

Protocol mirrors the reference bench harness (example/source/04_bench.cpp:
733-754): verify parity first, then 1 cold + 3 warmup + N timed runs,
averaged.  The baseline is the native C++ oracle (-O3 -march=native), i.e.
a faithful stand-in for the reference library on this host's CPU — the
reference publishes no numbers of its own (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": MPix/s, "unit": "MPix/s", "vs_baseline": ratio}
Details go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(b, w, h, seed=0):
    """Synthetic 'photographic-ish' corpus: piecewise-flat regions + smooth
    gradients + noise patches — exercises RUN/INDEX/DIFF/LUMA/RGB mixes."""
    from qoipp_tpu import Channels, Desc, oracle

    rng = np.random.default_rng(seed)
    desc = Desc(w, h, Channels.RGB)
    n = w * h
    raws, blobs = [], []
    for i in range(b):
        y, x = np.mgrid[0:h, 0:w]
        grad = ((x * 255 // max(w - 1, 1)) // 3 + (y * 150 // max(h - 1, 1)) // 3)
        base = np.stack([grad, grad + 40, 255 - grad], axis=-1).astype(np.uint8)
        # flat patches
        for _ in range(60):
            py, px = rng.integers(0, h), rng.integers(0, w)
            ph, pw = rng.integers(8, h // 4), rng.integers(8, w // 4)
            base[py : py + ph, px : px + pw] = rng.integers(0, 256, 3)
        # noise patch
        py, px = rng.integers(0, h // 2), rng.integers(0, w // 2)
        base[py : py + h // 8, px : px + w // 8] = rng.integers(
            0, 256, (min(h // 8, h - py), min(w // 8, w - px), 3)
        )
        raw = base.reshape(-1)
        enc, complete = oracle.encode(raw, desc)
        assert complete
        raws.append(raw)
        blobs.append(enc)
    return desc, raws, blobs


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/qoipp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from qoipp_tpu import oracle
    from qoipp_tpu.models.pipeline import BatchPipeline

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev}")

    B, W, H = 128, 1920, 1088
    desc, raws, blobs = make_corpus(B, W, H)
    n_px = W * H
    total_px = B * n_px
    stream_sizes = [b.size for b in blobs]
    log(f"corpus: {B} x {W}x{H} RGB, stream sizes {min(stream_sizes)}..{max(stream_sizes)}")

    # ---- baseline: native oracle (reference-equivalent C++) --------------
    for blob in blobs[:1]:
        oracle.decode(blob, desc, desc.channels)  # warm
    t0 = time.perf_counter()
    runs_base = 2
    for _ in range(runs_base):
        for blob in blobs:
            oracle.decode(blob, desc, desc.channels)
    t_base = (time.perf_counter() - t0) / runs_base
    base_mpix = total_px / t_base / 1e6
    log(f"oracle decode: {t_base*1e3:.1f} ms/batch = {base_mpix:.1f} MPix/s")
    t0 = time.perf_counter()
    for blob_raw in raws[:8]:
        oracle.encode(blob_raw, desc)
    t_enc_base = (time.perf_counter() - t0) / 8 * B
    log(f"oracle encode: {t_enc_base*1e3:.1f} ms/batch = "
        f"{total_px/t_enc_base/1e6:.1f} MPix/s (production encode path)")

    # ---- device: batched parallel decode ---------------------------------
    max_len = max(stream_sizes)
    pipe = BatchPipeline(desc, max_stream_len=max_len)
    log(f"pipeline: qb={pipe.qb} (replay steps)")

    streams_np, sizes_np = pipe.pack_streams(blobs)
    streams = jax.device_put(jnp.asarray(streams_np), dev)
    sizes = jax.device_put(jnp.asarray(sizes_np), dev)

    # verify parity (one batch) before timing — 04_bench.cpp:685-731 analog
    packed = jax.block_until_ready(pipe.decode_packed(streams, sizes))
    got = np.asarray(packed[:, :n_px])
    ok = True
    for i in range(B):
        want = oracle.decode(blobs[i], desc, desc.channels).reshape(-1, 3)
        g = np.stack(
            [got[i] & 0xFF, (got[i] >> 8) & 0xFF, (got[i] >> 16) & 0xFF], axis=1
        ).astype(np.uint8)
        if not np.array_equal(g, want):
            ok = False
            log(f"PARITY FAIL image {i}")
    log(f"parity: {'100%' if ok else 'FAILED'}")

    for _ in range(3):  # warmup
        jax.block_until_ready(pipe.decode_packed(streams, sizes))
    runs = 10
    t0 = time.perf_counter()
    for _ in range(runs):
        out = pipe.decode_packed(streams, sizes)
    jax.block_until_ready(out)
    t_dev = (time.perf_counter() - t0) / runs
    dev_mpix = total_px / t_dev / 1e6
    log(f"device decode: {t_dev*1e3:.2f} ms/batch = {dev_mpix:.1f} MPix/s")

    # ---- encode throughput (secondary, logged) ----------------------------
    from qoipp_tpu.ops.bitops import pixels_to_packed

    packed_in = jnp.stack(
        [
            jnp.pad(
                pixels_to_packed(jnp.asarray(r), 3), (0, pipe.nb - pipe.n_px)
            )
            for r in raws
        ]
    )
    # device encode: bit-exact but emission-scatter-bound (docs/BACKLOG.md);
    # verify + time on a memory-safe sub-batch
    eb = min(B, 32)
    packed_in = jax.device_put(packed_in[:eb], dev)
    enc_streams, lengths = jax.block_until_ready(pipe.encode_packed(packed_in))
    enc_ok = all(
        int(lengths[i]) == blobs[i].size
        and np.array_equal(np.asarray(enc_streams[i, : blobs[i].size]), blobs[i])
        for i in range(eb)
    )
    log(f"device encode parity ({eb} images): {'100%' if enc_ok else 'FAILED'}")
    t0 = time.perf_counter()
    enc_runs = 2
    for _ in range(enc_runs):
        out = pipe.encode_packed(packed_in)
    jax.block_until_ready(out)
    np.asarray(out[1][:1])
    t_enc = (time.perf_counter() - t0) / enc_runs
    log(f"device encode: {t_enc*1e3:.2f} ms/{eb} imgs = "
        f"{eb*n_px/t_enc/1e6:.1f} MPix/s")

    value = dev_mpix if ok else 0.0
    print(
        json.dumps(
            {
                "metric": f"batched QOI decode, {B}x{W}x{H} RGB synthetic corpus, single chip",
                "value": round(value, 1),
                "unit": "MPix/s",
                "vs_baseline": round(value / base_mpix, 2) if base_mpix else 0,
            }
        )
    )


if __name__ == "__main__":
    main()
