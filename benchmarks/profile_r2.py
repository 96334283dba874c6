#!/usr/bin/env python
"""Round-2 design probes on the real chip.

Measures the quantities that decide the expansion/emission redesign:
  1. stage profile of the current batched decode at B=128
  2. XLA scatter-add / scatter-set rate vs element count (compacted sizes)
  3. Pallas grid-step overhead (near-empty kernel, many steps)
  4. u32 cumsum rate over (B, n_cap)
  5. chunk-count statistics of the bench corpus (to size ncc_cap)
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/qoipp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from qoipp_tpu.utils.timing import device_time_ms

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev}")

    # ---- 1. stage profile of current decode, B=128 ------------------------
    from bench import make_corpus
    from qoipp_tpu.models.pipeline import BatchPipeline
    from qoipp_tpu.ops import boundary, decode as dec_ops, replay_kernel as rk

    B, W, H = 128, 1920, 1088
    desc, raws, blobs = make_corpus(B, W, H)
    n_px = W * H
    pipe = BatchPipeline(desc, max_stream_len=max(b.size for b in blobs))
    streams_np, sizes_np = pipe.pack_streams(blobs)
    streams = jax.device_put(jnp.asarray(streams_np), dev)
    sizes = jax.device_put(jnp.asarray(sizes_np), dev)
    qb = pipe.qb

    @jax.jit
    def stage_regions(streams, sizes):
        regions = streams[:, 14:]
        q = jnp.arange(regions.shape[1], dtype=jnp.int32)[None, :]
        return jnp.where(q < (sizes - 14)[:, None], regions, 0)

    regions = jax.block_until_ready(stage_regions(streams, sizes))

    @jax.jit
    def stage_boundary(regions, sizes):
        return boundary.analyze_region_batch(
            regions[:, :qb], sizes - 22, jnp.int32(n_px)
        )

    info = jax.block_until_ready(stage_boundary(regions, sizes))

    @jax.jit
    def stage_fields(regions, real):
        return dec_ops.fields_dense_batch(regions, real)

    meta, val = jax.block_until_ready(stage_fields(regions, info["real"]))

    bpad = (-B) % 8
    qpad = (-qb) % 512

    @jax.jit
    def stage_replay(meta, val):
        meta_t = jnp.pad(meta, ((0, bpad), (0, qpad))).T
        val_t = jnp.pad(val, ((0, bpad), (0, qpad))).T
        return rk.replay_batch(meta_t, val_t).T[:B, :qb]

    emits = jax.block_until_ready(stage_replay(meta, val))

    @jax.jit
    def stage_expand(emits, real, produced, pix_before):
        return dec_ops.expand_bytes_batch(
            emits, real, produced, pix_before, pipe.n_cap
        )

    _ = jax.block_until_ready(
        stage_expand(emits, info["real"], info["produced"], info["pix_before"])
    )

    t_reg = device_time_ms(stage_regions, streams, sizes, runs=10)
    t_bnd = device_time_ms(stage_boundary, regions, sizes, runs=10)
    t_fld = device_time_ms(stage_fields, regions, info["real"], runs=10)
    t_rpl = device_time_ms(stage_replay, meta, val, runs=10)
    t_exp = device_time_ms(
        stage_expand, emits, info["real"], info["produced"], info["pix_before"],
        runs=10,
    )
    t_all = device_time_ms(pipe.decode_packed, streams, sizes, runs=10)
    log(f"[stage B={B}] regions={t_reg:.1f} boundary={t_bnd:.1f} "
        f"fields={t_fld:.1f} replay={t_rpl:.1f} expand={t_exp:.1f} "
        f"| fused total={t_all:.1f} ms")

    # ---- 5. chunk statistics ----------------------------------------------
    tc = np.asarray(info["total_chunks"])
    log(f"[chunks] qb={qb} total_chunks min={tc.min()} max={tc.max()} "
        f"mean={tc.mean():.0f}  (n_px={n_px})")

    # ---- 2. scatter rates at compacted sizes -------------------------------
    for n_el in (1 << 20, 1 << 22, 1 << 23, 1 << 24):
        n_out = B * (pipe.n_cap + 1)
        per = n_el // B
        idx = np.sort(
            np.random.default_rng(0).integers(0, pipe.n_cap, (B, per)), axis=1
        ) + (np.arange(B)[:, None] * (pipe.n_cap + 1))
        idx_j = jax.device_put(jnp.asarray(idx.reshape(-1), jnp.int32), dev)
        vals = jax.device_put(
            jnp.asarray(np.random.randint(0, 2**32, n_el, np.uint64)
                        .astype(np.uint32)), dev)

        @jax.jit
        def sc_add(idx_j, vals):
            return jnp.zeros(n_out, jnp.uint32).at[idx_j].add(
                vals, indices_are_sorted=True)

        @jax.jit
        def sc_set(idx_j, vals):
            return jnp.zeros(n_out, jnp.uint32).at[idx_j].set(
                vals, indices_are_sorted=True)

        ta = device_time_ms(sc_add, idx_j, vals, runs=6)
        ts = device_time_ms(sc_set, idx_j, vals, runs=6)
        log(f"[scatter n={n_el>>20}M] add={ta:.1f} ms ({ta*1e6/n_el:.2f} ns/el)"
            f"  set={ts:.1f} ms ({ts*1e6/n_el:.2f} ns/el)")

    # ---- 4. cumsum rate -----------------------------------------------------
    big = jax.device_put(
        jnp.asarray(np.random.randint(0, 255, (B, pipe.n_cap), np.int64)
                    .astype(np.uint32)), dev)

    @jax.jit
    def cs(x):
        return jnp.cumsum(x, axis=1)

    tcs = device_time_ms(cs, big, runs=6)
    log(f"[cumsum (B={B}, {pipe.n_cap})] {tcs:.1f} ms "
        f"({tcs*1e6/(B*pipe.n_cap):.2f} ns/el)")

    # ---- 3. Pallas grid-step overhead --------------------------------------
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def tiny_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] + jnp.uint32(1)

    for steps in (4096, 16384, 65536):
        x = jnp.zeros((steps, 8, 128), jnp.uint32)

        def run(x, steps=steps):
            return pl.pallas_call(
                tiny_kernel,
                grid=(steps,),
                in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((steps, 8, 128), jnp.uint32),
            )(x)

        runj = jax.jit(run)
        t = device_time_ms(runj, x, runs=6)
        log(f"[grid overhead steps={steps}] {t:.2f} ms ({t*1e6/steps:.0f} ns/step)")

    # ---- matmul placement prototype rate ------------------------------------
    # (S,K)@(K,128) f32 one-hot style per grid step, K=2048, S=16+1
    K, S = 2048, 17

    def place_kernel(t_ref, v_ref, o_ref):
        t = t_ref[:, :]  # (8, K/8?) — keep simple: (K//128, 128) targets
        tv = t.reshape(1, K)
        sids = jax.lax.broadcasted_iota(jnp.int32, (S, K), 0)
        a = jnp.where((tv // 128) == sids, v_ref[:, :].reshape(1, K), 0.0)
        lids = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
        bmat = ((tv.reshape(K, 1) % 128) == lids).astype(jnp.float32)
        o_ref[:, :] = jnp.dot(a, bmat, preferred_element_type=jnp.float32)

    nblk = 2048

    def prun(t, v):
        return pl.pallas_call(
            place_kernel,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, K // 128, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K // 128, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblk, S, 128), jnp.float32),
        )(t.reshape(nblk, K // 128, 128), v.reshape(nblk, K // 128, 128))

    tt = np.random.default_rng(1).integers(0, S * 128, (nblk, K)).astype(np.int32)
    tt.sort(axis=1)
    vv = np.random.default_rng(2).random((nblk, K)).astype(np.float32)
    prunj = jax.jit(prun)
    _ = jax.block_until_ready(prunj(jnp.asarray(tt), jnp.asarray(vv)))
    tp = device_time_ms(prunj, jnp.asarray(tt), jnp.asarray(vv), runs=6)
    log(f"[placement matmul K={K} S={S} blocks={nblk}] {tp:.2f} ms "
        f"({tp*1e6/nblk:.0f} ns/block, {tp*1e6/(nblk*K):.2f} ns/input-row)")


if __name__ == "__main__":
    main()
