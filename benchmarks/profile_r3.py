#!/usr/bin/env python
"""Round-3 stage profile on the real chip, after the 8-bit MXU-plane change.

Times every stage of the batched decode (B=128) and encode (B=32 sub-batch)
pipelines separately, so the next optimization target is measured, not
guessed.  Stage boundaries mirror models/pipeline.BatchPipeline exactly.
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

    from bench import make_corpus
    from qoipp_tpu.models.pipeline import BatchPipeline
    from qoipp_tpu.ops import boundary, decode as dec_ops, replay_kernel as rk
    from qoipp_tpu.ops import place_kernel

    B, W, H = 128, 1920, 1088
    desc, raws, blobs = make_corpus(B, W, H)
    n_px = W * H
    max_len = max(b.size for b in blobs)
    pipe = BatchPipeline(desc, max_stream_len=max_len,
                         max_encode_len=max_len + 4096)
    streams_np, sizes_np = pipe.pack_streams(blobs)
    streams = jax.device_put(jnp.asarray(streams_np), dev)
    sizes = jax.device_put(jnp.asarray(sizes_np), dev)
    qb = pipe.qb
    log(f"qb={qb} n_cap={pipe.n_cap} stream sizes {min(b.size for b in blobs)}"
        f"..{max_len}")

    # ---------------- decode stages ----------------------------------------
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
    def stage_base(pix_before):
        return place_kernel.window_base_rows(pix_before, pipe.n_cap)

    base = jax.block_until_ready(stage_base(info["pix_before"]))

    @jax.jit
    def stage_place(pix_before, emits, base):
        return place_kernel.place_fill(pix_before, emits, base, pipe.n_cap)

    _ = jax.block_until_ready(stage_place(info["pix_before"], emits, base))

    t_reg = device_time_ms(stage_regions, streams, sizes, runs=10)
    t_bnd = device_time_ms(stage_boundary, regions, sizes, runs=10)
    t_fld = device_time_ms(stage_fields, regions, info["real"], runs=10)
    t_rpl = device_time_ms(stage_replay, meta, val, runs=10)
    t_bas = device_time_ms(stage_base, info["pix_before"], runs=10)
    t_plc = device_time_ms(stage_place, info["pix_before"], emits, base,
                           runs=10)
    t_all = device_time_ms(pipe.decode_packed, streams, sizes, runs=10)
    tot_px = B * n_px
    log(f"[decode B={B}] regions={t_reg:.1f} boundary={t_bnd:.1f} "
        f"fields={t_fld:.1f} replay={t_rpl:.1f} base={t_bas:.1f} "
        f"place={t_plc:.1f} | fused={t_all:.1f} ms "
        f"({tot_px/t_all/1e3:.0f} MPix/s)")

    # chunk stats: how compressible is the byte->chunk domain?
    tc = np.asarray(info["total_chunks"])
    real_np = np.asarray(info["real"][:4])
    log(f"[chunks] total_chunks min={tc.min()} max={tc.max()} "
        f"mean={tc.mean():.0f}  bytes(qb)={qb}  n_px={n_px} "
        f"chunks/byte={tc.mean()/ (sizes_np.mean()-22):.3f}")

    # ---------------- encode stages ----------------------------------------
    from qoipp_tpu.ops.bitops import pixels_to_packed, START_PIXEL_PACKED, hash6
    from qoipp_tpu.ops.compact_kernel import BLK as CBLK, compact_rows
    from qoipp_tpu.ops import emit_kernel, encode as enc_ops

    EB = 32
    packed_in = jnp.stack(
        [jnp.pad(pixels_to_packed(jnp.asarray(r), 3), (0, pipe.nb - pipe.n_px))
         for r in raws[:EB]]
    )
    packed_in = jax.device_put(packed_in, dev)
    nb = pipe.nb
    chunk_cap = min(nb, pipe.max_encode_len) + 2048 + 256
    chunk_cap = -(-max(chunk_cap, CBLK + 256) // 128) * 128
    out_cap = -(-pipe.max_encode_len // emit_kernel.WIN) * emit_kernel.WIN

    @jax.jit
    def e_dense(packed):
        b, nbx = packed.shape
        idx = jnp.broadcast_to(jnp.arange(nbx, dtype=jnp.int32)[None, :],
                               (b, nbx))
        valid = idx < n_px
        prev = jnp.concatenate(
            [jnp.full((b, 1), START_PIXEL_PACKED, jnp.uint32),
             packed[:, :-1]], axis=1)
        eq_raw = packed == prev
        noneq = valid & ~eq_raw
        last_noneq = jax.lax.cummax(jnp.where(noneq, idx, -1), axis=1)
        cnt = idx - last_noneq
        hit62 = eq_raw & valid & (cnt % 62 == 0)
        keep = noneq | hit62
        posflag = (idx | jnp.where(noneq, 1 << 30, 0)).astype(jnp.uint32)
        pad = (-nbx) % CBLK
        if pad:
            packed = jnp.pad(packed, ((0, 0), (0, pad)))
            posflag = jnp.pad(posflag, ((0, 0), (0, pad)))
            keep = jnp.pad(keep, ((0, 0), (0, pad)))
        return packed, posflag, keep

    pk_p, pf_p, keep_p = jax.block_until_ready(e_dense(packed_in))

    @jax.jit
    def e_compact(packed_p, posflag, keep):
        return compact_rows((packed_p, posflag), keep, cap=chunk_cap)

    (pk_c, pf_c), counts = jax.block_until_ready(
        e_compact(pk_p, pf_p, keep_p))

    @jax.jit
    def e_table(pk_c, counts):
        rows = jnp.arange(chunk_cap, dtype=jnp.int32)[None, :]
        valid_c = rows < counts[:, None]
        pk = jnp.where(valid_c, pk_c, 0)
        h = hash6(pk)
        nq_c = valid_c  # close enough for cost: same shapes/ops
        return jax.vmap(enc_ops._last_same_hash_value)(pk, h, nq_c)

    _ = jax.block_until_ready(e_table(pk_c, counts))

    # emit: reuse the real impl end-to-end, then subtract
    header = pipe._header

    @jax.jit
    def e_full(packed):
        return enc_ops.encode_batch_checked(
            packed, jnp.int32(n_px), header, channels=3,
            chunk_cap=chunk_cap, out_cap=pipe.max_encode_len)

    _ = jax.block_until_ready(e_full(packed_in))

    # emit alone: build inputs once, time emit_bytes
    @jax.jit
    def e_off(pf_c, counts):
        rows = jnp.arange(chunk_cap, dtype=jnp.int32)[None, :]
        valid_c = rows < counts[:, None]
        nb_c = jnp.where(valid_c, 2, 0)  # ~average 1-2 bytes/chunk
        off = 14 + jnp.cumsum(nb_c, axis=1) - nb_c
        tlo = pf_c
        thn = (nb_c.astype(jnp.uint32) << 16)
        return off, tlo, thn

    off, tlo, thn = jax.block_until_ready(e_off(pf_c, counts))

    @jax.jit
    def e_emit(off, tlo, thn):
        base = emit_kernel.window_base_rows(off, out_cap)
        return emit_kernel.emit_bytes(off, tlo, thn, base, out_cap)

    _ = jax.block_until_ready(e_emit(off, tlo, thn))

    t_ed = device_time_ms(e_dense, packed_in, runs=10)
    t_ec = device_time_ms(e_compact, pk_p, pf_p, keep_p, runs=10)
    t_et = device_time_ms(e_table, pk_c, counts, runs=6)
    t_ee = device_time_ms(e_emit, off, tlo, thn, runs=6)
    t_ef = device_time_ms(e_full, packed_in, runs=6)
    sub_px = EB * n_px
    log(f"[encode B={EB}] dense={t_ed:.1f} compact={t_ec:.1f} "
        f"table={t_et:.1f} emit~={t_ee:.1f} | full={t_ef:.1f} ms "
        f"({sub_px/t_ef/1e3:.0f} MPix/s)")
    cc = np.asarray(counts)
    log(f"[encode chunks] counts min={cc.min()} max={cc.max()} "
        f"mean={cc.mean():.0f} chunk_cap={chunk_cap} nb={nb}")


if __name__ == "__main__":
    main()
