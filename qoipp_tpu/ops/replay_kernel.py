"""Pallas TPU kernel: exact batched QOI chunk replay.

The sequential heart of QOI decode — per-chunk state transitions over
(prev pixel, 64-entry table) — runs here as ONE kernel over a whole batch:
images are VPU lanes, the batch's tables live in VMEM scratch as a (64, B)
uint32 plane (slots on sublanes, images on lanes), and chunk fields stream
from HBM in double-buffered slabs via the Pallas grid pipeline.  Per chunk
step the kernel does ~8 fused vector ops on (64, B) — no per-step XLA
dispatch, no gathers (the table read/write are one-hot compares), no
speculation.  It is exact for EVERY stream, including adversarial ones
(the INDEX write-back is modeled literally).

Chunk encoding (built by ops/decode dense passes):
  meta: uint32 = cls | (arg << 3)     cls: 0 NOP, 1 SETA, 2 SETC, 3 ADD,
                                           4 IDX, 5 RUN
  val:  uint32 = absolute RGBA (SETA), RGB with zero alpha byte (SETC),
                 or per-byte delta (ADD)

Sequential depth is C_cap steps at VPU width B*64 — with B >= 128 images
in flight the VPU stays saturated and throughput is data-independent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitops import START_PIXEL_PACKED

_START_HASH = (11 * 255) % 64

CLS_NOP, CLS_SETA, CLS_SETC, CLS_ADD, CLS_IDX, CLS_RUN = range(6)


def _swar_add(x, y):
    lo = ((x & 0x00FF00FF) + (y & 0x00FF00FF)) & 0x00FF00FF
    hi = (((x >> 8) & 0x00FF00FF) + ((y >> 8) & 0x00FF00FF)) & 0x00FF00FF
    return lo | (hi << 8)


def _hash6(v):
    r = v & 0xFF
    g = (v >> 8) & 0xFF
    b = (v >> 16) & 0xFF
    a = v >> 24
    return (r * 3 + g * 5 + b * 7 + a * 11) & 63


def _make_replay_kernel(with_summary: bool, unroll: int = 8):
    """Kernel builder.  with_summary additionally tracks per-lane transfer
    summaries — pupd (1, B): has prev been overwritten; swr (64, B): has
    table slot s been overwritten (int32 0/1; Mosaic dislikes carried
    bools) — the seam algebra of the split-replay fixpoint
    (ops/split.py): a lane's OUT state component is a function of its IN
    state exactly where the summary bit is 0.

    unroll: chunk steps per fori_loop iteration (must divide the slab).
    The state chain is strictly sequential either way; unrolling only
    removes loop mechanics — measured 44.1 -> 33.8-38.5 ns/step at
    unroll 8 (round 4, best-of-3 x 10-run protocol, C=393K random
    planes); deeper than 16 gains nothing (the remaining ~35 ns is the
    hash->compare->select dependency latency)."""

    def kernel(prev_in_ref, seen_in_ref, meta_ref, val_ref,
               emit_ref, prev_out_ref, seen_out_ref, *rest):
        if with_summary:
            pupd_ref, swr_ref, prev_scr, seen_scr, pupd_scr, swr_scr = rest
        else:
            prev_scr, seen_scr = rest
        slab = pl.program_id(0)
        slab_t = meta_ref.shape[0]
        b = meta_ref.shape[1]
        n_slabs = pl.num_programs(0)

        @pl.when(slab == 0)
        def _init():
            prev_scr[:] = prev_in_ref[:]
            seen_scr[:] = seen_in_ref[:]
            if with_summary:
                pupd_scr[:] = jnp.zeros((1, b), jnp.int32)
                swr_scr[:] = jnp.zeros((64, b), jnp.int32)

        slots = jax.lax.broadcasted_iota(jnp.int32, (64, b), 0)

        def step(t, _):
            meta = meta_ref[t, :].reshape(1, b).astype(jnp.int32)
            val = val_ref[t, :].reshape(1, b)
            cls = meta & 7
            arg = (meta >> 3) & 63
            # bit 9: stream-start reset (packed lanes, models/packed.py) —
            # this chunk begins a NEW stream in its lane: state re-enters the
            # decoder's initial carry before the op applies
            rst = (meta >> 9) & 1

            prev = jnp.where(
                rst == 1, jnp.uint32(START_PIXEL_PACKED), prev_scr[:]
            )  # (1, b)
            seen = jnp.where(
                jnp.broadcast_to(rst == 1, (64, b)),
                jnp.where(slots == _START_HASH,
                          jnp.uint32(START_PIXEL_PACKED), jnp.uint32(0)),
                seen_scr[:],
            )  # (64, b)

            hot_r = slots == arg  # (64, b), arg broadcast over sublanes
            # one-hot "gather": exactly one addend per lane, so a signed sum
            # is bit-exact (Mosaic lacks unsigned reductions)
            idx_val = jnp.sum(
                jnp.where(hot_r, seen, 0).astype(jnp.int32), axis=0,
                keepdims=True
            ).astype(jnp.uint32)

            set_val = jnp.where(
                cls == CLS_SETC, (prev & jnp.uint32(0xFF000000)) | val, val
            )
            add_val = _swar_add(prev, val)

            v = jnp.where(
                (cls == CLS_SETA) | (cls == CLS_SETC),
                set_val,
                jnp.where(
                    cls == CLS_ADD,
                    add_val,
                    jnp.where(cls == CLS_IDX, idx_val, prev),
                ),
            )
            upd = (cls >= CLS_SETA) & (cls <= CLS_IDX)

            prev_scr[:] = jnp.where(upd, v, prev)
            h = _hash6(v)
            hot_w = (slots == h) & upd  # broadcast (1,b) over sublanes
            seen_scr[:] = jnp.where(hot_w, jnp.broadcast_to(v, (64, b)), seen)
            if with_summary:
                # a reset overwrites EVERY state component (the out-state
                # stops depending on the in-state from that chunk on)
                wrote_p = (rst == 1) | upd
                wrote_s = jnp.broadcast_to(rst == 1, (64, b)) | hot_w
                pupd_scr[:] = jnp.where(wrote_p, 1, pupd_scr[:])
                swr_scr[:] = jnp.where(wrote_s, 1, swr_scr[:])
            emit_ref[t, :] = v.reshape(b)
            return 0

        def group(i, _):
            for u in range(unroll):
                step(i * unroll + u, 0)
            return 0

        jax.lax.fori_loop(0, slab_t // unroll, group, 0)

        @pl.when(slab == n_slabs - 1)
        def _finish():
            prev_out_ref[:] = prev_scr[:]
            seen_out_ref[:] = seen_scr[:]
            if with_summary:
                pupd_ref[:] = pupd_scr[:]
                swr_ref[:] = swr_scr[:]

    return kernel


_replay_kernel = _make_replay_kernel(with_summary=False)
_replay_summary_kernel = _make_replay_kernel(with_summary=True)


def initial_state(b: int):
    """The decoder's initial carry: prev = start pixel; table zero except
    the seeded slot (reference quirk: simple.cpp:108, stream.cpp:306)."""
    prev0 = jnp.full((1, b), START_PIXEL_PACKED, jnp.uint32)
    slots0 = jax.lax.broadcasted_iota(jnp.int32, (64, b), 0)
    seen0 = jnp.where(
        slots0 == _START_HASH,
        jnp.uint32(START_PIXEL_PACKED),
        jnp.zeros((64, b), jnp.uint32),
    )
    return prev0, seen0


@partial(jax.jit, static_argnames=("slab",))
def replay_batch_carry(meta, val, prev_in, seen_in, slab: int = 512):
    """Carried-state replay: decode a window of chunk rows starting from an
    explicit (prev, seen) state — the ~260-byte codec carry of SURVEY.md §5
    — and return the state after the window (the device streaming-decode
    primitive).

    meta/val: (C_cap, B) uint32; prev_in: (1, B); seen_in: (64, B).
    Returns (emits (C_cap, B), prev_out (1, B), seen_out (64, B)).
    """
    c_cap, b = meta.shape
    assert c_cap % slab == 0 and slab % 8 == 0  # kernel unrolls 8 steps
    grid = (c_cap // slab,)

    whole = lambda i: (0, 0)
    return pl.pallas_call(
        _replay_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((64, b), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((slab, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((64, b), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_cap, b), jnp.uint32),
            jax.ShapeDtypeStruct((1, b), jnp.uint32),
            jax.ShapeDtypeStruct((64, b), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, b), jnp.uint32),
            pltpu.VMEM((64, b), jnp.uint32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(prev_in, seen_in, meta, val)


@partial(jax.jit, static_argnames=("slab",))
def replay_batch_summary(meta, val, prev_in, seen_in, slab: int = 512):
    """Carried-state replay that ALSO returns per-lane transfer summaries:
    pupd (1, B) int32 — prev overwritten anywhere in the lane; swr (64, B)
    int32 — table slot overwritten.  A lane's out-state component equals
    its in-state component exactly where the summary bit is 0 — the seam
    algebra the split-replay fixpoint (ops/split.py) propagates.

    Returns (emits, prev_out, seen_out, pupd, swr)."""
    c_cap, b = meta.shape
    assert c_cap % slab == 0 and slab % 8 == 0  # kernel unrolls 8 steps
    grid = (c_cap // slab,)

    whole = lambda i: (0, 0)
    return pl.pallas_call(
        _replay_summary_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((64, b), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((slab, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((64, b), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((64, b), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_cap, b), jnp.uint32),
            jax.ShapeDtypeStruct((1, b), jnp.uint32),
            jax.ShapeDtypeStruct((64, b), jnp.uint32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((64, b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, b), jnp.uint32),
            pltpu.VMEM((64, b), jnp.uint32),
            pltpu.VMEM((1, b), jnp.int32),
            pltpu.VMEM((64, b), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(prev_in, seen_in, meta, val)


def replay_batch(meta, val, slab: int = 512):
    """meta/val: (C_cap, B) uint32 chunk fields (chunk-major).  Returns
    emits (C_cap, B) uint32 — the value each chunk produces (RUN repeats it).
    """
    b = meta.shape[1]
    prev0, seen0 = initial_state(b)
    emits, _, _ = replay_batch_carry(meta, val, prev0, seen0, slab=slab)
    return emits


# --------------------------------------------------------------------------
# Log-fill kernel (pixel expansion's gap fill)
# --------------------------------------------------------------------------

_FILL_HALO = 128  # gaps are < 64; 128 satisfies Mosaic lane tiling


def _logfill_kernel(halo_ref, main_ref, out_ref):
    rows = main_ref.shape[0]
    f = jnp.concatenate([halo_ref[:, :], main_ref[:, :]], axis=1)
    # 6 doubling passes entirely in VMEM: nearest flagged word (bit 31)
    # within 63 to the left wins (rows are independent images).
    for k in (1, 2, 4, 8, 16, 32):
        shifted = jnp.concatenate(
            [jnp.zeros((rows, k), jnp.uint32), f[:, :-k]], axis=1
        )
        f = jnp.where(f >> 31 != 0, f, shifted)
    out_ref[:, :] = f[:, _FILL_HALO:]


@partial(jax.jit, static_argnames=("blk",))
def logfill_batch(words, blk: int = 16384):
    """words: (B, n_cap) uint32 with bit 31 flagging written slots (gaps
    < 64).  Returns the fill-forward of flagged words in ~one HBM round
    trip instead of six (each grid block gets the previous block's last
    64 slots as an explicit halo input)."""
    b, n = words.shape
    assert n % blk == 0
    rpad = (-b) % 8  # Mosaic wants the sublane block dim in multiples of 8
    if rpad:
        words = jnp.pad(words, ((0, rpad), (0, 0)))
    bp = b + rpad
    nblk = n // blk
    tails = words.reshape(bp, nblk, blk)[:, :, blk - _FILL_HALO :]
    halos = jnp.concatenate(
        [jnp.zeros((bp, 1, _FILL_HALO), jnp.uint32), tails[:, :-1]], axis=1
    ).reshape(bp, nblk * _FILL_HALO)
    out = pl.pallas_call(
        _logfill_kernel,
        grid=(bp // 8, nblk),
        in_specs=[
            pl.BlockSpec(
                (8, _FILL_HALO), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, blk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, blk), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(halos, words)
    return out[:b]
