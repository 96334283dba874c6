"""TPU-native parallel QOI decoder.

Two-pass pipeline (SURVEY.md §7 design stance):

1. *Boundary pass* (ops/boundary.py): tag-length classification + the
   5-phase composed scan locate every chunk start, its pixel output offset
   (prefix sum over per-chunk pixel counts, RUN = (tag&63)+1), and the
   reference's tolerant loop bound — all exactly, fully parallel.

2. *Reconstruction pass* (this module): chunks are compacted, split into S
   tiles, and replayed by a T-step lax.scan vectorized across tiles (the
   carry is the packed codec state: prev pixel + 64-entry table, SURVEY.md
   §5 "checkpoint" note).  Tiles 1..S-1 start from a *speculative* carry; a
   fixpoint loop feeds each tile its predecessor's out-state and re-replays
   until in-states equal predecessor out-states, which by induction from
   tile 0's true initial state proves every tile exact (bit-exact, no
   probabilistic reconciliation).  Convergence takes <= S rounds and in
   practice few: a tile's out-state depends on its in-state only through
   table slots it never overwrites.

3. *Expansion*: per-chunk emitted values are broadcast to pixels with a
   scatter(one-hot)+cummax+gather — RUN chunks cost O(1) state work
   regardless of their 1..62 pixel payout.

The sequential depth is T = chunks/S scan steps instead of one step per
pixel (reference: source/simple.cpp:111-170).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..common import Channels, Desc
from . import boundary
from .bitops import (
    START_PIXEL_PACKED,
    hash6,
    packed_to_pixels,
    swar_add_bytes,
)

# Chunk behavior classes for the replay scan.
NOP, SET, ADD, INDEX, RUN = 0, 1, 2, 3, 4

_START_HASH = (11 * 255) % 64  # hash of the start pixel (0,0,0,255) = 53


def _classify_chunks(region, pos, valid):
    """Gather per-chunk fields from chunk start positions.

    region: (Qb + 8,) uint8 (8 bytes of zero slack for operand gathers).
    pos:    (C_cap,) int32 chunk start offsets into region.
    valid:  (C_cap,) bool — False rows become NOP.

    Returns cls, val, nmask, arg — all (C_cap,).
      SET:   new = (prev & nmask) | val   (RGB keeps prev alpha)
      ADD:   new = prev +_swar val        (DIFF/LUMA deltas, alpha delta 0)
      INDEX: new = seen[arg]
      RUN:   new = prev, no state update
    """
    tag = region[pos].astype(jnp.int32)
    b1 = region[pos + 1].astype(jnp.uint32)
    b2 = region[pos + 2].astype(jnp.uint32)
    b3 = region[pos + 3].astype(jnp.uint32)
    b4 = region[pos + 4].astype(jnp.uint32)

    is_rgb = tag == 0xFE
    is_rgba = tag == 0xFF
    top = tag & 0xC0
    is_index = (~is_rgb) & (~is_rgba) & (top == 0x00)
    is_diff = (~is_rgb) & (~is_rgba) & (top == 0x40)
    is_luma = (~is_rgb) & (~is_rgba) & (top == 0x80)
    is_run = (~is_rgb) & (~is_rgba) & (top == 0xC0)

    cls = jnp.where(
        is_rgb | is_rgba,
        SET,
        jnp.where(is_diff | is_luma, ADD, jnp.where(is_index, INDEX, RUN)),
    )
    cls = jnp.where(valid, cls, NOP).astype(jnp.int32)

    # SET value/mask: RGBA replaces all four bytes, RGB keeps prev alpha
    # (reference: simple.cpp:119-129 — curr starts as prev).
    set_val = b1 | (b2 << 8) | (b3 << 16) | jnp.where(is_rgba, b4 << 24, 0)
    nmask = jnp.where(is_rgba, jnp.uint32(0), jnp.uint32(0xFF000000))

    # ADD deltas, per-byte mod 256 (reference: simple.cpp:137-155).
    t32 = tag
    dr_d = (((t32 >> 4) & 3) - 2) & 0xFF
    dg_d = (((t32 >> 2) & 3) - 2) & 0xFF
    db_d = ((t32 & 3) - 2) & 0xFF
    diff_delta = (
        dr_d.astype(jnp.uint32)
        | (dg_d.astype(jnp.uint32) << 8)
        | (db_d.astype(jnp.uint32) << 16)
    )
    vg = (t32 & 0x3F) - 32
    lr = (vg + ((b1.astype(jnp.int32) >> 4) & 0xF) - 8) & 0xFF
    lg = vg & 0xFF
    lb = (vg + (b1.astype(jnp.int32) & 0xF) - 8) & 0xFF
    luma_delta = (
        lr.astype(jnp.uint32)
        | (lg.astype(jnp.uint32) << 8)
        | (lb.astype(jnp.uint32) << 16)
    )

    val = jnp.where(is_diff, diff_delta, jnp.where(is_luma, luma_delta, set_val))
    arg = jnp.where(is_index, t32 & 0x3F, 0).astype(jnp.int32)
    return cls, val.astype(jnp.uint32), nmask, arg


def _replay_step(carry, xs):
    prev, seen = carry  # (S,), (S, 64) packed uint32
    cls, val, nmask, arg = xs

    idx_val = jnp.take_along_axis(seen, arg[:, None], axis=1)[:, 0]
    set_val = (prev & nmask) | val
    add_val = swar_add_bytes(prev, val)

    v = jnp.where(
        cls == SET,
        set_val,
        jnp.where(cls == ADD, add_val, jnp.where(cls == INDEX, idx_val, prev)),
    )
    upd = (cls == SET) | (cls == ADD) | (cls == INDEX)
    prev2 = jnp.where(upd, v, prev)
    h = hash6(v)
    slots = jnp.arange(64, dtype=jnp.int32)
    hot = (slots[None, :] == h[:, None]) & upd[:, None]
    seen2 = jnp.where(hot, v[:, None], seen)
    return (prev2, seen2), v


def _true_init(s_tiles):
    prev0 = jnp.full((s_tiles,), START_PIXEL_PACKED, dtype=jnp.uint32)
    seen0 = jnp.zeros((s_tiles, 64), dtype=jnp.uint32)
    # Decoder quirk: the running array is seeded with the start pixel
    # (reference: simple.cpp:108, stream.cpp:306).
    seen0 = seen0.at[:, _START_HASH].set(START_PIXEL_PACKED)
    return prev0, seen0


def extract_chunks(region, real, produced, pix_before, c_cap: int):
    """Compact boundary-analysis arrays into dense per-chunk fields.

    Returns dict with cls/val/nmask/arg (replay inputs) and
    produced/pixoff/valid (expansion inputs), all (c_cap,)."""
    qb = real.shape[0]
    q = jnp.arange(qb, dtype=jnp.int32)

    cidx = jnp.cumsum(real.astype(jnp.int32)) - real.astype(jnp.int32)
    scat = jnp.where(real, cidx, c_cap)
    pos = jnp.zeros(c_cap, jnp.int32).at[scat].set(q, mode="drop")
    c_produced = (
        jnp.zeros(c_cap, jnp.int32).at[scat].set(produced, mode="drop")
    )
    c_pixoff = (
        jnp.zeros(c_cap, jnp.int32).at[scat].set(pix_before, mode="drop")
    )
    n_chunks = jnp.sum(real.astype(jnp.int32))
    valid = jnp.arange(c_cap) < n_chunks

    cls, val, nmask, arg = _classify_chunks(region, pos, valid)
    return {
        "cls": cls,
        "val": val,
        "nmask": nmask,
        "arg": arg,
        "produced": c_produced,
        "pixoff": c_pixoff,
        "valid": valid,
    }


def expand_pixels(emits_flat, c_produced, c_pixoff, valid, n_cap: int):
    """Broadcast per-chunk emitted values to their pixel ranges (RUN chunks
    cover 1..62 pixels) via scatter + cummax + gather."""
    c_cap = emits_flat.shape[0]
    covers = valid & (c_produced > 0) & (c_pixoff < n_cap)
    mark = (
        jnp.zeros(n_cap, jnp.int32)
        .at[jnp.where(covers, c_pixoff, n_cap)]
        .set(jnp.arange(c_cap, dtype=jnp.int32) + 1, mode="drop")
    )
    cover_chunk = jax.lax.cummax(mark) - 1
    packed = emits_flat[jnp.maximum(cover_chunk, 0)]
    return jnp.where(cover_chunk >= 0, packed, 0)


@partial(jax.jit, static_argnames=("c_cap", "s_tiles", "n_cap"))
def decode_chunks(region, real, produced, pix_before, n_px,
                  c_cap: int, s_tiles: int, n_cap: int):
    """Reconstruct pixels from boundary analysis.

    region:   (Qb + 8,) uint8.
    real/produced/pix_before: (Qb,) from boundary.analyze_region.
    Returns (packed_pixels (n_cap,) uint32, filled scalar).
    """
    t_len = c_cap // s_tiles

    fields = extract_chunks(region, real, produced, pix_before, c_cap)
    cls, val, nmask, arg = (
        fields["cls"], fields["val"], fields["nmask"], fields["arg"]
    )
    c_produced, c_pixoff, valid = (
        fields["produced"], fields["pixoff"], fields["valid"]
    )

    # -- tiled speculative replay with fixpoint reconciliation -------------
    to_tiles = lambda x: x.reshape(s_tiles, t_len).T  # (T, S) scan inputs
    xs = (to_tiles(cls), to_tiles(val), to_tiles(nmask), to_tiles(arg))

    prev_true, seen_true = _true_init(1)

    def replay(in_prev, in_seen, with_emits):
        (p, s), emits = jax.lax.scan(_replay_step, (in_prev, in_seen), xs)
        return (p, s, emits) if with_emits else (p, s)

    def want_of(out_p, out_s):
        want_p = jnp.concatenate([prev_true, out_p[:-1]])
        want_s = jnp.concatenate([seen_true, out_s[:-1]])
        return want_p, want_s

    def cond(st):
        _, _, done, it = st
        return (~done) & (it < s_tiles + 1)

    def body(st):
        in_p, in_s, _, it = st
        out_p, out_s = replay(in_p, in_s, False)
        want_p, want_s = want_of(out_p, out_s)
        done = jnp.all(want_p == in_p) & jnp.all(want_s == in_s)
        return want_p, want_s, done, it + 1

    init_p = jnp.concatenate(
        [prev_true, jnp.full((s_tiles - 1,), START_PIXEL_PACKED, jnp.uint32)]
    )
    init_s = jnp.concatenate(
        [seen_true, jnp.zeros((s_tiles - 1, 64), jnp.uint32)]
    )
    fin_p, fin_s, _, _ = jax.lax.while_loop(
        cond, body, (init_p, init_s, jnp.array(False), jnp.int32(0))
    )
    _, _, emits = replay(fin_p, fin_s, True)  # (T, S)
    emits_flat = emits.T.reshape(-1)  # chunk order

    packed = expand_pixels(emits_flat, c_produced, c_pixoff, valid, n_cap)
    filled = jnp.minimum(jnp.sum(c_produced), n_px)
    return packed, filled


# --------------------------------------------------------------------------
# Host-facing single-image wrapper
# --------------------------------------------------------------------------


def _bucket(n: int, lo: int = 128) -> int:
    n = max(n, lo)
    b = lo
    while b < n:
        b *= 2
    for frac in (3 * b // 4, 7 * b // 8):
        if frac >= n and frac % lo == 0:
            return frac
    return b


def _pick_tiles(c_cap: int) -> int:
    # one tile per 256 chunks, clamped; power of two dividing c_cap
    s = 1
    while s < 256 and s * 256 < c_cap:
        s *= 2
    while c_cap % s:
        s //= 2
    return max(s, 1)


def decode_single(data, desc: Desc, dst_channels: Channels) -> np.ndarray:
    """Decode one QOI stream -> raw bytes, bit-exact incl. the reference's
    tolerant truncated-input behavior (simple.cpp:106-113)."""
    data = np.asarray(data, dtype=np.uint8).reshape(-1)
    size = int(data.size)
    n_px = desc.width * desc.height
    chunks_size = size - 14 - 8

    def run_analysis(extra: int):
        qb = _bucket(size - 14 + extra, boundary.BLOCK)
        reg = np.zeros(qb + 8, dtype=np.uint8)
        reg[: size - 14] = data[14:]
        reg_j = jnp.asarray(reg)
        info = boundary.analyze_region(
            reg_j[:qb], jnp.int32(chunks_size), jnp.int32(n_px)
        )
        return reg_j, info

    region, info = run_analysis(0)
    total_px = int(info["total_pixels"])
    if total_px < n_px:
        # Tolerant path: zero-fill reads continue producing chunks until the
        # pixel count is satisfied; widen the analysis window to cover them.
        region, info = run_analysis(n_px - total_px + 8)

    n_chunks = int(info["total_chunks"])
    c_cap = _bucket(max(n_chunks, 1), 128)
    s_tiles = _pick_tiles(c_cap)
    n_cap = _bucket(n_px, 128)

    packed, _ = decode_chunks(
        region,
        info["real"],
        info["produced"],
        info["pix_before"],
        jnp.int32(n_px),
        c_cap=c_cap,
        s_tiles=s_tiles,
        n_cap=n_cap,
    )
    raw = packed_to_pixels(packed[:n_px], int(dst_channels))
    return np.asarray(raw)
