"""Parallel QOI chunk-boundary discovery.

A QOI byte stream is not self-synchronizing: a payload byte can look like
any tag, so chunk starts must be chained from the header (SURVEY.md §7
"hard parts" #2).  The reference resolves this trivially by decoding
sequentially (source/simple.cpp:111-170); here we parallelize it.

Formulation: every position p has a tag-determined chunk length len(p) in
{1,2,4,5}.  Define the *phase* phi(p) in {0..4} = (next chunk start >= p)
- p.  Because lengths are <= 5, consecutive starts are <= 5 apart and phi
is always < 5.  Its per-byte transition has a closed form:

    phi(p+1) = phi(p) - 1            if phi(p) > 0
             = len(p) - 1            if phi(p) == 0   (p is a start)

Blocks of B bytes therefore compose as maps {0..4} -> {0..4}:
1. per-block map: a B-step lax.scan on a (num_blocks, 5) uint8 carry
   (vector select+decrement per step — no gathers);
2. cross-block: jax.lax.associative_scan composing the 5-entry maps;
3. per-position phases: a second B-step scan replaying each block from its
   now-known entry phase.  is_start(p) == (phi(p) == 0).

Total: 2B sequential steps of tiny vector work + one log-depth scan over
block summaries — O(6 bytes/position) of memory traffic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BLOCK = 128  # bytes per phase block


def chunk_len_of(tags):
    """Chunk byte length decided by the tag byte alone (SURVEY.md §0):
    INDEX/DIFF/RUN=1, LUMA=2, RGB=4, RGBA=5."""
    t = tags.astype(jnp.int32)
    is_rgb = t == 0xFE
    is_rgba = t == 0xFF
    is_luma = (~is_rgb) & (~is_rgba) & ((t & 0xC0) == 0x80)
    return (
        1
        + jnp.where(is_luma, 1, 0)
        + jnp.where(is_rgb, 3, 0)
        + jnp.where(is_rgba, 4, 0)
    ).astype(jnp.uint8)


def chunk_starts(region):
    """region: (Qb,) uint8 chunk-region bytes (stream bytes from offset 14,
    zero-padded; Qb % BLOCK == 0).  Returns is_start: (Qb,) bool.

    Position 0 (stream offset 14) is by definition the first chunk start.
    """
    qb = region.shape[0]
    nblk = qb // BLOCK
    lens = chunk_len_of(region).reshape(nblk, BLOCK)

    # Stage A: per-block composed phase maps.
    ident = jnp.broadcast_to(jnp.arange(5, dtype=jnp.uint8), (nblk, 5))

    def step_map(carry, lens_col):
        nxt = jnp.where(carry > 0, carry - 1, (lens_col - 1)[:, None])
        return nxt, None

    block_map, _ = jax.lax.scan(step_map, ident, lens.T, unroll=16)  # (nblk, 5)

    # Stage B: exclusive composition across blocks (f then g => g[f[phi]]).
    def compose(a, b):
        return jnp.take_along_axis(b, a.astype(jnp.int32), axis=-1).astype(jnp.uint8)

    inclusive = jax.lax.associative_scan(compose, block_map, axis=0)
    entry_map = jnp.concatenate([ident[:1], inclusive[:-1]], axis=0)
    entry_phase = entry_map[:, 0]  # chain enters block 0 with phi = 0

    # Stage C: replay each block from its entry phase, record phi per byte.
    def step_phase(phi, lens_col):
        nxt = jnp.where(phi > 0, phi - 1, lens_col - 1)
        return nxt, phi

    _, phases = jax.lax.scan(step_phase, entry_phase, lens.T, unroll=16)  # (BLOCK, nblk)
    return (phases.T.reshape(-1) == 0)


@partial(jax.jit, static_argnames=())
def analyze_region(region, chunks_size, n_px):
    """Full boundary analysis of a chunk region.

    region:      (Qb,) uint8 — stream bytes from offset 14, zero-extended.
    chunks_size: traced scalar — real chunk-region byte count (stream size
                 - 22; the reference's loop bound, simple.cpp:110-113).
    n_px:        traced scalar — pixels the image owes.

    Returns dict of (Qb,)-shaped arrays:
      real:       this position starts a chunk the reference would decode
                  (loop condition: data left OR pixels owed).
      produced:   pixels this chunk emits (RUN: (tag&63)+1, else 1); 0 for
                  non-chunk positions.
      pix_before: exclusive prefix sum of produced over real chunks.
    """
    qb = region.shape[0]
    q = jnp.arange(qb, dtype=jnp.int32)
    is_start = chunk_starts(region)

    tag = region.astype(jnp.int32)
    is_run = (tag & 0xC0) == 0xC0
    # 0xFE/0xFF are RGB/RGBA, not RUN (reserved codes — SURVEY.md §0).
    is_run = is_run & (tag != 0xFE) & (tag != 0xFF)
    produced_raw = jnp.where(is_run, (tag & 0x3F) + 1, 1).astype(jnp.int32)

    produced0 = jnp.where(is_start, produced_raw, 0)
    pix_before0 = jnp.cumsum(produced0) - produced0

    # The reference's decode loop runs while (di < chunks_size) OR
    # (pi < n_px) — a start position is "real" iff that held when reached.
    real = is_start & ((q < chunks_size) | (pix_before0 < n_px))
    produced = jnp.where(real, produced_raw, 0)
    pix_before = jnp.cumsum(produced) - produced

    return {
        "real": real,
        "produced": produced,
        "pix_before": pix_before,
        "total_chunks": jnp.sum(real.astype(jnp.int32)),
        "total_pixels": jnp.sum(produced),
    }
