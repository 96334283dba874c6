"""Per-byte-position chunk-kind classification (shifted slices, no gathers).

Production dependency of the replay engine's dense field pass
(ops/decode.fields_dense_batch): every byte position of a stream region is
classified as a chunk kind with its payload fields; non-start positions are
masked to NOPK by the boundary pass's `real` flags.

Kind semantics (reference decode switch: source/simple.cpp:124-158):
SETA = OP_RGBA (absolute rgba), SETC = OP_RGB (absolute rgb, alpha passes
through), ADDK = OP_DIFF/OP_LUMA (per-channel mod-256 delta), IDXK =
OP_INDEX, RUNK = OP_RUN.
"""

from __future__ import annotations

import jax.numpy as jnp

# chunk kinds
NOPK, SETA, SETC, ADDK, IDXK, RUNK = 0, 1, 2, 3, 4, 5

_START_HASH = (11 * 255) % 64


def classify_kinds(region, qb: int, real):
    """Per-byte-position chunk kinds + payload fields via shifted slices."""
    tag = region[:qb].astype(jnp.int32)
    b1 = region[1 : qb + 1].astype(jnp.uint32)
    b2 = region[2 : qb + 2].astype(jnp.uint32)
    b3 = region[3 : qb + 3].astype(jnp.uint32)
    b4 = region[4 : qb + 4].astype(jnp.uint32)

    is_rgb = tag == 0xFE
    is_rgba = tag == 0xFF
    top = tag & 0xC0
    named = is_rgb | is_rgba
    is_index = (~named) & (top == 0x00)
    is_diff = (~named) & (top == 0x40)
    is_luma = (~named) & (top == 0x80)
    is_run = (~named) & (top == 0xC0)

    kind = jnp.select(
        [is_rgba, is_rgb, is_diff | is_luma, is_index, is_run],
        [SETA, SETC, ADDK, IDXK, RUNK],
        NOPK,
    )
    kind = jnp.where(real, kind, NOPK).astype(jnp.int32)

    # absolute rgb(a) for SET chunks
    r_abs, g_abs, b_abs, a_abs = b1, b2, b3, b4

    # per-channel mod-256 deltas for ADD chunks (reference: simple.cpp:137-155)
    diff_dr = ((((tag >> 4) & 3) - 2) & 0xFF).astype(jnp.uint32)
    diff_dg = ((((tag >> 2) & 3) - 2) & 0xFF).astype(jnp.uint32)
    diff_db = (((tag & 3) - 2) & 0xFF).astype(jnp.uint32)
    vg = (tag & 0x3F) - 32
    luma_dr = ((vg + ((b1.astype(jnp.int32) >> 4) & 0xF) - 8) & 0xFF).astype(jnp.uint32)
    luma_dg = (vg & 0xFF).astype(jnp.uint32)
    luma_db = ((vg + (b1.astype(jnp.int32) & 0xF) - 8) & 0xFF).astype(jnp.uint32)

    is_add = kind == ADDK
    dr = jnp.where(is_add, jnp.where(is_diff, diff_dr, luma_dr), 0)
    dg = jnp.where(is_add, jnp.where(is_diff, diff_dg, luma_dg), 0)
    db = jnp.where(is_add, jnp.where(is_diff, diff_db, luma_db), 0)

    arg = jnp.where(kind == IDXK, tag & 0x3F, 0).astype(jnp.int32)
    return kind, (r_abs, g_abs, b_abs, a_abs), (dr, dg, db), arg
