"""Wave decoder: QOI decode as an iterated dense dataflow solve.

The only sequential dependency in QOI decode is the interplay between the
prev-pixel chain and the 64-entry table.  Two structural theorems factor it:

T1. Every table entry always sits at its own hash slot (writes are
    seen[hash(v)] = v; the seeds (0,0,0,255)@53 and zeros@0 satisfy it), so
    an OP_INDEX write-back stores the value it just read into the slot it
    read — a NO-OP.  The table is therefore mutated ONLY by RGB/RGBA/DIFF/
    LUMA chunks ("writers").  (The one exception — INDEX reading a
    never-written slot other than 0/53, which a conforming encoder cannot
    emit (it only emits INDEX on a table hit) — is detected exactly and
    reported for an oracle fallback.)

T2. Between anchor chunks (RGB/RGBA/INDEX), pixel values follow the
    prev-chain in closed form: +delta (mod 256) at DIFF/LUMA, identity at
    RUN.  Entire chain segments therefore collapse with one per-channel
    prefix-sum, given the anchors.

Decode becomes a Jacobi-style iteration on the exact per-chunk equations

    v[RGBA] = const                    v[DIFF/LUMA] = prev + delta
    v[RGB]  = rgb | alpha(prev)        v[RUN]       = prev
    v[INDEX]= value of the last writer before it whose hash slot matches

where each iteration evaluates ALL equations simultaneously with dense
vector passes (cumsum / piece-tagged cummax fill-forwards / masked
reductions — no lax.scan over chunks, no gathers):

  1. alpha plane: fill-forward of alpha setters (RGBA absolute, INDEX
     current estimates);
  2. rgb planes: segmented mod-256 prefix sums keyed at anchors;
  3. table: for every INDEX position, the last writer with matching slot
     (block-pairwise max + per-slot block summaries + cross-block
     fill-forward), using the freshly chained writer values;
  4. new INDEX estimates; repeat until values stop changing.

Every chunk whose true dependencies resolved in iteration k resolves in
iteration k+1, and a resolved prefix can never regress (each equation is
re-evaluated from earlier-position inputs only) — so the unique fixpoint
is the exact sequential result, reached in (INDEX dependency depth + 2)
iterations: a handful on real images, independent of image size.

RETIRED TO EXAMPLES (round 2): the production decoder is the Pallas replay
+ place/fill kernel pipeline (ops/replay_kernel.py + ops/place_kernel.py),
which is exact for every stream including adversarial ones and faster in
practice; the scan-fixpoint engine (ops/decode.decode_bytes) powers the
sequence-parallel sharded path.  This module is kept as a worked example of
the dataflow-solve formulation and its two theorems, with a parity test in
tests/test_alt_engines.py.
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qoipp_tpu.ops.bitops import START_PIXEL_PACKED, hash6
from qoipp_tpu.ops.classify import (
    ADDK, IDXK, NOPK, RUNK, SETA, SETC, classify_kinds,
)
from qoipp_tpu.ops.fill import fill_forward

BLOCK_W = 128  # pairwise block for table lookups
_START_HASH = (11 * 255) % 64


def _pack(r, g, b, a):
    return (
        (r & 0xFF)
        | ((g & 0xFF) << 8)
        | ((b & 0xFF) << 16)
        | ((a & 0xFF) << 24)
    ).astype(jnp.uint32)


@partial(jax.jit, static_argnames=("n_cap",))
def wave_decode(region, real, produced, pix_before, n_px, n_cap: int):
    """Decode via the iterated dataflow solve.  region: (qb+8,) u8; boundary
    arrays (qb,), qb % BLOCK_W == 0.  Returns (packed (n_cap,), filled,
    crafted).  `crafted` signals the T1 exception — the caller must fall
    back to an exact sequential oracle for such streams."""
    qb = real.shape[0]
    nblk = qb // BLOCK_W
    q_ids = jnp.arange(qb, dtype=jnp.int32)

    kind, (r_abs, g_abs, b_abs, a_abs), (dr, dg, db), arg = classify_kinds(
        region, qb, real
    )
    is_seta = kind == SETA
    is_setc = kind == SETC
    is_set = is_seta | is_setc
    writers = is_set | (kind == ADDK)
    isidx = kind == IDXK

    cum_r = jnp.cumsum(dr)
    cum_g = jnp.cumsum(dg)
    cum_b = jnp.cumsum(db)

    j_ids = jnp.arange(BLOCK_W, dtype=jnp.int32)
    slot_ids = jnp.arange(64, dtype=jnp.int32)
    blk_base = jnp.arange(nblk, dtype=jnp.int32)[:, None] * BLOCK_W
    qbits = (qb + 1).bit_length()
    init_slot_val = jnp.where(
        arg == _START_HASH, jnp.uint32(START_PIXEL_PACKED), jnp.uint32(0)
    )

    def evaluate(v):
        """One simultaneous evaluation of all chunk equations given the
        current INDEX estimates in v.  Returns (v_new, idx_has_writer)."""
        # --- alpha plane: fill-forward of setters --------------------
        setter = real & (is_seta | isidx)
        alpha_src = jnp.where(is_seta, a_abs, v >> 24)
        (fa,), got_a, _ = fill_forward([(alpha_src, 8)], setter, setter)
        alpha = jnp.where(got_a, fa, 0xFF)

        # --- rgb planes: segmented prefix sums from anchors ----------
        anchor = real & (is_set | isidx)
        ar = jnp.where(is_set, r_abs, v & 0xFF)
        ag = jnp.where(is_set, g_abs, (v >> 8) & 0xFF)
        ab = jnp.where(is_set, b_abs, (v >> 16) & 0xFF)
        key_r = (ar - cum_r) & 0xFF
        key_g = (ag - cum_g) & 0xFF
        key_b = (ab - cum_b) & 0xFF
        (fr, fg, fb), got, _ = fill_forward(
            [(key_r, 8), (key_g, 8), (key_b, 8)], anchor, anchor
        )
        chain_r = jnp.where(got, (fr + cum_r) & 0xFF, cum_r & 0xFF)
        chain_g = jnp.where(got, (fg + cum_g) & 0xFF, cum_g & 0xFF)
        chain_b = jnp.where(got, (fb + cum_b) & 0xFF, cum_b & 0xFF)

        # alpha entering chunk q excludes q's own setter effect only for
        # SETC (it passes alpha through); for ADD/RUN the inclusive
        # fill-forward already equals the pass-through value.
        v_chain = _pack(chain_r, chain_g, chain_b, alpha)
        v_nonidx = jnp.where(
            is_seta,
            _pack(r_abs, g_abs, b_abs, a_abs),
            jnp.where(is_setc, _pack(r_abs, g_abs, b_abs, alpha), v_chain),
        )

        # --- table: last writer per INDEX position -------------------
        vw = jnp.where(isidx, v, v_nonidx)  # fresh writer values
        h = hash6(vw)
        rwB = (writers & real).reshape(nblk, BLOCK_W)
        hB = h.reshape(nblk, BLOCK_W).astype(jnp.int32)
        argB = arg.reshape(nblk, BLOCK_W)
        vB = vw.reshape(nblk, BLOCK_W)

        cand = (
            rwB[:, None, :]
            & (hB[:, None, :] == argB[:, :, None])
            & (j_ids[None, None, :] < j_ids[None, :, None])
        )
        jbest = jnp.max(jnp.where(cand, j_ids[None, None, :] + 1, 0), axis=2)
        sel = (j_ids[None, None, :] + 1) == jbest[:, :, None]
        v_loc = jnp.sum(jnp.where(sel, vB[:, None, :], 0), axis=2).reshape(-1)
        local_found = (jbest > 0).reshape(-1)

        m = rwB[:, None, :] & (hB[:, None, :] == slot_ids[None, :, None])
        jb2 = jnp.max(jnp.where(m, j_ids[None, None, :] + 1, 0), axis=2)
        sel2 = (j_ids[None, None, :] + 1) == jb2[:, :, None]
        val_blk = jnp.sum(jnp.where(sel2, vB[:, None, :], 0), axis=2)
        written_blk = jb2 > 0

        (ival,), igot, _ = fill_forward(
            [(val_blk.T, 32)], written_blk.T, written_blk.T, axis=-1
        )  # (64, nblk) inclusive
        inc_val = jnp.concatenate(
            [jnp.zeros((64, 1), jnp.uint32), ival[:, :-1]], axis=1
        )
        inc_got = jnp.concatenate(
            [jnp.zeros((64, 1), bool), igot[:, :-1]], axis=1
        )

        def blk_to_q(x):
            return jnp.broadcast_to(
                x[:, :, None], (64, nblk, BLOCK_W)
            ).reshape(64, qb)

        sel_arg = slot_ids[:, None] == arg[None, :]
        inc_val_q = jnp.sum(jnp.where(sel_arg, blk_to_q(inc_val), 0), axis=0)
        inc_got_q = jnp.any(sel_arg & blk_to_q(inc_got), axis=0)

        have_writer = local_found | inc_got_q
        w_val = jnp.where(local_found, v_loc, inc_val_q)
        idx_val = jnp.where(have_writer, w_val, init_slot_val)

        v_new = jnp.where(isidx, idx_val, v_nonidx)
        v_new = jnp.where(real, v_new, 0)
        return v_new, have_writer

    def cond(state):
        v, v_prev, it = state
        return (it < qb) & ((it < 2) | jnp.any(v != v_prev))

    def body(state):
        v, _, it = state
        v_new, _ = evaluate(v)
        return v_new, v, it + 1

    v0 = jnp.zeros(qb, jnp.uint32)
    v_f, _, iters = jax.lax.while_loop(cond, body, (v0, v0, jnp.int32(0)))
    # One more evaluation for the final writer-existence flags.
    v_f, have_writer = evaluate(v_f)
    crafted = jnp.any(
        isidx & ~have_writer & (arg != 0) & (arg != _START_HASH)
    )

    # ---- expansion ----------------------------------------------------
    # prev chunk's value for the telescoping-delta trick
    (pf,), pgot, _ = fill_forward([(v_f, 32)], real, real)
    prevv = jnp.concatenate(
        [jnp.array([START_PIXEL_PACKED], jnp.uint32),
         jnp.where(pgot[:-1], pf[:-1], START_PIXEL_PACKED)]
    )
    covers = real & (produced > 0) & (pix_before < n_cap)
    idx = jnp.minimum(pix_before, n_cap)
    delta = v_f - prevv
    vals = jnp.where(covers, delta, 0)
    out0 = (
        jnp.zeros(n_cap + 1, jnp.uint32)
        .at[idx].add(vals, indices_are_sorted=True)[:n_cap]
    )
    packed = jnp.cumsum(out0) + START_PIXEL_PACKED

    filled = jnp.minimum(jnp.sum(produced), n_px)
    waves = iters
    return packed, filled, crafted
