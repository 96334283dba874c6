"""Pallas TPU kernel: the encoder's per-pixel field pass, VMEM-local.

The XLA formulation (ops/encode._encode_fields) is exact but materializes
its one-hot table-scan intermediates — (tiles, 64, TILE)-shaped compare
masks — through HBM: ~60% of device-encode wall time was that traffic
(round-2 profile: fields 4.8 ms/image, table scan alone 2.9 ms).  This
kernel computes the same fields with every intermediate living in VMEM:

  * grid (B, nblk), sequential per image; scratch carries the encoder
    state entering each 2048-pixel block — prev pixel, run counter
    (mod 62), and the 64-entry table (replicated across lanes) — the same
    ~260-byte state vector the streaming codec checkpoints (SURVEY.md §5).
  * run streaks: log-shift prefix-max over the flat block (11 passes).
  * table scan: within-row (128 px) pairwise last-same-hash predecessor,
    per-row 64-slot summaries, a log-shift exclusive overwrite-scan
    across the 16 rows, and a one-hot lookup against the carried table —
    all dense VPU work on (16, 64..128, 128) tiles.
  * op selection + byte templates (precedence RUN > INDEX > DIFF > LUMA >
    RGB/RGBA and the int8-wraparound LUMA narrowing, SURVEY.md §0) are
    identical in structure to the XLA pass; outputs are the two packed
    template planes (tlo, thn) that feed ops/compact_kernel, plus each
    block's outgoing run counter (for the stream tail).

Bit-exact with _encode_fields for every input (differential-tested in
tests/test_fields_kernel.py).  Reference encoder loop: simple.cpp:36-89.

STATUS: retired experiment, not on the production path.  Its first
Mosaic lowering measured relayout-bound (39 us/block vs ~1 us of real
compute: the (R,128,128) lane-broadcasts of sublane-varying data —
see CLAUDE.md's Mosaic layout rules, learned from this kernel).  The
production encoder instead compacts FIRST and runs the XLA table scan
on the 5-10x smaller chunk domain (ops/encode._encode_kernel_impl),
which beats both this kernel and the dense XLA pass.  Kept with its
differential tests as the reference for a future transposed-layout
attempt.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 16                # 128-pixel rows per block
BLK = R * 128         # pixels per grid step
_START_I32 = -16777216  # int32 bit pattern of 0xFF000000 (start pixel)

TAG_RGB = 0xFE
TAG_RGBA = 0xFF
TAG_DIFF = 0x40
TAG_LUMA = 0x80
TAG_RUN = 0xC0


def _fshift(x, k: int, fill):
    """Shift (R, 128) right by k in flat row-major order, filling with
    the scalar `fill`."""
    r = x.shape[0]
    q, s = divmod(k, 128)
    if s:
        rolled = pltpu.roll(x, s, axis=1)
        up = jnp.concatenate(
            [jnp.full((1, 128), fill, x.dtype), rolled[:-1]], axis=0
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(lane >= s, rolled, up)
    if q:
        x = jnp.concatenate(
            [jnp.full((q, 128), fill, x.dtype), x[:-q]], axis=0
        )
    return x


def _ch(p, c: int):
    return (p >> (8 * c)) & 0xFF


def _i8(x):
    return ((x & 0xFF) + 128) % 256 - 128


def _fields_kernel(channels: int, npx_ref, packed_ref,
                   tlo_ref, thn_ref, runout_ref, tab_ref, carry_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _reset():
        tab_ref[:, :] = jnp.zeros_like(tab_ref)  # encoder table starts 0
        carry_ref[0] = _START_I32               # prev = (0,0,0,255)
        carry_ref[1] = 0                        # run counter

    packed = pltpu.bitcast(packed_ref[0, 0], jnp.int32)  # (R, 128)
    prev_c = carry_ref[0]
    run0 = carry_ref[1]

    lidx = (
        jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    )
    npx_local = jnp.clip(npx_ref[0] - j * BLK, 0, BLK)
    valid = lidx < npx_local

    prev = _fshift(packed, 1, prev_c)
    eq_raw = packed == prev
    noneq = valid & ~eq_raw

    # ---- run streaks (simple.cpp:39-49; carried counter mod 62) ---------
    neg = -(run0 + 1)
    m = jnp.where(noneq, lidx, neg)
    k = 1
    while k < BLK:
        m = jnp.maximum(m, _fshift(m, k, neg))
        k *= 2
    cnt = lidx - m
    hit62 = eq_raw & valid & (cnt % 62 == 0)
    cnt_prev = _fshift(cnt, 1, run0)
    eq_prev = _fshift(jnp.where(eq_raw, 1, 0), 1,
                      jnp.where(run0 > 0, 1, 0))
    pend = jnp.where(eq_prev != 0, cnt_prev % 62, 0)
    flush = noneq & (pend > 0)

    # ---- table scan ------------------------------------------------------
    h = (_ch(packed, 0) * 3 + _ch(packed, 1) * 5
         + _ch(packed, 2) * 7 + _ch(packed, 3) * 11) & 63  # (R, 128)

    i_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 1)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 2)
    pair = (
        (h[:, :, None] == h[:, None, :]) & (j_iota < i_iota)
        & noneq[:, None, :]
    )
    lastj = jnp.max(jnp.where(pair, j_iota, -1), axis=2)  # (R, 128)
    local_val = jnp.sum(
        jnp.where(j_iota == lastj[:, :, None], packed[:, None, :], 0), axis=2
    )
    local_found = lastj >= 0

    # slot arrays are 128 wide for lane alignment; slots 64..127 are inert
    # (h < 64 never matches them)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 1)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 2)
    covers = (h[:, None, :] == s_iota) & noneq[:, None, :]
    tj = jnp.max(jnp.where(covers, jj2, -1), axis=2)  # (R, 128) slots
    t_written = jnp.where(tj >= 0, 1, 0)  # i32 flags (Mosaic dislikes
    # mask-vreg concatenates/bitcasts in the scan below)
    t_val = jnp.sum(
        jnp.where(jj2 == tj[:, :, None], packed[:, None, :], 0), axis=2
    )  # (R, 128) slots

    # inclusive overwrite-scan across rows (log-shift)
    sv, sw = t_val, t_written
    k = 1
    while k < R:
        pv = jnp.concatenate([jnp.zeros((k, 128), sv.dtype), sv[:-k]], axis=0)
        pw = jnp.concatenate([jnp.zeros((k, 128), jnp.int32), sw[:-k]], axis=0)
        sv = jnp.where(sw != 0, sv, pv)
        sw = sw | pw
        k *= 2
    tab_in = tab_ref[0:1, :]  # (1, 128) carried table (slots 64.. unused)
    ev = jnp.concatenate([jnp.zeros((1, 128), sv.dtype), sv[:-1]], axis=0)
    ew = jnp.concatenate([jnp.zeros((1, 128), jnp.int32), sw[:-1]], axis=0)
    inc_v = jnp.where(ew != 0, ev, tab_in)  # (R, 128): table entering each row

    inc_at_px = jnp.sum(
        jnp.where(h[:, None, :] == s_iota, inc_v[:, :, None], 0), axis=1
    )  # (R, 128) pixels
    table_val = jnp.where(local_found, local_val, inc_at_px)

    # carry the table out
    tab_ref[0:1, :] = jnp.where(sw[R - 1 : R] != 0, sv[R - 1 : R], tab_in)

    # ---- op selection (simple.cpp:51-79) --------------------------------
    is_index = noneq & (table_val == packed)
    a_cur = _ch(packed, 3)
    if channels == 4:
        is_rgba = noneq & ~is_index & (a_cur != _ch(prev, 3))
    else:
        is_rgba = jnp.zeros((R, 128), bool)

    dr = _i8(_ch(packed, 0) - _ch(prev, 0))
    dg = _i8(_ch(packed, 1) - _ch(prev, 1))
    db = _i8(_ch(packed, 2) - _ch(prev, 2))
    dr_dg = _i8(dr - dg)
    db_dg = _i8(db - dg)

    in_diff = (
        (dr >= -2) & (dr <= 1) & (dg >= -2) & (dg <= 1) & (db >= -2) & (db <= 1)
    )
    in_luma = (
        (dg >= -32) & (dg <= 31)
        & (dr_dg >= -8) & (dr_dg <= 7)
        & (db_dg >= -8) & (db_dg <= 7)
    )
    rest = noneq & ~is_index & ~is_rgba
    is_diff = rest & in_diff
    is_luma = rest & ~in_diff & in_luma
    is_rgb = rest & ~in_diff & ~in_luma

    own_len = jnp.where(
        is_index, 1,
        jnp.where(is_rgba, 5,
                  jnp.where(is_diff, 1,
                            jnp.where(is_luma, 2, jnp.where(is_rgb, 4, 0)))),
    )

    r8, g8, b8 = _ch(packed, 0), _ch(packed, 1), _ch(packed, 2)
    diff_byte = TAG_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
    luma0 = TAG_LUMA | (dg + 32)
    luma1 = ((dr_dg + 8) << 4) | (db_dg + 8)
    index_byte = h

    z = jnp.zeros((R, 128), jnp.int32)
    o0 = jnp.where(is_index, index_byte,
                   jnp.where(is_rgba, TAG_RGBA,
                             jnp.where(is_diff, diff_byte,
                                       jnp.where(is_luma, luma0,
                                                 jnp.where(is_rgb, TAG_RGB, z)))))
    o1 = jnp.where(is_rgba | is_rgb, r8, jnp.where(is_luma, luma1, z))
    o2 = jnp.where(is_rgba | is_rgb, g8, z)
    o3 = jnp.where(is_rgba | is_rgb, b8, z)
    o4 = jnp.where(is_rgba, a_cur, z)

    run_byte = jnp.where(hit62, TAG_RUN | 61, TAG_RUN | ((pend - 1) & 0x3F))
    hr = hit62 | flush
    b0 = jnp.where(hr, run_byte, o0)
    b1 = jnp.where(hr, o0, o1)
    b2 = jnp.where(hr, o1, o2)
    b3 = jnp.where(hr, o2, o3)
    b4 = jnp.where(hr, o3, o4)
    b5 = jnp.where(hr, o4, z)
    nbytes = own_len + jnp.where(hr, 1, 0)

    tlo = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    thn = b4 | (b5 << 8) | (nbytes << 16)
    tlo_ref[0, 0] = pltpu.bitcast(tlo, jnp.uint32)
    thn_ref[0, 0] = pltpu.bitcast(thn, jnp.uint32)

    # ---- carries + per-block outgoing run counter ------------------------
    last = npx_local - 1  # only meaningful when npx_local > 0
    at_last = lidx == last
    run_out = jnp.sum(
        jnp.where(at_last & eq_raw & valid, cnt % 62, 0)
    )
    runout_ref[0, 0, j] = run_out
    carry_ref[1] = run_out
    carry_ref[0] = jnp.sum(jnp.where(lidx == BLK - 1, packed, 0))


@partial(jax.jit, static_argnames=("channels", "interpret"))
def encode_fields_planes(packed, n_px, channels: int,
                         interpret: bool | None = None):
    """(B, Nb) u32 packed pixels -> (tlo, thn) template planes (B, Nb) u32
    + run_out (B, nblk) i32 (outgoing run counter per 2048-px block).

    Nb % BLK == 0.  Bit-exact with ops/encode._encode_fields' templates
    packed through _pack_template_planes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, nb = packed.shape
    assert nb % BLK == 0
    nblk = nb // BLK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, R, 128), lambda i, j, ref: (i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R, 128), lambda i, j, ref: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, R, 128), lambda i, j, ref: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, nblk), lambda i, j, ref: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    tlo, thn, run_out = pl.pallas_call(
        partial(_fields_kernel, channels),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nblk, R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((b, nblk, R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((b, 1, nblk), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.atleast_1d(n_px).astype(jnp.int32),
        packed.reshape(b, nblk, R, 128),
    )
    return tlo.reshape(b, nb), thn.reshape(b, nb), run_out.reshape(b, nblk)
