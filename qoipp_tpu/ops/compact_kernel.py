"""Pallas TPU kernel: monotone stream compaction via MXU one-hot matmuls.

The round-1 pipelines paid XLA's serial scatter price (~5-10 ns/element on
this backend) over the *byte domain*: decode expanded pixels from one
scatter element per stream byte, encode placed bytes from six scatter-adds
per pixel.  Both scatters have monotone target indices whose only
irregularity is *compaction* — most rows are masked out (NOP bytes / run
pixels).  This kernel removes that irregularity with dense hardware:

  out[p][gidx[r]] = plane[p][r]   for every kept row r,
  gidx = exclusive running count of kept rows  (monotone, step <= 1)

Per block of K rows the kept rows land in a K+128-wide aligned window
[r0 - r0%128, ...); placing them is a (K x 128)-shaped one-hot matmul per
128-row output stripe — exactly the MXU's shape.  Values are split into
8-bit quarters so the dot runs at DEFAULT precision (ONE bf16 MXU pass
instead of HIGHEST's six, round-3 change): bytes are bf16-exact and every
output element receives exactly one kept row's contribution.  A
"pending row" scratch carries the partially-filled last 128-lane row
between consecutive blocks (the Pallas grid is sequential per core), and
each block DMAs its aligned window straight to HBM at an element-granular
offset — no XLA scatter anywhere.

Downstream, scatters run over the compacted chunk domain (5-50x fewer
elements), which is what moves decode expansion and encode emission off
the serial-scatter floor (reference hot loops: source/simple.cpp:36-89,
111-170 — one sequential byte/pixel at a time; here the compaction is
O(K) dense work on the MXU per K rows).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048  # rows per grid step (K); must be a multiple of 128


def _compact_kernel(quarters: tuple, sout: int, secbits: int,
                    gidx_ref, keep_ref, *rest):
    """rest = plane_refs(nplanes) + out_ref (ANY, merged planes) + scratch:
    pend (sum(quarters), 128) f32, obuf (2, nplanes, sout,
    128) u32 double-buffered, sem (2,) DMA semaphores, prev (3,) SMEM
    [prev_b, prev_row0, has_prev] for the deferred-wait protocol.

    quarters[p] = number of ACTIVE sections of plane p; secbits selects the
    section width:
      * 8  — 8-bit quarters, dot at DEFAULT precision (ONE bf16 pass;
        values <= 255 are bf16-exact).  Callers whose plane values fit
        fewer bytes skip all-zero A-sections and dot rows — e.g.
        position|flag planes bounded by 2^24 use 3.
      * 16 — 16-bit halfwords, dot at HIGHEST precision (bf16_6x; Mosaic
        rejects HIGH/bf16_3x).  EXACT: the one-hot operand is
        bf16-representable, so the multi-pass product reduces to
        a_hi*b + a_lo*b = a*b with a < 2^16 split exactly across two
        bf16 terms, and every output element receives exactly one
        contribution.  HALF the A-build VPU work of 8-bit quarters for
        more MXU passes — pick per call site by measurement."""
    nplanes = len(quarters)
    plane_refs = rest[:nplanes]
    out_ref = rest[nplanes]
    pend_ref, obuf_ref, sem_ref, prev_ref = rest[nplanes + 1 :]

    b = pl.program_id(0)
    j = pl.program_id(1)
    nblk_ = pl.num_programs(1)
    r = gidx_ref.shape[2]  # rows of 128 lanes per block (BLK // 128)

    @pl.when((b == 0) & (j == 0))
    def _reset0():
        prev_ref[2] = 0
        prev_ref[3] = 0

    @pl.when(j == 0)
    def _reset():
        pend_ref[:, :] = jnp.zeros_like(pend_ref)

    gidx = gidx_ref[0, 0].astype(jnp.int32)  # (r, 128)
    keep = keep_ref[0, 0] != 0  # (r, 128)
    cov = jnp.sum(keep.astype(jnp.int32))

    r0 = gidx[0, 0]
    rot = jax.lax.rem(r0, 128)
    row0 = jax.lax.div(r0, 128)

    # local flat target in [rot, rot + BLK); masked rows -> -1 (no one-hot hit)
    t = jnp.where(keep, gidx - r0 + rot, -1)
    ts = t // 128  # target stripe in [0, sout)
    tl = jnp.where(keep, t - ts * 128, -1)  # target lane

    # Empty blocks (run interiors, flat regions) skip compute and the
    # output DMA entirely — the carried pend row and write frontier
    # are unchanged by a zero-coverage window.
    @pl.when(cov > 0)
    def _compact_block():
        gslot = prev_ref[3]
        nh = sum(quarters)  # active sections
        k = r * 128
        shifts = (0, 8, 16, 24) if secbits == 8 else (0, 16)
        mask = (1 << secbits) - 1
        halves = []
        for p in range(nplanes):
            v = plane_refs[p][0, 0]  # (r, 128) uint32
            # Mosaic has no u32->f32 cast; the sections fit int32 exactly.
            for sh in shifts[: quarters[p]]:
                halves.append(
                    ((v >> sh) & mask).astype(jnp.int32)
                    .astype(jnp.float32).reshape(1, k)
                )

        # acc[(h, s), l] = sum_k halves[h][k] * (ts[k] == s) * (tl[k] == l)
        # as ONE MXU-shaped contraction: A (nh*sout, K) x BmT (128, K) over
        # the shared K axis (dot_general (1,1): both operands keep K on
        # lanes, so neither needs a lane->sublane relayout — the earlier
        # per-row formulation relayouted tl[rr] once per row).
        ts_flat = ts.reshape(1, k)
        s_rows = jax.lax.broadcasted_iota(jnp.int32, (sout, k), 0)
        a_secs = [
            jnp.where(ts_flat == s_rows, halves[h], 0.0) for h in range(nh)
        ]
        a = jnp.concatenate(a_secs, axis=0)  # (nh*sout, K)
        l_rows = jax.lax.broadcasted_iota(jnp.int32, (128, k), 0)
        bmat_t = (tl.reshape(1, k) == l_rows).astype(jnp.float32)  # (128, K)
        acc = jax.lax.dot_general(
            a, bmat_t, (((1,), (1,)), ((), ())),
            precision="default" if secbits == 8 else "highest",
            preferred_element_type=jnp.float32,
        )

        # merge the carried partial row into stripe 0 of every half
        pend = pend_ref[:, :]  # (4*nplanes, 128) f32
        sections = []
        for h in range(nh):
            sec = acc[h * sout : (h + 1) * sout]  # (sout, 128)
            sec = jnp.concatenate([sec[:1] + pend[h][None, :], sec[1:]], axis=0)
            sections.append(sec)

        # new pending = the partially-filled row at the window's write frontier
        endpos = rot + cov
        last_row = endpos // 128
        newrot = endpos - last_row * 128
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (sout, 128), 0)
        for h in range(nh):
            # dynamic row extract via one-hot sum (no dynamic_slice in Mosaic)
            tail = jnp.sum(
                jnp.where(row_ids == last_row, sections[h], 0.0),
                axis=0, keepdims=True,
            )
            pend_ref[h, :] = jnp.where(lane1 < newrot, tail, 0.0)[0]

        base_h = 0
        for p in range(nplanes):
            # f32 -> i32 is the supported path; sections are < 2^secbits
            # so the int32 bit patterns equal the uint32 ones.
            q = [sections[base_h + j].astype(jnp.int32)
                 for j in range(quarters[p])]
            w = q[0]
            for j in range(1, quarters[p]):
                w = w | (q[j] << (secbits * j))
            obuf_ref[gslot, p] = w.astype(jnp.uint32)
            base_h += quarters[p]

        # Clamp keeps the DMA in bounds even if a caller-supplied cap is
        # exceeded (output is then garbage past the cap, never OOB; callers
        # detect via counts — see encode_batch_checked).
        cap_rows = out_ref.shape[2]
        row0c = jnp.minimum(row0, cap_rows - sout)

        # Deferred-wait protocol: the previous block's output DMA flies while
        # this block computes; waiting for it HERE (before starting our own
        # copy) both hides its latency and serializes the overlapping partial-
        # row writes between consecutive windows.
        @pl.when(prev_ref[2] == 1)
        def _wait_prev():
            pltpu.make_async_copy(
                obuf_ref.at[1 - gslot],
                out_ref.at[prev_ref[0], :, pl.ds(prev_ref[1], sout), :],
                sem_ref.at[1 - gslot],
            ).wait()

        pltpu.make_async_copy(
            obuf_ref.at[gslot],
            out_ref.at[b, :, pl.ds(row0c, sout), :],
            sem_ref.at[gslot],
        ).start()
        prev_ref[0] = b
        prev_ref[1] = row0c
        prev_ref[2] = 1
        prev_ref[3] = 1 - gslot


    nb_ = pl.num_programs(0)

    @pl.when((b == nb_ - 1) & (j == nblk_ - 1) & (prev_ref[2] == 1))
    def _final_wait():
        # prev_ref points at the last STARTED dma (ours if this block
        # compacted anything, else an earlier block's)
        pltpu.make_async_copy(
            obuf_ref.at[1 - prev_ref[3]],
            out_ref.at[prev_ref[0], :, pl.ds(prev_ref[1], sout), :],
            sem_ref.at[1 - prev_ref[3]],
        ).wait()


@partial(jax.jit,
         static_argnames=("cap", "blk", "interpret", "quarters", "secbits"))
def compact_rows(planes, keep, cap: int, blk: int = BLK,
                 interpret: bool | None = None,
                 quarters: tuple | None = None,
                 secbits: int = 8):
    """Compact kept rows of one or more (B, N) uint32 planes to the front.

    planes: tuple of (B, N) uint32 — values to compact (same keep mask).
    keep:   (B, N) bool — which rows survive.
    cap:    static output width; must satisfy cap % 128 == 0 and
            cap >= max_b(count_b) rounded up so that every write window
            [gidx - gidx%128, +blk+128) fits: cap >= counts.max() + blk + 128.
    quarters: optional per-plane count of ACTIVE low sections (default:
            full coverage — 4 at secbits=8, 2 at secbits=16).  A plane
            whose values fit fewer sections can skip its all-zero
            sections' A-build and MXU dot rows — e.g. position|flag
            planes bounded by 2^24 pass 3 (secbits=8) / 2 (secbits=16).
            Higher bits of such a plane's output are zero.
    secbits: 8 (one bf16 MXU pass per section) or 16 (bf16_3x; half the
            A-build VPU work — both exact, see _compact_kernel).

    Returns (compacted: tuple of (B, cap) uint32, counts: (B,) int32).
    Rows beyond counts[b] are unspecified — mask downstream.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n = keep.shape
    assert n % blk == 0 and blk % 128 == 0 and cap % 128 == 0
    assert secbits in (8, 16)
    max_secs = 4 if secbits == 8 else 2
    nplanes = len(planes)
    if quarters is None:
        quarters = (max_secs,) * nplanes
    assert len(quarters) == nplanes and all(
        1 <= q <= max_secs for q in quarters)
    sout = blk // 128 + 1
    assert cap >= blk + 128, "cap too small for one write window"

    keep_i = keep.astype(jnp.uint32)
    incl = jnp.cumsum(keep_i, axis=1, dtype=jnp.uint32).astype(jnp.int32)
    counts = incl[:, -1]
    gidx = incl - keep_i.astype(jnp.int32)  # exclusive

    nblk = n // blk
    r = blk // 128
    shape4 = (b, nblk, r, 128)
    blkspec = pl.BlockSpec(
        (1, 1, r, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    cap_rows = cap // 128

    kernel = partial(_compact_kernel, tuple(quarters), sout, secbits)
    out = pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[blkspec, blkspec] + [blkspec] * nplanes,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (b, nplanes, cap_rows, 128), jnp.uint32
        ),
        scratch_shapes=[
            pltpu.VMEM((sum(quarters), 128), jnp.float32),
            pltpu.VMEM((2, nplanes, sout, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((4,), jnp.int32),
        ],
        interpret=interpret,
    )(
        gidx.reshape(shape4),
        keep_i.reshape(shape4),
        *[p.reshape(shape4) for p in planes],
    )
    return (
        tuple(out[:, p].reshape(b, cap) for p in range(nplanes)),
        counts,
    )


def compact_rows_reference(planes, keep, cap: int):
    """Pure-XLA oracle for tests: gather-based compaction (slow on TPU)."""
    b, n = keep.shape
    gidx = jnp.cumsum(keep.astype(jnp.int32), axis=1) - keep.astype(jnp.int32)
    counts = gidx[:, -1] + keep[:, -1].astype(jnp.int32)
    idx = jnp.where(keep, gidx, cap)
    outs = []
    for pl_ in planes:
        out = jnp.zeros((b, cap + 1), jnp.uint32)
        out = jax.vmap(lambda o, i, v: o.at[i].set(v))(out, idx, pl_)
        outs.append(out[:, :cap])
    return tuple(outs), counts
