"""Sharded codec pipelines: data-parallel batches and sequence-parallel
single-image decode over a jax.sharding.Mesh.

DP: images shard over the `data` axis; each device runs the batched codec
on its shard — embarrassingly parallel, collectives only for summary stats.

SP (the codec's ring-attention-shaped problem, SURVEY.md §5 "long
context"): one image's chunk tiles shard over the `seq` axis.  Each device
replays its local tiles speculatively (ops/decode replay scan); the device-
boundary carry (prev pixel + 64-entry table — the ~260-byte state vector of
SURVEY.md §5) travels to the right neighbor via lax.ppermute over ICI, and
a device-count-bounded fixpoint loop (the multi-chip extension of the
single-chip reconciliation) converges to the exact sequential semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import decode as dec_ops
from ..ops.bitops import START_PIXEL_PACKED


# --------------------------------------------------------------------------
# Data-parallel batch codec
# --------------------------------------------------------------------------


def make_dp_decode(pipeline, mesh: Mesh, axis: str = "data"):
    """jit the pipeline's batched decode with the batch sharded over `axis`.
    XLA partitions the vmapped codec across devices with no communication;
    a psum'd checksum exercises the ICI reduction path for observability."""
    batch_sharding = NamedSharding(mesh, P(axis, None))

    @partial(
        jax.jit,
        in_shardings=(batch_sharding, NamedSharding(mesh, P(axis))),
        out_shardings=(batch_sharding, NamedSharding(mesh, P())),
    )
    def dp_decode(streams, sizes):
        packed = pipeline._decode_impl(streams, sizes)
        checksum = jnp.sum(packed.astype(jnp.uint32))
        return packed, checksum

    return dp_decode


def make_dp_encode(pipeline, mesh: Mesh, axis: str = "data"):
    batch_sharding = NamedSharding(mesh, P(axis, None))

    @partial(
        jax.jit,
        in_shardings=(batch_sharding,),
        out_shardings=(
            batch_sharding,
            NamedSharding(mesh, P(axis)),
            NamedSharding(mesh, P(axis)),
        ),
    )
    def dp_encode_checked(packed):
        return pipeline._encode_impl(packed)

    def dp_encode(packed):
        streams, lengths, _ = dp_encode_checked(packed)
        return streams, lengths

    return dp_encode


# --------------------------------------------------------------------------
# Sequence-parallel single-image decode
# --------------------------------------------------------------------------


def make_sp_decode(mesh: Mesh, qb: int, tiles_per_device: int,
                   axis: str = "seq"):
    """Build a sequence-parallel byte-domain chunk replay: the dense chunk
    field arrays of length qb (from ops.decode.classify_dense) are sharded
    over `axis`; returns per-byte-position emitted pixel values (sharded the
    same way), bit-exact with the sequential decode.

    Each fixpoint round: local tile replay, then within-device transfer-
    summary propagation seeded by the left neighbor's last-tile out-state
    (exchanged via lax.ppermute over ICI).  Convergence crosses one device
    per round worst-case, all tiles per round within a device.

    qb must divide evenly: qb = n_devices * tiles_per_device * t_len.
    """
    n_dev = mesh.shape[axis]
    assert qb % (n_dev * tiles_per_device) == 0
    t_len = qb // (n_dev * tiles_per_device)
    s_local = tiles_per_device

    spec = P(axis)
    _step = dec_ops._replay_step

    def local_replay(in_p, in_s, xs):
        zero_pu = jnp.zeros((s_local,), bool)
        zero_sw = jnp.zeros((s_local, 64), bool)
        (p, s, pu, sw), ys = jax.lax.scan(
            _step, (in_p, in_s, zero_pu, zero_sw), xs
        )
        return p, s, pu, sw, ys

    def sp_body(cls, val, nmask, arg):
        # local shapes: (q_local,) with q_local = s_local * t_len
        my = jax.lax.axis_index(axis)
        to_tiles = lambda x: x.reshape(s_local, t_len).T
        xs = (to_tiles(cls), to_tiles(val), to_tiles(nmask), to_tiles(arg))

        prev0, seen0 = dec_ops._true_init_row()

        def round_fn(state):
            in_p, in_s, _, it = state
            out_p, out_s, out_pu, out_sw, _ = local_replay(in_p, in_s, xs)
            # my last tile's out-state -> right neighbor's base state
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            nbr_p = jax.lax.ppermute(out_p[-1:], axis, perm)
            nbr_s = jax.lax.ppermute(out_s[-1:], axis, perm)
            base_p = jnp.where(my == 0, prev0, nbr_p[0])
            base_s = jnp.where(my == 0, seen0[None, :], nbr_s)
            want_p, want_s = dec_ops._propagate(
                out_p, out_s, out_pu, out_sw, base_p, base_s
            )
            local_match = jnp.all(want_p == in_p) & jnp.all(want_s == in_s)
            all_match = jax.lax.pmin(local_match.astype(jnp.int32), axis)
            return want_p, want_s, all_match > 0, it + 1

        def cond(state):
            _, _, done, it = state
            return (~done) & (it < n_dev * s_local + 2)

        # Speculative init: START everywhere (== the true prev for tile 0);
        # only the globally-first tile gets the seeded table.
        is_first = (jnp.arange(s_local) + my * s_local) == 0
        init_p = jnp.full((s_local,), START_PIXEL_PACKED, jnp.uint32)
        init_s = jnp.where(
            is_first[:, None], seen0[None, :], jnp.zeros((s_local, 64), jnp.uint32)
        )

        fin_p, fin_s, _, _ = jax.lax.while_loop(
            cond, round_fn, (init_p, init_s, jnp.array(False), jnp.int32(0))
        )
        _, _, _, _, (emits, prevs) = local_replay(fin_p, fin_s, xs)
        return emits.T.reshape(-1), prevs.T.reshape(-1)

    sharded = shard_map(
        sp_body,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return jax.jit(sharded)
