"""Batched pipeline + mesh-sharded codec tests on the virtual 8-device CPU
mesh (SURVEY.md §4: fake-mesh testing in lieu of real multi-chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qoipp_tpu import Channels, Desc
from qoipp_tpu import oracle
from qoipp_tpu.models.pipeline import BatchPipeline
from qoipp_tpu.ops import boundary, decode as dec_ops
from qoipp_tpu.parallel import mesh as mesh_mod
from qoipp_tpu.parallel import sharded

DESC = Desc(48, 32, Channels.RGB)


def make_batch(b, desc, seed=0):
    rng = np.random.default_rng(seed)
    n = desc.width * desc.height
    ch = int(desc.channels)
    raws, blobs = [], []
    for i in range(b):
        palette = rng.integers(0, 256, (8, ch)).astype(np.uint8)
        raw = palette[rng.integers(0, 8, n)].reshape(-1)
        enc, _ = oracle.encode(raw, desc)
        raws.append(raw)
        blobs.append(enc)
    return raws, blobs


def test_batch_pipeline_decode():
    pipe = BatchPipeline(DESC)
    raws, blobs = make_batch(8, DESC)
    streams, sizes = pipe.pack_streams(blobs)
    imgs = np.asarray(pipe.decode(jnp.asarray(streams), jnp.asarray(sizes)))
    for i in range(8):
        assert np.array_equal(imgs[i].reshape(-1), raws[i]), f"image {i}"


def test_batch_pipeline_encode():
    pipe = BatchPipeline(DESC)
    raws, blobs = make_batch(4, DESC, seed=1)
    arr = jnp.asarray(np.stack([r for r in raws]))
    streams, lengths = pipe.encode(arr)
    streams, lengths = np.asarray(streams), np.asarray(lengths)
    for i in range(4):
        assert lengths[i] == blobs[i].size
        assert np.array_equal(streams[i, : lengths[i]], blobs[i]), f"image {i}"


def test_batch_roundtrip_device_resident():
    pipe = BatchPipeline(DESC)
    raws, blobs = make_batch(8, DESC, seed=2)
    streams, sizes = pipe.pack_streams(blobs)
    packed = pipe.decode_packed(jnp.asarray(streams), jnp.asarray(sizes))
    enc_streams, lengths = pipe.encode_packed(
        jnp.pad(packed[:, : pipe.n_px], ((0, 0), (0, pipe.nb - pipe.n_px)))
    )
    enc_streams, lengths = np.asarray(enc_streams), np.asarray(lengths)
    for i in range(8):
        assert np.array_equal(enc_streams[i, : lengths[i]], blobs[i])


def test_dp_sharded_decode():
    m = mesh_mod.make_mesh((8, 1))
    pipe = BatchPipeline(DESC)
    raws, blobs = make_batch(16, DESC, seed=3)
    streams, sizes = pipe.pack_streams(blobs)
    dp_decode = sharded.make_dp_decode(pipe, m)
    packed, checksum = dp_decode(jnp.asarray(streams), jnp.asarray(sizes))
    packed = np.asarray(packed)
    from qoipp_tpu.ops.bitops import packed_to_pixels

    for i in range(16):
        raw = np.asarray(packed_to_pixels(jnp.asarray(packed[i, : pipe.n_px]), 3))
        assert np.array_equal(raw, raws[i]), f"image {i}"
    assert int(checksum) == int(np.sum(packed.astype(np.uint64)) % (2**32))


def test_dp_sharded_encode():
    m = mesh_mod.make_mesh((8, 1))
    pipe = BatchPipeline(DESC)
    raws, blobs = make_batch(8, DESC, seed=4)
    from qoipp_tpu.ops.bitops import pixels_to_packed

    packed = jnp.stack(
        [
            jnp.pad(pixels_to_packed(jnp.asarray(r), 3), (0, pipe.nb - pipe.n_px))
            for r in raws
        ]
    )
    dp_encode = sharded.make_dp_encode(pipe, m)
    streams, lengths = dp_encode(packed)
    streams, lengths = np.asarray(streams), np.asarray(lengths)
    for i in range(8):
        assert np.array_equal(streams[i, : lengths[i]], blobs[i])


def test_sp_sharded_decode():
    # One image's chunk stream sharded over the seq axis; ppermute carries
    # the seam state; result must be bit-exact.
    m = mesh_mod.make_mesh((1, 8))
    desc = Desc(256, 16, Channels.RGB)
    rng = np.random.default_rng(5)
    palette = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    raw = palette[rng.integers(0, 16, 256 * 16)].reshape(-1)
    enc, _ = oracle.encode(raw, desc)

    n_px = desc.width * desc.height
    qb = dec_ops._bucket(enc.size - 14, boundary.BLOCK)
    while qb % (8 * 4) != 0:
        qb += boundary.BLOCK
    region = np.zeros(qb + 8, np.uint8)
    region[: enc.size - 14] = enc[14:]
    region_j = jnp.asarray(region)
    info = boundary.analyze_region(
        region_j[:qb], jnp.int32(enc.size - 22), jnp.int32(n_px)
    )

    cls, val, nmask, arg = jax.jit(
        dec_ops.classify_dense, static_argnames=("qb",)
    )(region_j, qb, info["real"])
    sp = sharded.make_sp_decode(m, qb, tiles_per_device=4)
    emits, prevs = sp(cls, val, nmask, arg)

    n_cap = dec_ops._bucket(n_px, 128)
    packed = dec_ops.expand_pixels(
        emits, prevs, info["real"], info["produced"], info["pix_before"], n_cap
    )
    from qoipp_tpu.ops.bitops import packed_to_pixels

    got = np.asarray(packed_to_pixels(packed[:n_px], 3))
    assert np.array_equal(got, raw)


def test_sp_decode_adversarial_rounds():
    # INDEX-heavy adversarial stream: after a 64-color prologue, EVERY
    # chunk is an OP_INDEX whose slot a speculative (zero-table) tile
    # cannot resolve, so the fixpoint degenerates to carry-at-a-time —
    # the documented O(n_tiles) worst case (make_sp_decode docstring).
    # Pins: (a) output stays bit-exact, (b) the round count respects the
    # n_tiles + 2 loop cap (the bound that guarantees exactness).
    m = mesh_mod.make_mesh((1, 8))
    tiles_per_device = 4
    n_tiles = 8 * tiles_per_device

    rng = np.random.default_rng(11)
    # 64 colors with distinct hash slots -> one palette entry per slot
    colors, seen_slots = [], set()
    while len(colors) < 64:
        c = rng.integers(0, 256, 3)
        h = (3 * c[0] + 5 * c[1] + 7 * c[2] + 11 * 255) % 64
        if h not in seen_slots:
            seen_slots.add(h)
            colors.append(c)
    palette = np.array(colors, np.uint8)
    # avoid runs: consecutive pixels always differ
    idx = np.empty(4096, np.int64)
    idx[0] = 0
    step = rng.integers(1, 64, idx.size - 1)
    idx[1:] = np.cumsum(step) % 64
    dup = idx[1:] == idx[:-1]
    idx[1:][dup] = (idx[1:][dup] + 1) % 64
    raw = palette[idx].reshape(-1)
    desc = Desc(idx.size, 1, Channels.RGB)
    enc, _ = oracle.encode(raw, desc)
    # adversarialness: the body after the prologue is essentially all
    # 1-byte INDEX chunks
    body = enc[14:-8]
    assert (body < 0x40).mean() > 0.9

    n_px = desc.width * desc.height
    qb = dec_ops._bucket(enc.size - 14, boundary.BLOCK)
    while qb % n_tiles != 0:
        qb += boundary.BLOCK
    region = np.zeros(qb + 8, np.uint8)
    region[: enc.size - 14] = enc[14:]
    region_j = jnp.asarray(region)
    info = boundary.analyze_region(
        region_j[:qb], jnp.int32(enc.size - 22), jnp.int32(n_px)
    )
    cls, val, nmask, arg = jax.jit(
        dec_ops.classify_dense, static_argnames=("qb",)
    )(region_j, qb, info["real"])
    sp = sharded.make_sp_decode(m, qb, tiles_per_device, with_rounds=True)
    emits, prevs, rounds = sp(cls, val, nmask, arg)

    n_cap = dec_ops._bucket(n_px, 128)
    packed = dec_ops.expand_pixels(
        emits, prevs, info["real"], info["produced"], info["pix_before"],
        n_cap,
    )
    from qoipp_tpu.ops.bitops import packed_to_pixels

    got = np.asarray(packed_to_pixels(packed[:n_px], 3))
    assert np.array_equal(got, raw)  # exact even at worst-case rounds
    r = int(np.asarray(rounds).max())
    assert r <= n_tiles + 2  # the cap that guarantees exactness
    assert r >= 4  # genuinely adversarial: far from the typical O(1)


def test_sp_sharded_encode():
    # One image's pixels sharded over the seq axis; closed-form carry
    # exchange (prev via ppermute, run/table via all_gathered summaries);
    # assembled stream must be bit-exact with the oracle.  Content is
    # crafted so runs (incl. >62 and whole-shard spans), INDEX hits, and
    # LUMA/DIFF deltas all cross shard boundaries.
    m = mesh_mod.make_mesh((1, 8))
    n_dev, n_local = 8, 256
    n_px = n_dev * n_local - 37  # last shard partially filled
    desc = Desc(n_px, 1, Channels.RGBA)

    rng = np.random.default_rng(6)
    px = np.zeros((n_dev * n_local, 4), np.int64)
    px[:, 3] = 255
    cur = np.array([10, 20, 30, 255], np.int64)
    i = 0
    while i < n_px:
        mode = rng.integers(0, 5)
        if mode == 0:  # long run (often crossing boundaries / the 62 flush)
            ln = int(rng.integers(1, 300))
        elif mode == 1:  # small delta step
            cur[:3] = (cur[:3] + rng.integers(-2, 2, 3)) % 256
            ln = 1
        elif mode == 2:  # luma-range step
            cur[:3] = (cur[:3] + rng.integers(-30, 30, 3)) % 256
            ln = 1
        elif mode == 3:  # revisit an old pixel (INDEX candidates)
            j = int(rng.integers(0, i)) if i else 0
            cur = px[j].copy()
            ln = 1
        else:  # fresh pixel, sometimes alpha change
            cur = rng.integers(0, 256, 4)
            if rng.random() < 0.5:
                cur[3] = 255
        ln = min(ln if mode == 0 else 1, n_px - i)
        px[i : i + ln] = cur
        i += ln
    raw = px[:n_px, :4].astype(np.uint8).reshape(-1)
    enc, _ = oracle.encode(raw, desc)

    from qoipp_tpu.ops.bitops import pixels_to_packed

    packed = pixels_to_packed(jnp.asarray(raw), 4)
    packed = jnp.pad(packed, (0, n_dev * n_local - n_px))
    # padding after n_px must not disturb shard summaries of the last shard
    sp_enc = sharded.make_sp_encode(m, n_local, channels=4)
    bodies, lengths = sp_enc(packed, jnp.int32(n_px - (n_dev - 1) * n_local))
    bodies, lengths = np.asarray(bodies), np.asarray(lengths)
    got = b"".join(
        bodies[s, : lengths[s]].tobytes() for s in range(n_dev)
    )
    from qoipp_tpu.common import write_header

    assert write_header(desc) + got == enc.tobytes()


def test_hybrid_mesh_dcn_layout():
    # Multi-host layout simulated on the 8-device CPU mesh: host axis
    # (DCN) is outermost and carries only embarrassingly-parallel batch
    # work (merged with data in the dp specs); seq (ICI) is innermost and
    # carries the sp seam exchange.
    m = mesh_mod.make_hybrid_mesh(hosts=2)  # (2, 2, 2) host x data x seq
    assert m.shape["host"] == 2 and m.shape["seq"] >= 2

    pipe = BatchPipeline(DESC)
    raws, blobs = make_batch(8, DESC, seed=7)
    streams, sizes = pipe.pack_streams(blobs)
    dp_decode = sharded.make_dp_decode(pipe, m, axis=("host", "data"))
    packed, _ = dp_decode(jnp.asarray(streams), jnp.asarray(sizes))
    from qoipp_tpu.ops.bitops import packed_to_pixels

    for i in range(8):
        raw = np.asarray(packed_to_pixels(jnp.asarray(packed[i, : pipe.n_px]), 3))
        assert np.array_equal(raw, raws[i]), f"image {i}"

    # sp encode rides the innermost (ICI) axis of the same mesh
    n_dev, n_local = m.shape["seq"], 256
    n_px = n_dev * n_local
    desc = Desc(n_px, 1, Channels.RGB)
    rng = np.random.default_rng(8)
    palette = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    raw = palette[rng.integers(0, 4, n_px)].reshape(-1)
    enc, _ = oracle.encode(raw, desc)
    from qoipp_tpu.ops.bitops import pixels_to_packed

    packed_px = pixels_to_packed(jnp.asarray(raw), 3)
    sp_enc = sharded.make_sp_encode(m, n_local, channels=3)
    bodies, lengths = sp_enc(packed_px, jnp.int32(n_local))
    bodies, lengths = np.asarray(bodies), np.asarray(lengths)
    got = b"".join(bodies[s, : lengths[s]].tobytes() for s in range(n_dev))
    from qoipp_tpu.common import write_header

    assert write_header(desc) + got == enc.tobytes()
