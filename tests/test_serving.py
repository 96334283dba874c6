"""Composite serving codec: one front-end over mixed corpora, routed to
the packed / bucketed engines, 100% parity with the native oracle."""

import numpy as np

from qoipp_tpu import Channels, Desc, oracle
from qoipp_tpu.models.serving import ServingCodec


def make_corpus(seed=0, n=26):
    """Tiny icons + mid tiles + streams big enough to out-size small pack
    lanes, mixed channels, boundary-crafted openers."""
    rng = np.random.default_rng(seed)
    out = []
    for k in range(n):
        if k % 4 == 0:  # tiny icons (packed path)
            d = Desc(8 + k % 5, 6, Channels.RGBA)
            raw = rng.integers(0, 256, d.width * d.height * 4, np.uint8)
        elif k % 4 == 1:  # flat mid (packed, run-heavy)
            d = Desc(64, 48, Channels.RGB)
            raw = np.full(64 * 48 * 3, k, np.uint8)
        elif k % 4 == 2:  # noisy mid/large (over-cap with small lanes)
            d = Desc(96, 64, Channels.RGB)
            raw = rng.integers(0, 256, 96 * 64 * 3, np.uint8)
        else:  # shared-geometry photos (bucketed path groups these)
            d = Desc(120, 80, Channels.RGBA)
            pal = rng.integers(0, 256, (17, 4), np.uint8)
            raw = pal[rng.integers(0, 17, 120 * 80)].reshape(-1)
        out.append((raw, d))
    return out


def test_decode_mixed_routes_and_parity():
    corpus = make_corpus()
    blobs = [oracle.encode(r, d)[0] for r, d in corpus]
    # small lanes force the noisy mid/large streams onto the SPLIT path
    codec = ServingCodec(pack_lane_bytes=8 << 10, min_len=1 << 12)
    n, packed_parts, split_parts = codec.decode_dispatch(blobs)
    assert split_parts, "over-cap streams must route to the split engine"
    got = codec.decode_finish((n, packed_parts, split_parts))
    assert len(got) == len(corpus)
    for (raw, d), g in zip(corpus, got):
        assert np.array_equal(g, raw), f"{d.width}x{d.height} decode mismatch"


def test_resident_corpus_decodes_many_times():
    # Stage once, decode repeatedly from HBM residency (the serving cache
    # mode): every request must return identical, oracle-exact results
    # with no re-staging (the handle reuses the same staged arrays).
    corpus = make_corpus(seed=3, n=14)
    blobs = [oracle.encode(r, d)[0] for r, d in corpus]
    codec = ServingCodec(pack_lane_bytes=8 << 10, min_len=1 << 12)
    resident = codec.make_resident(blobs)
    assert resident.n_streams == len(corpus)
    first = resident.decode()
    second = resident.decode()
    for (raw, d), a, b in zip(corpus, first, second):
        assert np.array_equal(a, raw), f"{d.width}x{d.height}"
        assert np.array_equal(b, raw)


def test_decode_split_min_routes_big_streams():
    # bodies above split_min_bytes go to the split engine even when the
    # pack lanes could hold them; parity must hold across both engines
    rng = np.random.default_rng(11)
    corpus = []
    for k in range(18):  # packable smalls
        d = Desc(20 + k, 16, Channels.RGB)
        corpus.append(
            (rng.integers(0, 256, d.width * d.height * 3, np.uint8), d)
        )
    for _ in range(2):  # big noisy streams (body >> split_min below)
        d = Desc(160, 160, Channels.RGBA)
        corpus.append(
            (rng.integers(0, 256, 160 * 160 * 4, np.uint8), d)
        )
    blobs = [oracle.encode(r, d)[0] for r, d in corpus]
    codec = ServingCodec(split_min_bytes=1 << 14, min_len=1 << 12)
    n, packed_parts, split_parts = codec.decode_dispatch(blobs)
    assert len(split_parts) == 1
    assert split_parts[0][0] == [18, 19]
    got = codec.decode_finish((n, packed_parts, split_parts))
    for (raw, d), g in zip(corpus, got):
        assert np.array_equal(g, raw)


def test_encode_mixed_routes_and_parity():
    corpus = make_corpus(seed=5)
    # small pixel lanes force the 96x64/120x80 images onto the batch path
    codec = ServingCodec(pack_lane_px=4096, min_len=1 << 12)
    got = codec.encode([r for r, _ in corpus], [d for _, d in corpus])
    for (raw, d), g in zip(corpus, got):
        ref, complete = oracle.encode(raw, d)
        assert complete
        assert np.array_equal(g, ref), f"{d.width}x{d.height} encode mismatch"


def test_roundtrip_one_frontend():
    corpus = make_corpus(seed=9, n=13)
    codec = ServingCodec(pack_lane_bytes=8 << 10, pack_lane_px=4096,
                         min_len=1 << 12)
    streams = codec.encode([r for r, _ in corpus], [d for _, d in corpus])
    back = codec.decode(streams)
    for (raw, d), g in zip(corpus, back):
        assert np.array_equal(g, raw)


def test_all_packed_when_lanes_fit():
    corpus = make_corpus(seed=3, n=8)
    codec = ServingCodec()  # default big lanes: everything packs
    blobs = [oracle.encode(r, d)[0] for r, d in corpus]
    got = codec.decode(blobs)
    for (raw, _), g in zip(corpus, got):
        assert np.array_equal(g, raw)
    streams = codec.encode([r for r, _ in corpus], [d for _, d in corpus])
    for (raw, d), s in zip(corpus, streams):
        assert np.array_equal(s, oracle.encode(raw, d)[0])


def test_decode_tiered_packing():
    # a corpus spanning >4x sizes with >= DEC_TIER_MIN members per class
    # must split into multiple packed tiers, each decoding bit-exactly
    rng = np.random.default_rng(7)
    corpus = []
    for k in range(20):  # small tier
        d = Desc(12 + k % 3, 10, Channels.RGB)
        corpus.append((rng.integers(0, 256, d.width * d.height * 3,
                                    np.uint8), d))
    for k in range(20):  # big tier (>4x the small sizes)
        d = Desc(160, 120, Channels.RGBA)
        pal = rng.integers(0, 256, (9, 4), np.uint8)
        corpus.append((pal[rng.integers(0, 9, 160 * 120)].reshape(-1), d))
    blobs = [oracle.encode(r, d)[0] for r, d in corpus]
    codec = ServingCodec(min_len=1 << 12)
    n, packed_parts, split_parts = codec.decode_dispatch(blobs)
    assert not split_parts, "everything fits the packed engine"
    assert len(packed_parts) >= 2, "size classes must tier"
    covered = sorted(i for idxs, _ in packed_parts for i in idxs)
    assert covered == list(range(len(blobs)))
    got = codec.decode_finish((n, packed_parts, split_parts))
    for (raw, d), g in zip(corpus, got):
        assert np.array_equal(g, raw)


def test_serving_edge_inputs():
    codec = ServingCodec()
    # empty submission
    assert codec.decode([]) == []
    assert codec.encode([], []) == []
    # single stream
    d = Desc(9, 7, Channels.RGB)
    raw = np.arange(9 * 7 * 3, dtype=np.uint8)
    blob = oracle.encode(raw, d)[0]
    got = codec.decode([blob])
    assert len(got) == 1 and np.array_equal(got[0], raw)
    # duplicates keep submission order
    got = codec.decode([blob, blob, blob])
    assert all(np.array_equal(g, raw) for g in got)
    enc = codec.encode([raw, raw], [d, d])
    assert all(np.array_equal(e, blob) for e in enc)
    # mismatched lengths raise
    import pytest as _pytest
    with _pytest.raises(ValueError):
        codec.encode([raw], [d, d])

def test_decode_dispatch_overlapped_parity():
    """The pipelined (worker-thread upload) dispatch returns the same
    decode_finish-ready plan as the plain dispatch."""
    corpus = make_corpus(seed=3)
    blobs = [oracle.encode(r, d)[0] for r, d in corpus]
    codec = ServingCodec(pack_lane_bytes=8 << 10, min_len=1 << 12)
    plan = codec.decode_dispatch_overlapped(blobs)
    assert plan[2], "over-cap streams must route to the split engine"
    got = codec.decode_finish(plan)
    assert len(got) == len(corpus)
    for (raw, d), g in zip(corpus, got):
        assert np.array_equal(g, raw), f"{d.width}x{d.height} overlap mismatch"


def test_decode_stage_then_dispatch_parity():
    """stage_to_device / dispatch_staged split equals the direct path."""
    corpus = make_corpus(seed=5, n=18)
    blobs = [oracle.encode(r, d)[0] for r, d in corpus]
    codec = ServingCodec(pack_lane_bytes=8 << 10, min_len=1 << 12)
    staged = codec.decode_stage(blobs)
    got = codec.decode_finish(codec.decode_dispatch_staged(staged))
    for (raw, d), g in zip(corpus, got):
        assert np.array_equal(g, raw), f"{d.width}x{d.height} staged mismatch"


def test_encode_stage_then_dispatch_parity():
    """encode_stage / encode_dispatch_staged / encode_finish equals the
    direct encode() and the oracle byte-for-byte, across packed tiers AND
    the bucketed over-cap geometry groups."""
    corpus = make_corpus(seed=7, n=14)
    # pack_lane_px small enough that the 96x64 and 120x80 images route to
    # the bucketed branch (the geometry groups), not just packed tiers
    codec = ServingCodec(pack_lane_bytes=8 << 10, min_len=1 << 12,
                         pack_lane_px=4096)
    raws = [r for r, _ in corpus]
    descs = [d for _, d in corpus]
    want = [oracle.encode(r, d)[0] for r, d in corpus]
    staged = codec.encode_stage(raws, descs)
    got = codec.encode_finish(codec.encode_dispatch_staged(staged))
    for w, g, d in zip(want, got, descs):
        assert np.array_equal(g, w), f"{d.width}x{d.height} staged encode"
    direct = codec.encode(raws, descs)
    for w, g in zip(want, direct):
        assert np.array_equal(g, w)
