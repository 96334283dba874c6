"""Composite serving codec: ONE front-end for arbitrary mixed corpora.

The reference's single front-end handles any directory of mixed images by
looping over files (reference: example/source/04_bench.cpp:849-876).  The
TPU-native equivalent must instead ROUTE each stream to the engine whose
execution shape fits it:

  * stream packing (models/packed.py) — small/mid streams concatenate
    into shared replay/compaction lanes; total device work tracks
    sum(sizes).  Replay depth = lane bytes, so lanes stay short: this is
    the tail engine.
  * length-bucketed batching (models/scheduler.py over models/pipeline.py)
    — streams above the lane cap group by geometry and run the batched
    pipeline at tight per-bucket caps; the scan/replay engines inside it
    handle single huge streams (the sp-sharded path extends this across
    chips, parallel/sharded.py).

Routing is by size against the pack-lane capacity — the measured
crossover (BASELINE.md: packing wins below the lane cap because replay
depth is shared; above it the per-image pipeline's window replay is
shorter than a stretched lane would be).

Everything stays 100% bit-exact with the reference codec; the router
only picks execution shapes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..common import Desc, read_header
from .packed import PackedDecoder, PackedEncoder
from .scheduler import BucketedCodec


def _size_tiers(idxs: Sequence[int], size: Dict[int, int], span: int,
                min_streams: int) -> List[List[int]]:
    """Greedy size tiers: descending by size, cut a new tier when the
    next member is > span smaller than the tier's largest AND the tier
    already has min_streams members (a dispatch costs ~45 ms); a tiny
    trailing tier merges into its predecessor."""
    order = sorted(idxs, key=lambda i: -size[i])
    tiers: List[List[int]] = []
    t0 = 0
    for i in order:
        if (tiers and size[i] * span >= t0) or (
            tiers and len(tiers[-1]) < min_streams
        ):
            tiers[-1].append(i)
        else:
            tiers.append([i])
            t0 = size[i]
    if len(tiers) >= 2 and len(tiers[-1]) < min_streams // 2:
        tiers[-2].extend(tiers.pop())
    return tiers


class ServingCodec:
    """Mixed-corpus QOI codec over the packed + bucketed engines.

    Decode routes through SIZE-TIERED packed plans (round-3 redesign):
    packable streams group into tiers of <= DEC_TIER_SPAN size spread
    (size = max(body bytes, pixels)), each tier decoding as one packed
    dispatch with its own balanced lane plan — a tier's lane depth
    (sequential replay) and pixel cap (place sweep) are set by its
    heaviest member, so homogeneous tiers keep both tight.  Only streams
    above pack_lane_bytes / DEC_PACK_PX_CAP fall through to the
    geometry-bucketed batch engine.

    Parameters
    ----------
    pack_lane_bytes: per-stream body-byte cap for decode packing; streams
        with larger bodies route to the bucketed batch engine.
    pack_lane_px: pixel-slot capacity of encode packing lanes; larger
        images route to the bucketed batch engine.
    growth / min_len: bucket geometry for the batch engine
        (models/scheduler.BucketedCodec).
    """

    DEC_TIER_SPAN = 4      # max size spread inside one packed tier
    DEC_TIER_MIN = 16      # min streams per tier (a dispatch costs ~45 ms)
    DEC_PACK_PX_CAP = 1 << 24  # streams above route to the batch engine

    def __init__(self, pack_lane_bytes: int = 8 << 20,
                 pack_lane_px: int = 1 << 20,
                 growth: float = 2.0, min_len: int = 1 << 14):
        self._dec_pack = PackedDecoder(lane_bytes=pack_lane_bytes)
        self._enc_pack = PackedEncoder(lane_px=pack_lane_px)
        self._growth = growth
        self._min_len = min_len
        self._buckets: Dict[Tuple[int, int, int], BucketedCodec] = {}

    def _bucket(self, desc: Desc) -> BucketedCodec:
        key = (desc.width, desc.height, int(desc.channels))
        codec = self._buckets.get(key)
        if codec is None:
            codec = BucketedCodec(desc, growth=self._growth,
                                  min_len=self._min_len)
            self._buckets[key] = codec
        return codec

    # -- decode -------------------------------------------------------------

    def decode(self, blobs: Sequence) -> List[np.ndarray]:
        """QOI byte streams (ANY geometries/channels/lengths) -> list of
        raw pixel buffers (each stream's native channels), submission
        order."""
        return self.decode_finish(self.decode_dispatch(blobs))

    def decode_dispatch(self, blobs: Sequence):
        """Stage + dispatch every engine; returns an opaque plan whose
        device arrays are HBM-resident (async dispatch — block on the
        arrays to measure device completion).  decode_finish() fetches
        and reassembles.  This split is the serving loop's overlap point:
        the next batch's staging and this batch's fetch both overlap the
        device work, and the north-star metric (decode into HBM-resident
        tensors, BASELINE.md) is the time to plan+dispatch+complete."""
        arrs = [
            np.frombuffer(bytes(x), np.uint8)
            if not isinstance(x, np.ndarray) else np.asarray(x, np.uint8)
            for x in blobs
        ]
        descs: List[Desc] = []
        for a in arrs:
            h = read_header(a)
            if not h:
                raise ValueError(f"bad stream: {h.error()}")
            descs.append(h.value())

        n = len(arrs)
        packable = [
            i for i in range(n)
            if arrs[i].size - 22 <= self._dec_pack.lane_bytes
            and descs[i].width * descs[i].height <= self.DEC_PACK_PX_CAP
        ]
        # Size-TIERED packed plans: lane depth (sequential replay) and the
        # pixel cap (place sweep) are both set by a tier's HEAVIEST
        # stream, so heterogeneous corpora pack into tiers of <= 4x size
        # spread — one multi-MB photo no longer stretches every icon's
        # lane.  Tier size metric = max(body bytes, pixels): bytes drive
        # replay depth, pixels drive the place/output footprint.
        t = {
            i: max(arrs[i].size - 22, descs[i].width * descs[i].height)
            for i in packable
        }
        tiers = _size_tiers(packable, t, self.DEC_TIER_SPAN,
                            self.DEC_TIER_MIN)
        # Per-tier pack -> upload -> dispatch: measured FASTER than
        # staging all uploads first (68 vs 53 MPix/s serve on the real
        # corpus — the tunnel serializes transfers either way, and the
        # per-tier order pipelines host packing against them).
        packed_parts = [
            (idxs, self._dec_pack.decode_to_device([arrs[i] for i in idxs]))
            for idxs in tiers
        ]

        taken = set(packable)
        by_geom: Dict[Tuple[int, int, int], List[int]] = {}
        for i in range(n):
            if i in taken:
                continue
            d = descs[i]
            by_geom.setdefault(
                (d.width, d.height, int(d.channels)), []
            ).append(i)
        bucket_parts = []
        for idxs in by_geom.values():
            codec = self._bucket(descs[idxs[0]])
            plan = codec.prepare([arrs[i] for i in idxs])
            bucket_parts.append(
                (idxs, descs[idxs[0]], codec.decode_prepared(plan))
            )
        return n, packed_parts, bucket_parts

    def decode_finish(self, dispatched) -> List[np.ndarray]:
        """Fetch a decode_dispatch plan's device results (one bulk fetch
        per engine output) and slice/unpack per stream on host."""
        from .packed import _unpack_pixels_np

        n, packed_parts, bucket_parts = dispatched
        results: List[Optional[np.ndarray]] = [None] * n
        for tier_idxs, (dev, where, pdescs) in packed_parts:
            host = np.asarray(dev)
            for i, (Li, poff), d in zip(tier_idxs, where, pdescs):
                npx = d.width * d.height
                results[i] = _unpack_pixels_np(
                    host[Li, poff : poff + npx], int(d.channels)
                )
        for idxs, d, sub in bucket_parts:
            ch = int(d.channels)
            npx = d.width * d.height
            for sub_idxs, dev in sub:
                # trim lane padding + pixel cap on device: one extra
                # dispatch (~50 ms tunnel) buys back far more at the
                # ~14 MB/s device->host fetch rate
                host = np.asarray(dev[: len(sub_idxs), :npx])
                for j, k in enumerate(sub_idxs):
                    results[idxs[k]] = _unpack_pixels_np(host[j], ch)
        return results  # type: ignore[return-value]

    # -- encode -------------------------------------------------------------

    def encode(self, raws: Sequence[np.ndarray],
               descs: Sequence[Desc]) -> List[np.ndarray]:
        """Raw pixel buffers + Descs (ANY geometries/channels) -> list of
        complete QOI streams, submission order."""
        if len(raws) != len(descs):
            raise ValueError("raws and descs length mismatch")
        raws = [np.asarray(r, np.uint8).reshape(-1) for r in raws]
        results: List[Optional[np.ndarray]] = [None] * len(raws)

        packable = [
            i for i, d in enumerate(descs)
            if d.width * d.height + 2 <= self._enc_pack.lane_px
        ]
        # same size-tiering as decode (pixels drive every encode-lane
        # cost: slots, chunk caps, byte caps)
        t = {i: descs[i].width * descs[i].height for i in packable}
        for tier in _size_tiers(packable, t, self.DEC_TIER_SPAN,
                                self.DEC_TIER_MIN):
            got = self._enc_pack.encode(
                [raws[i] for i in tier], [descs[i] for i in tier]
            )
            for i, stream in zip(tier, got):
                results[i] = stream

        rest = [i for i in range(len(raws)) if results[i] is None]
        by_geom: Dict[Tuple[int, int, int], List[int]] = {}
        for i in rest:
            d = descs[i]
            by_geom.setdefault(
                (d.width, d.height, int(d.channels)), []
            ).append(i)
        for key, idxs in by_geom.items():
            codec = self._bucket(descs[idxs[0]])
            streams = codec.encode(np.stack([raws[i] for i in idxs]))
            for j, i in enumerate(idxs):
                results[i] = streams[j]
        return results  # type: ignore[return-value]
