"""Composite serving codec: ONE front-end for arbitrary mixed corpora.

The reference's single front-end handles any directory of mixed images by
looping over files (reference: example/source/04_bench.cpp:849-876).  The
TPU-native equivalent must instead ROUTE each stream to the engine whose
execution shape fits it:

  * stream packing (models/packed.py) — small/mid streams concatenate
    into shared replay/compaction lanes; total device work tracks
    sum(sizes).  Replay depth = lane bytes, so lanes stay short: this is
    the tail engine.
  * split replay (models/split.py) — streams ABOVE the pack cap split
    into anchored segments spread across replay lanes with seam-fixpoint
    reconciliation, so a multi-MB photo pays ~rounds/K of its sequential
    replay depth instead of all of it (decode).  The sp-sharded path
    extends the same seam algebra across chips (parallel/sharded.py).
  * length-bucketed batching (models/scheduler.py over models/pipeline.py)
    — the geometry-grouped batch engine, used by the encode fallback.

Decode routing is by body size against min(pack lane capacity,
split_min_bytes): below it packing wins (shared lanes, NO fixpoint);
above it splitting wins (a big stream in packed lanes would set every
lane's sequential replay depth to its own full size).

Everything stays 100% bit-exact with the reference codec; the router
only picks execution shapes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..common import Desc, read_header
from .packed import PackedDecoder, PackedEncoder
from .scheduler import BucketedCodec
from .split import SplitDecoder


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


class ResidentCorpus:
    """HBM-resident staged decode corpus (ServingCodec.make_resident).

    Holds every engine's uploaded inputs; decode_device() re-dispatches
    the device work from them (results HBM-resident — the north-star
    measurement form), decode() additionally fetches and reassembles.
    Steady-state serving cost is decode_device() alone: the one-time
    staging upload amortizes across requests."""

    def __init__(self, codec: "ServingCodec", staged):
        self._codec = codec
        self._staged = staged
        self.n_streams = staged[0]

    def decode_device(self):
        """Dispatch decode from the resident staging; returns the
        decode_finish-ready plan with HBM-resident results."""
        return self._codec.decode_dispatch_staged(self._staged)

    def decode(self) -> List[np.ndarray]:
        """Full fetch form: decode from residency and reassemble raw
        pixel buffers in submission order."""
        return self._codec.decode_finish(self.decode_device())


class ServingCodec:
    """Mixed-corpus QOI codec over the packed + bucketed engines.

    Decode routes through SIZE-TIERED packed plans (round-3 redesign):
    packable streams group into tiers of <= DEC_TIER_SPAN size spread
    (size = max(body bytes, pixels)), each tier decoding as one packed
    dispatch with its own balanced lane plan — a tier's lane depth
    (sequential replay) and pixel cap (place sweep) are set by its
    heaviest member, so homogeneous tiers keep both tight.  Streams above
    min(pack_lane_bytes, split_min_bytes) or DEC_PACK_PX_CAP route to the
    split-replay engine (one dispatch for ALL of them — each stream's
    chunk field spreads across lanes, models/split.py).

    Parameters
    ----------
    pack_lane_bytes: per-stream body-byte cap for decode packing.
    split_min_bytes: bodies above this split across lanes instead of
        packing (a big stream in a packed tier sets every lane's
        sequential replay depth to its own full size).
    pack_lane_px: pixel-slot capacity of encode packing lanes; larger
        images route to the bucketed batch engine.
    growth / min_len: bucket geometry for the batch engine
        (models/scheduler.BucketedCodec, the encode fallback).
    split_lanes: replay lanes per split dispatch; over-cap streams
        dispatch in groups of <= split_lanes (each needs >= 1 lane).
    """

    DEC_TIER_SPAN = 4      # max size spread inside one packed tier
    DEC_TIER_MIN = 16      # min streams per tier (a dispatch costs ~45 ms)
    DEC_PACK_PX_CAP = 1 << 24  # streams above route to the split engine

    def __init__(self, pack_lane_bytes: int = 8 << 20,
                 pack_lane_px: int = 1 << 20,
                 growth: float = 2.0, min_len: int = 1 << 14,
                 split_min_bytes: int = 1 << 20,
                 split_lanes: int = 128):
        self._dec_pack = PackedDecoder(lane_bytes=pack_lane_bytes)
        self._enc_pack = PackedEncoder(lane_px=pack_lane_px)
        self._dec_split = SplitDecoder(lanes=split_lanes)
        self._split_min = split_min_bytes
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
        arrs, descs = self._parse(blobs)
        n = len(arrs)
        packable = self._packable(arrs, descs)
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

        # Over-cap streams: ONE split-replay dispatch — every big stream's
        # chunk field spreads across up to 128 lanes with seam-fixpoint
        # reconciliation (models/split.py), so the over-cap tier stops
        # paying full-stream sequential replay depth (round-3's weakest
        # serving headline: the multi-MB photos).
        taken = set(packable)
        rest = [i for i in range(n) if i not in taken]
        split_parts = [
            (grp, self._dec_split.decode_to_device([arrs[i] for i in grp]))
            for grp in self._split_groups(rest)
        ]
        return n, packed_parts, split_parts

    @staticmethod
    def _parse(blobs: Sequence):
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
        return arrs, descs

    def _packable(self, arrs, descs) -> List[int]:
        return [
            i for i in range(len(arrs))
            if arrs[i].size - 22
            <= min(self._dec_pack.lane_bytes, self._split_min)
            and descs[i].width * descs[i].height <= self.DEC_PACK_PX_CAP
        ]

    def _split_groups(self, rest: List[int]) -> List[List[int]]:
        """Over-cap streams dispatch in groups of <= lanes (every stream
        needs >= 1 lane; SplitDecoder rejects larger sets rather than
        silently dropping streams)."""
        cap = self._dec_split.lanes
        return [rest[i : i + cap] for i in range(0, len(rest), cap)]

    def decode_dispatch_overlapped(self, blobs: Sequence):
        """decode_dispatch with host planning pipelined against transport
        uploads: tiers are planned on the calling thread while ONE worker
        thread uploads + dispatches each planned tier (the transport copy
        releases the GIL, so the single host core keeps packing the next
        tier during it; device compute already overlaps both since
        dispatches are async).  Returns the same decode_finish-ready plan
        as decode_dispatch."""
        from concurrent.futures import ThreadPoolExecutor

        arrs, descs = self._parse(blobs)
        n = len(arrs)
        packable = self._packable(arrs, descs)
        t = {
            i: max(arrs[i].size - 22, descs[i].width * descs[i].height)
            for i in packable
        }
        tiers = _size_tiers(packable, t, self.DEC_TIER_SPAN,
                            self.DEC_TIER_MIN)
        rest = [i for i in range(n) if i not in set(packable)]
        with ThreadPoolExecutor(1) as ex:
            packed_futs = []
            for idxs in tiers:
                plan = self._dec_pack.plan_and_pack(
                    [arrs[i] for i in idxs])
                packed_futs.append((idxs, ex.submit(
                    lambda p: self._dec_pack.dispatch_staged(
                        self._dec_pack.stage_plan(p)), plan)))
            split_futs = []
            for grp in self._split_groups(rest):
                plan = self._dec_split.plan_and_pack(
                    [arrs[i] for i in grp])
                split_futs.append((grp, ex.submit(
                    lambda p: self._dec_split.dispatch_staged(
                        self._dec_split.stage_plan(p)), plan)))
            packed_parts = [(idxs, f.result()) for idxs, f in packed_futs]
            split_parts = [(idxs, f.result()) for idxs, f in split_futs]
        return n, packed_parts, split_parts

    def decode_stage(self, blobs: Sequence):
        """Plan + upload every engine's inputs WITHOUT dispatching compute.
        Pair with decode_dispatch_staged() to run the device work — the
        serving overlap point for co-located deployments, and the honest
        way to measure device execution alone (the upload rides the
        transport at its own rate; see BASELINE.md)."""
        arrs, descs = self._parse(blobs)
        n = len(arrs)
        packable = self._packable(arrs, descs)
        t = {
            i: max(arrs[i].size - 22, descs[i].width * descs[i].height)
            for i in packable
        }
        tiers = _size_tiers(packable, t, self.DEC_TIER_SPAN,
                            self.DEC_TIER_MIN)
        packed_staged = [
            (idxs, self._dec_pack.stage_to_device([arrs[i] for i in idxs]))
            for idxs in tiers
        ]
        rest = [i for i in range(n) if i not in set(packable)]
        split_staged = [
            (grp, self._dec_split.stage_to_device([arrs[i] for i in grp]))
            for grp in self._split_groups(rest)
        ]
        return n, packed_staged, split_staged

    def make_resident(self, blobs: Sequence) -> "ResidentCorpus":
        """Stage a corpus's decode inputs into HBM ONCE and return a
        handle that decodes from the resident staging arbitrarily many
        times with NO re-upload — the deployment form the HBM-resident
        north star describes (a serving fleet keeps its hot corpus staged
        and answers decode requests from device memory; the transport
        pays the corpus upload once, not per request).  Reference analog:
        one front-end for any directory (example/source/04_bench.cpp:
        849-876), which re-reads from host RAM instead."""
        return ResidentCorpus(self, self.decode_stage(blobs))

    def decode_dispatch_staged(self, staged):
        """Dispatch a decode_stage plan; returns the decode_finish-ready
        plan with HBM-resident results."""
        n, packed_staged, split_staged = staged
        packed_parts = [
            (idxs, self._dec_pack.dispatch_staged(s))
            for idxs, s in packed_staged
        ]
        split_parts = [
            (idxs, self._dec_split.dispatch_staged(s))
            for idxs, s in split_staged
        ]
        return n, packed_parts, split_parts

    def decode_finish(self, dispatched) -> List[np.ndarray]:
        """Fetch a decode_dispatch plan's device results (one bulk fetch
        per engine output) and slice/unpack per stream on host."""
        from .packed import _unpack_pixels_np

        n, packed_parts, split_parts = dispatched
        results: List[Optional[np.ndarray]] = [None] * n
        for tier_idxs, (dev, where, pdescs) in packed_parts:
            host = np.asarray(dev)
            for i, (Li, poff), d in zip(tier_idxs, where, pdescs):
                npx = d.width * d.height
                results[i] = _unpack_pixels_np(
                    host[Li, poff : poff + npx], int(d.channels)
                )
        for idxs, (dev, where, sdescs, _rounds) in split_parts:
            host = np.asarray(dev)
            for i, segs, d in zip(idxs, where, sdescs):
                npx = d.width * d.height
                px = np.empty(npx, np.uint32)
                for lane, p0, p1 in segs:
                    px[p0:p1] = host[lane, : p1 - p0]
                results[i] = _unpack_pixels_np(px, int(d.channels))
        return results  # type: ignore[return-value]

    # -- encode -------------------------------------------------------------



    def encode(self, raws: Sequence[np.ndarray],
               descs: Sequence[Desc]) -> List[np.ndarray]:
        """Raw pixel buffers + Descs (ANY geometries/channels) -> list of
        complete QOI streams, submission order."""
        return self.encode_finish(self.encode_dispatch(raws, descs))

    def _encode_plan(self, raws: Sequence[np.ndarray],
                     descs: Sequence[Desc]):
        """Shared host planning for the encode paths: tier the packable
        images (pixels drive every encode-lane cost), group the rest by
        geometry for the bucketed batch engine."""
        if len(raws) != len(descs):
            raise ValueError("raws and descs length mismatch")
        raws = [np.asarray(r, np.uint8).reshape(-1) for r in raws]
        packable = [
            i for i, d in enumerate(descs)
            if d.width * d.height + 2 <= self._enc_pack.lane_px
        ]
        t = {i: descs[i].width * descs[i].height for i in packable}
        tiers = _size_tiers(packable, t, self.DEC_TIER_SPAN,
                            self.DEC_TIER_MIN)
        rest = [i for i in range(len(raws)) if i not in set(packable)]
        by_geom: Dict[Tuple[int, int, int], List[int]] = {}
        for i in rest:
            d = descs[i]
            by_geom.setdefault(
                (d.width, d.height, int(d.channels)), []
            ).append(i)
        return raws, tiers, by_geom

    def encode_dispatch(self, raws: Sequence[np.ndarray],
                        descs: Sequence[Desc]):
        """Stage + dispatch every encode engine; the emitted byte lanes
        stay HBM-resident (the encode analog of decode_dispatch).
        encode_finish() fetches and reassembles complete streams."""
        return self.encode_dispatch_staged(self.encode_stage(raws, descs))

    def encode_stage(self, raws: Sequence[np.ndarray],
                     descs: Sequence[Desc]):
        """Plan + upload every encode engine's inputs WITHOUT dispatching
        compute — pair with encode_dispatch_staged (the overlap point and
        the device-exec measurement form, as decode_stage)."""
        from ..utils.transport import stage_h2d
        from .scheduler import _pad_b

        raws, tiers, by_geom = self._encode_plan(raws, descs)
        packed_staged = [
            (tier, self._enc_pack.stage_to_device(
                [raws[i] for i in tier], [descs[i] for i in tier]))
            for tier in tiers
        ]
        bucket_staged = []
        for key, idxs in by_geom.items():
            codec = self._bucket(descs[idxs[0]])
            d = descs[idxs[0]]
            worst = (int(d.channels) + 1) * d.width * d.height + 22
            pipe = codec._pipe(codec._bucket_len(worst))
            bp = _pad_b(len(idxs))
            batch = np.zeros((bp, raws[idxs[0]].size), np.uint8)
            for j, i in enumerate(idxs):
                batch[j] = raws[i]
            bucket_staged.append(
                (idxs, pipe, stage_h2d(batch), descs[idxs[0]])
            )
        return len(raws), packed_staged, bucket_staged

    def encode_dispatch_staged(self, staged):
        """Dispatch an encode_stage plan; returns the encode_finish-ready
        plan with HBM-resident byte lanes."""
        n, packed_staged, bucket_staged = staged
        packed_parts = [
            (idxs, self._enc_pack.dispatch_staged(s))
            for idxs, s in packed_staged
        ]
        bucket_parts = []
        for idxs, pipe, batch_d, d in bucket_staged:
            # ONE dispatch per bucket: pixel packing + padding + encode
            # fused (eager packing paid 2 extra ~48 ms tunnel round trips
            # per bucket)
            streams, lengths, ok = pipe.encode_raw_checked(batch_d)
            bucket_parts.append((idxs, streams, lengths, ok, d))
        return n, packed_parts, bucket_parts

    def encode_finish(self, dispatched) -> List[np.ndarray]:
        """Fetch an encode_dispatch plan's device results and reassemble
        complete QOI streams in submission order."""
        n, packed_parts, bucket_parts = dispatched
        results: List[Optional[np.ndarray]] = [None] * n
        for tier, disp in packed_parts:
            for i, stream in zip(tier, self._enc_pack.finish(disp)):
                results[i] = stream
        for idxs, streams, lengths, ok, d in bucket_parts:
            lengths = np.asarray(lengths)
            okh = np.asarray(ok)
            # the bucket is sized from worst_size, so a checked-flag trip
            # is a bug, not an overflowable configuration (raise
            # unconditionally: `assert` vanishes under python -O and would
            # silently return truncated streams)
            if not bool(okh[: len(idxs)].all()):
                raise AssertionError(
                    "bucketed encode overflowed its worst-size bucket")
            used = int(lengths[: len(idxs)].max(initial=1))
            # fetch slice rounded to a COARSE 8 KB bucket (as
            # ops/device_stream does): each distinct eager slice length
            # compiles a fresh program (~30 s via the tunnel), so a
            # 128-byte granularity recompiled on nearly every corpus
            fetch = min(streams.shape[1], -(-used // 8192) * 8192)
            host = np.asarray(streams[:, :fetch])
            for j, i in enumerate(idxs):
                results[i] = host[j, : lengths[j]].copy()
        return results  # type: ignore[return-value]
