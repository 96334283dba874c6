"""Stream-packed batched decode: total work tracks sum(sizes), not
B * max(size).

The shape-static batched pipeline taxes every lane with the batch's
worst stream (models/scheduler.py bucketing only soften this).  Packing
is the sequence-packing analog for codec lanes: many whole streams are
concatenated into each replay lane, back to back.  Three format facts
make this exact with almost no new machinery:

  * complete QOI streams end on a chunk boundary, so concatenated chunk
    bytes keep the boundary pass's phase algebra intact — chunk-start
    detection needs NO changes;
  * decoder state resets between streams ride IN-BAND: bit 9 of the
    dense meta word marks a chunk that begins a new stream, and the
    replay kernel re-enters the initial (prev, table) carry before
    applying that chunk (ops/replay_kernel.py);
  * output offsets assigned contiguously per lane make the placement
    offsets equal the boundary pass's plain pixel prefix sum, so the
    place+fill kernel runs UNCHANGED (runs never leak across streams:
    every stream's first pixel is written by its first chunk).

Streams of mixed geometry and mixed RGB/RGBA pack into the same lane
(decode state is channel-agnostic; channels only matter when unpacking a
stream's slice).  The reference has no analog — it decodes files one at
a time (example/source/04_bench.cpp:849-871).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import read_header
from ..ops import boundary
from ..ops import decode as dec_ops
from ..ops import place_kernel
from ..ops import replay_kernel as rk
from ..ops.bitops import packed_to_pixels


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def plan_lanes(items: Sequence[Tuple[int, int]], lane_bytes: int
               ) -> List[List[int]]:
    """First-fit-decreasing bin packing of (bytes, px) items into lanes of
    lane_bytes chunk-byte capacity.  Returns lists of item indices."""
    order = sorted(range(len(items)), key=lambda i: -items[i][0])
    lanes: List[List[int]] = []
    loads: List[int] = []
    for i in order:
        sz = items[i][0]
        for L, load in enumerate(loads):
            if load + sz <= lane_bytes:
                lanes[L].append(i)
                loads[L] += sz
                break
        else:
            lanes.append([i])
            loads.append(sz)
    return lanes


@partial(jax.jit, static_argnames=("qb", "n_cap"))
def _decode_lanes(regions, flags, chunks_sizes, qb: int, n_cap: int):
    info = boundary.analyze_region_batch(
        regions[:, :qb], chunks_sizes, jnp.int32(0)
    )
    real, pix_before = info["real"], info["pix_before"]
    meta, val = dec_ops.fields_dense_batch(regions, real)
    meta = meta | (flags[:, :qb].astype(jnp.uint32) << 9)  # stream resets
    b = meta.shape[0]
    bpad = (-b) % 8
    qpad = (-qb) % 512
    meta_t = jnp.pad(meta, ((0, bpad), (0, qpad))).T
    val_t = jnp.pad(val, ((0, bpad), (0, qpad))).T
    emits = rk.replay_batch(meta_t, val_t).T[:b, :qb]
    base = place_kernel.window_base_rows(pix_before, n_cap)
    return place_kernel.place_fill(pix_before, emits, base, n_cap)


class PackedDecoder:
    """Decode arbitrary mixed QOI streams through packed replay lanes.

    lane_bytes: chunk-byte capacity per lane (the shape the jit caches
    on; all lanes of a call share one program).
    """

    def __init__(self, lane_bytes: int = 1 << 20):
        self.lane_bytes = _round_up(lane_bytes, boundary.BLOCK)

    def decode(self, blobs: Sequence) -> List[np.ndarray]:
        """QOI byte streams (ANY geometries/channels) -> list of raw pixel
        buffers (each stream's native channels), submission order."""
        arrs = [
            np.frombuffer(bytes(x), np.uint8)
            if not isinstance(x, np.ndarray) else x
            for x in blobs
        ]
        descs = []
        for a in arrs:
            h = read_header(a)
            if not h:
                raise ValueError(f"bad stream: {h.error()}")
            descs.append(h.value())
        items = [
            (a.size - 22, d.width * d.height) for a, d in zip(arrs, descs)
        ]
        for (sz, _), d in zip(items, descs):
            if sz > self.lane_bytes:
                raise ValueError(
                    f"stream of {sz} body bytes exceeds lane capacity "
                    f"{self.lane_bytes}; raise lane_bytes or route the "
                    "stream to the batched pipeline"
                )
        lanes = plan_lanes(items, self.lane_bytes)
        # pad the lane count to a sublane multiple: XLA picks a transposed
        # (18x-padded) layout for (7, several-M) u32 temps otherwise
        while len(lanes) % 16 or len(lanes) < 16:
            lanes.append([])

        L = len(lanes)
        qb = self.lane_bytes
        regions = np.zeros((L, qb + 8), np.uint8)
        flags = np.zeros((L, qb + 8), np.uint8)
        chunks_sizes = np.zeros(L, np.int32)
        # (stream idx) -> (lane, px_offset)
        where: List[Tuple[int, int]] = [(0, 0)] * len(arrs)
        lane_px = np.zeros(L, np.int64)
        for Li, members in enumerate(lanes):
            boff = 0
            poff = 0
            for i in members:
                sz, npx = items[i]
                regions[Li, boff : boff + sz] = arrs[i][14 : 14 + sz]
                flags[Li, boff] = 1
                where[i] = (Li, poff)
                boff += sz
                poff += npx
            chunks_sizes[Li] = boff
            lane_px[Li] = poff

        n_cap = _round_up(max(int(lane_px.max()), 1), place_kernel.WIN)
        packed = _decode_lanes(
            jnp.asarray(regions),
            jnp.asarray(flags),
            jnp.asarray(chunks_sizes),
            qb=qb,
            n_cap=n_cap,
        )
        packed = np.asarray(packed)

        out: List[np.ndarray] = []
        for i, (a, d) in enumerate(zip(arrs, descs)):
            Li, poff = where[i]
            npx = d.width * d.height
            out.append(
                np.asarray(
                    packed_to_pixels(
                        jnp.asarray(packed[Li, poff : poff + npx]),
                        int(d.channels),
                    )
                )
            )
        return out
