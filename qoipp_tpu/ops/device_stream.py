"""Device-resident windowed streaming codec.

The reference streams with byte-granular resumability and a ~260-byte
bounded state (SURVEY.md §5: channels + run counter + prev pixel + 64-entry
table; reference: include/qoipp/stream.hpp:109-116).  The TPU-native analog
streams WINDOW-granular: each call processes a large window on-device with
the same carry — (prev, seen) device arrays plus a run counter and at most
4 leftover bytes of a split chunk on the host — so multi-MB images decode/
encode in bounded device memory, bit-exact with the one-shot codec on the
concatenated stream.  Byte-granular resumability (partial output buffers,
transactional rollback) remains the native StreamEncoder/StreamDecoder's
job (qoipp_tpu.stream).

Decode windows ride the carried-state Pallas replay kernel
(ops/replay_kernel.replay_batch_carry); encode windows run the parallel
encoder with carried (prev, run, table) seeds.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import (
    Channels,
    Desc,
    Error,
    Result,
    read_header,
)
from . import boundary
from . import decode as dec_ops
from . import encode as enc_ops
from . import replay_kernel as rk
from .bitops import (
    START_PIXEL_PACKED,
    hash6,
    packed_to_pixels,
    pixels_to_packed,
)

_START_HASH = (11 * 255) % 64


def _round_up(n, m):
    return -(-n // m) * m


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("qb", "pixel_cap"))
def _decode_window(region, win_len, prev_in, seen_in, qb: int, pixel_cap: int):
    """Decode the complete chunks of one window.

    region: (qb + 8,) u8 (window bytes, zero-padded); win_len: traced byte
    count.  Returns (packed (pixel_cap,), n_pixels, consumed_bytes,
    prev_out, seen_out).
    """
    q = jnp.arange(qb, dtype=jnp.int32)
    is_start = boundary.chunk_starts(region[:qb])
    lens = boundary.chunk_len_of(region[:qb]).astype(jnp.int32)
    complete = is_start & (q + lens <= win_len)

    tag = region[:qb].astype(jnp.int32)
    is_run = ((tag & 0xC0) == 0xC0) & (tag != 0xFE) & (tag != 0xFF)
    produced_raw = jnp.where(is_run, (tag & 0x3F) + 1, 1).astype(jnp.int32)
    produced = jnp.where(complete, produced_raw, 0)
    pix_before = jnp.cumsum(produced) - produced
    consumed = jnp.max(jnp.where(complete, q + lens, 0))

    meta, val = dec_ops.fields_dense_batch(region[None], complete[None])
    qpad = (-qb) % 512
    lanes = 8
    meta_b = jnp.broadcast_to(
        jnp.pad(meta, ((0, 0), (0, qpad)))[0][:, None], (qb + qpad, lanes)
    )
    val_b = jnp.broadcast_to(
        jnp.pad(val, ((0, 0), (0, qpad)))[0][:, None], (qb + qpad, lanes)
    )
    emits, prev_out, seen_out = rk.replay_batch_carry(
        meta_b, val_b, prev_in, seen_in
    )
    packed = dec_ops.expand_bytes_batch(
        emits[: qb, :1].T, complete[None], produced[None], pix_before[None],
        pixel_cap,
    )[0]
    n_pixels = jnp.sum(produced)
    return packed, n_pixels, consumed, prev_out, seen_out


class DeviceStreamDecoder:
    """Window-granular streaming QOI decoder with device-resident state."""

    def __init__(self, window_cap: int = 1 << 20, pixel_cap: Optional[int] = None):
        self.window_cap = _round_up(window_cap, boundary.BLOCK)
        self.pixel_cap = pixel_cap or _round_up(8 * self.window_cap, 128)
        self._lanes = 8
        self._desc: Optional[Desc] = None
        self._target: Optional[Channels] = None
        self._leftover = b""
        self._prev = None
        self._seen = None

    def is_initialized(self) -> bool:
        return self._desc is not None

    def initialize(self, header_bytes, target: Optional[Channels] = None) -> Result[Desc]:
        if self._desc is not None:
            return Result.err(Error.ALREADY_INITIALIZED)
        hdr = read_header(header_bytes)
        if not hdr:
            return Result.err(hdr.error())
        self._desc = hdr.value()
        self._target = target or self._desc.channels
        self._prev, self._seen = rk.initial_state(self._lanes)
        self._leftover = b""
        return Result.ok(self._desc.replace(channels=self._target))

    def decode_window(self, data) -> Result[np.ndarray]:
        """Consume a byte window (chunks only, no header/end marker); returns
        the raw pixel bytes its complete chunks produce (target channels).
        Split chunks at the tail are carried into the next call."""
        if self._desc is None:
            return Result.err(Error.NOT_INITIALIZED)
        buf = self._leftover + bytes(
            data.tobytes() if isinstance(data, np.ndarray) else data
        )
        if len(buf) == 0:
            return Result.err(Error.EMPTY)
        out_parts = []
        pos = 0
        while pos < len(buf):
            win = buf[pos : pos + self.window_cap]
            region = np.zeros(self.window_cap + 8, np.uint8)
            region[: len(win)] = np.frombuffer(win, np.uint8)
            packed, n_pix, consumed, prev, seen = _decode_window(
                jnp.asarray(region),
                jnp.int32(len(win)),
                self._prev,
                self._seen,
                qb=self.window_cap,
                pixel_cap=self.pixel_cap,
            )
            n_pix = int(n_pix)
            consumed = int(consumed)
            if n_pix > self.pixel_cap:
                return Result.err(Error.NOT_ENOUGH_SPACE)
            if consumed == 0:
                break  # only a split chunk left
            # state advances only over consumed chunks: replay guaranteed
            # since complete-chunk prefix == consumed prefix
            self._prev, self._seen = prev, seen
            out_parts.append(
                np.asarray(
                    packed_to_pixels(packed[:n_pix], int(self._target))
                )
            )
            pos += consumed
        self._leftover = buf[pos:]
        if out_parts:
            return Result.ok(np.concatenate(out_parts))
        return Result.ok(np.zeros(0, np.uint8))

    def reset(self) -> None:
        self._desc = None
        self._target = None
        self._leftover = b""
        self._prev = None
        self._seen = None


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("channels", "nb"))
def _encode_window(packed, n_px, prev_c, run_c, seen_c, channels: int, nb: int):
    """Encode one pixel window with carried state.

    packed: (nb,) u32; n_px: pixels in window; prev_c/run_c: carried prev
    pixel / run counter; seen_c: (64,) carried table.
    Returns (bytes (w_cap,), length, prev_out, run_out, seen_out).
    """
    template, nbytes, _tail, _ = enc_ops._encode_fields(
        packed, n_px, channels,
        carry_prev=prev_c, carry_run=run_c, carry_seen=seen_c,
    )
    offsets = jnp.cumsum(nbytes) - nbytes
    chunks_end = jnp.sum(nbytes)
    w_cap = (channels + 1) * nb + 16
    out = jnp.zeros(w_cap + 1, jnp.uint8)
    for k in range(6):
        contrib = jnp.where(k < nbytes, template[:, k], 0)
        idx_k = jnp.minimum(offsets + k, w_cap)
        out = out.at[idx_k].add(contrib, indices_are_sorted=True)
    out = out[:w_cap]

    # carry out
    idx = jnp.arange(nb, dtype=jnp.int32)
    valid = idx < n_px
    prev_arr = jnp.concatenate([jnp.array([prev_c], jnp.uint32), packed[:-1]])
    eq_raw = packed == prev_arr
    last_noneq = jax.lax.cummax(
        jnp.where(valid & ~eq_raw, idx, -(run_c.astype(jnp.int32) + 1))
    )
    cnt = idx - last_noneq
    last = n_px - 1
    run_out = jnp.where(eq_raw[last] & valid[last], cnt[last] % 62, 0)
    prev_out = packed[last]

    # table out: last differing pixel per slot, else carried entry
    h = hash6(packed)
    noneq = valid & ~eq_raw
    slot_ids = jnp.arange(64, dtype=jnp.int32)
    m = (h[None, :] == slot_ids[:, None]) & noneq[None, :]  # (64, nb)
    jbest = jnp.max(jnp.where(m, idx[None, :] + 1, 0), axis=1)  # (64,)
    sel = (idx[None, :] + 1) == jbest[:, None]
    vals = jnp.sum(jnp.where(sel, packed[None, :], 0), axis=1)
    seen_out = jnp.where(jbest > 0, vals, seen_c)

    return out, chunks_end, prev_out, run_out, seen_out


class DeviceStreamEncoder:
    """Window-granular streaming QOI encoder with device-resident state.

    Feed whole-pixel windows; receive each window's chunk bytes.  finalize()
    returns the pending-run byte (if any) plus the end marker — matching
    the reference's finalize contract (stream.cpp:241-267) at window
    granularity."""

    def __init__(self, window_px: int = 1 << 18):
        self.window_px = window_px
        self.nb = enc_ops.pad_to_tile(window_px)
        self._desc: Optional[Desc] = None
        self._prev = None
        self._run = None
        self._seen = None

    def is_initialized(self) -> bool:
        return self._desc is not None

    def initialize(self, desc: Desc) -> Result[bytes]:
        """Returns the 14-byte header."""
        from ..common import count_bytes, write_header

        if self._desc is not None:
            return Result.err(Error.ALREADY_INITIALIZED)
        bc = count_bytes(desc)
        if not bc:
            return Result.err(bc.error())
        self._desc = desc
        self._prev = jnp.uint32(START_PIXEL_PACKED)
        self._run = jnp.uint32(0)
        self._seen = jnp.zeros(64, jnp.uint32)
        return Result.ok(write_header(desc))

    def encode_window(self, raw) -> Result[np.ndarray]:
        """Encode a whole-pixel raw window; returns its chunk bytes."""
        if self._desc is None:
            return Result.err(Error.NOT_INITIALIZED)
        ch = int(self._desc.channels)
        raw = np.asarray(raw, np.uint8).reshape(-1)
        if raw.size % ch:
            return Result.err(Error.MISMATCHED_DESC)
        n = raw.size // ch
        out_parts = []
        for s in range(0, n, self.window_px):
            cnt = min(self.window_px, n - s)
            buf = np.zeros((self.nb, ch), np.uint8)
            buf[:cnt] = raw[s * ch : (s + cnt) * ch].reshape(cnt, ch)
            packed = pixels_to_packed(jnp.asarray(buf.reshape(-1)), ch)
            out, length, prev, run, seen = _encode_window(
                packed, jnp.int32(cnt), self._prev, self._run, self._seen,
                channels=ch, nb=self.nb,
            )
            self._prev, self._run, self._seen = prev, run, seen
            out_parts.append(np.asarray(out[: int(length)]))
        return Result.ok(
            np.concatenate(out_parts) if out_parts else np.zeros(0, np.uint8)
        )

    def has_run_count(self) -> bool:
        return self._run is not None and int(self._run) > 0

    def finalize(self) -> Result[bytes]:
        """Pending run byte (if any) + end marker; resets state."""
        from ..common import END_MARKER

        if self._desc is None:
            return Result.err(Error.NOT_INITIALIZED)
        run = int(self._run)
        tail = (bytes([0xC0 | (run - 1)]) if run > 0 else b"") + END_MARKER
        self.reset()
        return Result.ok(tail)

    def reset(self) -> None:
        self._desc = None
        self._prev = None
        self._run = None
        self._seen = None
