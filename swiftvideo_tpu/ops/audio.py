"""Audio mixing compute: sample-accurate sum/gain with s16 saturation.

Reference semantics:

* ``applyMixS16`` — the CPU hot loop (mix.audio.swift:260-294): for each
  int16 sample, ``out = clamp_s16(trunc(in * gain[channel]) + out)``.
* ``channelGains`` — smoothstep pan across channels placed on a circle
  (mix.audio.swift:237-258).
* ``snd_s16i_s16i`` — the dormant 8-input GPU mix kernel
  (kernels.cl.swift:534-562), resurrected here as a batched device op:
  sources fold sequentially with saturating adds (order matters for
  saturation, so the fold is a scan, not a sum).

Both a numpy implementation (host mixer / oracle) and a jitted device
version are provided; the device version vmaps over a leading stream axis
for multi-mixer walls.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def smoothstep(edge0: float, edge1: float, val):
    """mix.audio.swift:303-306"""
    t = np.clip((val - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3 - 2 * t)


def channel_gains(position: Tuple[float, float], gain: float,
                  channel_count: int) -> np.ndarray:
    """Per-channel gains for a source at ``position`` (mix.audio.swift:237-258).
    Channels sit on a circle at angles theta*i + theta/2."""
    dims = min(channel_count - 1, 2)
    theta = 2.0 * math.pi / channel_count
    half = theta / 2.0
    out = np.empty(channel_count, dtype=np.float32)
    for idx in range(channel_count):
        px = math.cos(theta * idx + half) - position[0]
        py = math.sin(theta * idx + half) - position[1]
        if dims == 0:
            out[idx] = gain
        elif dims == 1:
            out[idx] = smoothstep(0.0, 0.5, 1.0 - px * 0.5) * gain
        else:
            dist = math.sqrt(px * px + py * py) * 0.5
            out[idx] = smoothstep(0.0, 0.5, 1.0 - dist) * gain
    return out


# --- host path (the oracle; mix.audio.swift:260-294) ----------------------

def apply_mix_s16(input_buf: np.ndarray, gains: Sequence[float],
                  backing: np.ndarray, backing_start: int = 0,
                  input_start: int = 0) -> int:
    """Saturating mix of int16 ``input_buf`` into ``backing`` in place.

    Offsets are in samples (int16 units), mirroring the byte-offset/2 math
    of the reference.  Returns the number of samples mixed, or -1 on bad
    offsets (reference returns -1 without mixing)."""
    if not (0 <= input_start < input_buf.size and
            0 <= backing_start < backing.size):
        return -1
    n = min(backing.size - backing_start, input_buf.size - input_start)
    if n <= 0:
        return 0
    gains = np.asarray(gains, dtype=np.float32)
    ch = gains.size
    idx = np.arange(n)
    g = gains[idx % ch]
    contrib = np.trunc(input_buf[input_start:input_start + n]
                       .astype(np.float32) * g).astype(np.int64)
    acc = contrib + backing[backing_start:backing_start + n].astype(np.int64)
    backing[backing_start:backing_start + n] = np.clip(
        acc, -32768, 32767).astype(np.int16)
    return n


# --- device path ----------------------------------------------------------

@lru_cache(maxsize=32)
def _mix_program(num_sources: int, length: int, channels: int, batched: bool):
    """Jitted fold of [S, n] int16 inputs with [S, C] gains into one mixed
    buffer with per-source saturation (snd_s16i_s16i semantics, ordered)."""

    def run(inputs, gains, base):
        ch_idx = jnp.arange(length, dtype=jnp.int32) % channels

        def body(acc, sg):
            src, g = sg
            # i32 accumulation is exact here: the fold clamps to s16 range
            # after every source, so magnitudes stay within i32
            contrib = jnp.trunc(src.astype(jnp.float32) * g[ch_idx]).astype(jnp.int32)
            acc = jnp.clip(acc + contrib, -32768, 32767)
            return acc, None

        acc0 = base.astype(jnp.int32)
        # full unroll (capped): per-iteration fixed costs dominate scans
        # over small tensors on this part (measured on the motion scan)
        acc, _ = jax.lax.scan(body, acc0, (inputs, gains),
                              unroll=min(num_sources, 64))
        return acc.astype(jnp.int16)

    if batched:
        return jax.jit(jax.vmap(run))
    return jax.jit(run)


def mix_s16_device(inputs, gains, base=None):
    """Mix [S, n] int16 device buffers with [S, C] gains over ``base``
    ([n] int16, zeros when None).  Returns [n] int16 device array."""
    inputs = jnp.asarray(inputs)
    gains = jnp.asarray(gains, dtype=jnp.float32)
    s, n = inputs.shape
    c = gains.shape[-1]
    if base is None:
        base = jnp.zeros((n,), jnp.int16)
    return _mix_program(s, n, c, False)(inputs, gains, base)


@lru_cache(maxsize=32)
def _mix_windowed_program(num_sources: int, length: int, channels: int):
    """Windowed variant of :func:`_mix_program`: each source mixes only
    inside its own [start, end) span of the backing buffer with the gain
    phase anchored at ``start`` — exactly ``apply_mix_s16``'s
    ``idx % ch`` over the contribution range.  Positions outside the
    span add 0 before the clamp; the accumulator is already inside
    [-32768, 32767] there, so the clamp is a no-op and the fold stays
    integer-equal to the sequential host loop."""

    def run(inputs, gains, starts, ends, base):
        idx = jnp.arange(length, dtype=jnp.int32)

        def body(acc, sg):
            src, g, lo, hi = sg
            phase = jnp.mod(idx - lo, channels)
            contrib = jnp.trunc(src.astype(jnp.float32)
                                * g[phase]).astype(jnp.int32)
            contrib = jnp.where((idx >= lo) & (idx < hi), contrib, 0)
            return jnp.clip(acc + contrib, -32768, 32767), None

        acc, _ = jax.lax.scan(body, base.astype(jnp.int32),
                              (inputs, gains, starts, ends),
                              unroll=min(num_sources, 64))
        return acc.astype(jnp.int16)

    return jax.jit(run)


def mix_s16_device_windowed(inputs, gains, starts, ends, base=None):
    """Mix [S, L] int16 buffers (zero-padded into backing alignment) with
    [S, C] gains, each source active on [starts[k], ends[k]) of the
    backing.  Covers the offset/partial-window contributions the aligned
    :func:`mix_s16_device` fast path cannot."""
    inputs = jnp.asarray(inputs)
    gains = jnp.asarray(gains, dtype=jnp.float32)
    s, n = inputs.shape
    c = gains.shape[-1]
    if base is None:
        base = jnp.zeros((n,), jnp.int16)
    return _mix_windowed_program(s, n, c)(
        inputs, gains, jnp.asarray(starts, jnp.int32),
        jnp.asarray(ends, jnp.int32), base)


def mix_s16_device_batched(inputs, gains, base=None):
    """Batched over a leading stream axis: [B, S, n] x [B, S, C] -> [B, n]."""
    inputs = jnp.asarray(inputs)
    gains = jnp.asarray(gains, dtype=jnp.float32)
    b, s, n = inputs.shape
    c = gains.shape[-1]
    if base is None:
        base = jnp.zeros((b, n), jnp.int16)
    return _mix_program(s, n, c, True)(inputs, gains, base)


# --- audio stats (stats.audio.swift:19-86) --------------------------------

def audio_peak_rms(buffers: Sequence[np.ndarray], fmt: str,
                   channels: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel (peak, rms) in [0,1] for s16/f32, planar or interleaved."""
    peaks = np.zeros(channels, np.float32)
    rms = np.zeros(channels, np.float32)
    planar = fmt.endswith("p")
    scale = 32768.0 if fmt.startswith("s16") else 1.0
    for ch in range(channels):
        if planar:
            data = np.asarray(buffers[ch]).astype(np.float32) / scale
        else:
            data = np.asarray(buffers[0]).astype(np.float32)[ch::channels] / scale
        if data.size:
            peaks[ch] = np.abs(data).max()
            rms[ch] = np.sqrt(np.mean(data * data))
    return peaks, rms
