"""Device composite path: jitted XLA programs over the shared spec math.

The gather-based device path runs golden.py's algorithm with ``jax.numpy``,
jitted per (output format, size, source-structure) — XLA fuses the whole
clear + N-source fold into a handful of kernels.  This is the correctness
device path; ops.pallas_kernels holds the hand-fused performance kernels and
falls back to this everywhere Pallas is unavailable (CPU tests).

Batching: ``composite_stack_batched`` vmaps the fold over a leading stream
axis — the multi-stream mixing wall builds on it (parallel.wall shards the
batch over a device mesh).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..media.pixel import PixelFormat
from . import golden
from .uniforms import UNIFORM_WIDTH, ImageUniforms


@lru_cache(maxsize=256)
def _stack_program(out_fmt: PixelFormat, size: Tuple[int, int],
                   in_fmts: Tuple[PixelFormat, ...],
                   separable: Tuple[bool, ...], batched: bool):
    """Build + jit a clear-then-fold composite program.

    Source planes arrive as a flat tuple-of-tuples pytree; uniforms as one
    [N, UNIFORM_WIDTH] array indexed per source.  ``separable[i]`` selects
    the axis-split fast sampling path per source (static; re-traced only
    when a source's axis-alignment status changes).
    """

    def run(source_planes, uniforms):
        target = [jnp.asarray(p) for p in golden.clear_planes(out_fmt, size)]
        for i, in_fmt in enumerate(in_fmts):
            target = golden.apply_composite(target, out_fmt, source_planes[i],
                                            in_fmt, uniforms[i], xp=jnp,
                                            separable=separable[i])
        return tuple(target)

    if batched:
        return jax.jit(jax.vmap(run))
    return jax.jit(run)


def composite_stack_device(out_fmt: PixelFormat, size: Tuple[int, int],
                           sources: Sequence[Tuple[Sequence, PixelFormat,
                                                   ImageUniforms]]):
    """Device equivalent of golden.composite_stack: clear + fold N z-sorted
    sources in one jitted program.  Returns a tuple of device arrays."""
    in_fmts = tuple(fmt for _, fmt, _ in sources)
    planes = tuple(tuple(jnp.asarray(p) for p in s) for s, _, _ in sources)
    packed = [golden._packed(u) for _, _, u in sources]
    separable = tuple(golden.is_axis_aligned(p) for p in packed)
    if sources:
        unis = jnp.stack([jnp.asarray(p) for p in packed])
    else:
        unis = jnp.zeros((0, UNIFORM_WIDTH), jnp.float32)
    program = _stack_program(out_fmt, size, in_fmts, separable, False)
    return program(planes, unis)


def composite_stack_batched(out_fmt: PixelFormat, size: Tuple[int, int],
                            in_fmts: Tuple[PixelFormat, ...],
                            source_planes, uniforms,
                            separable: bool = True):
    """Batched fold over a leading stream axis.

    ``source_planes``: per-source tuples of [B, ...plane] arrays;
    ``uniforms``: [B, N, UNIFORM_WIDTH].  Returns tuple of [B, ...] planes.
    """
    program = _stack_program(out_fmt, size, tuple(in_fmts),
                             tuple(separable for _ in in_fmts), True)
    return program(source_planes, uniforms)


# --- single-kernel entry (ComputeKernel emulation) -------------------------

@lru_cache(maxsize=256)
def _apply_program(out_fmt: PixelFormat, in_fmt: PixelFormat,
                   out_size: Tuple[int, int], in_size: Tuple[int, int],
                   separable: bool):
    def run(target_planes, source_planes, packed):
        return tuple(golden.apply_composite(list(target_planes), out_fmt,
                                            list(source_planes), in_fmt,
                                            packed, xp=jnp,
                                            separable=separable))
    return jax.jit(run)


def apply_composite_device(target_planes, out_fmt: PixelFormat,
                           source_planes, in_fmt: PixelFormat, uni):
    """One source composited over the target on device (one reference kernel
    launch, compute.cl.swift:264-344)."""
    t = tuple(jnp.asarray(p) for p in target_planes)
    s = tuple(jnp.asarray(p) for p in source_planes)
    out_size = (t[0].shape[1], t[0].shape[0])
    in_size = (s[0].shape[1], s[0].shape[0])
    packed = golden._packed(uni)
    program = _apply_program(out_fmt, in_fmt, out_size, in_size,
                             golden.is_axis_aligned(packed))
    return program(t, s, jnp.asarray(packed))


def clear_device(out_fmt: PixelFormat, size: Tuple[int, int]):
    return tuple(jnp.asarray(p) for p in golden.clear_planes(out_fmt, size))
