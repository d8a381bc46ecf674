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

from functools import lru_cache
from typing import Sequence, Tuple

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


# --- boxed composite: per-source output bounding boxes ---------------------

def _host_box_size(packed_np: np.ndarray, size: Tuple[int, int],
                   bucket_h: int = 64, bucket_w: int = 128) -> Tuple[int, int]:
    """Static (bh, bw) bucket for a source's writable output region (its
    border rect), from HOST uniform values.  Bucketing bounds retraces when
    elements animate."""
    w, h = size
    p = np.asarray(packed_np, np.float64)

    def axis_extent(a, t, full):
        if abs(a) < 1e-12:
            return 0.0, float(full)
        lo = (0.0 - t) / a
        hi = (1.0 - t) / a
        lo, hi = min(lo, hi), max(lo, hi)
        # ndc -> pixels
        return (lo + 1.0) / 2.0 * full, (hi + 1.0) / 2.0 * full

    x0, x1 = axis_extent(p[12], p[16], w)
    y0, y1 = axis_extent(p[15], p[17], h)
    bw = int(np.ceil(min(x1, w) - max(x0, 0))) + 4
    bh = int(np.ceil(min(y1, h) - max(y0, 0))) + 4
    bw = min(-(-max(bw, 2) // bucket_w) * bucket_w, w)
    bh = min(-(-max(bh, 2) // bucket_h) * bucket_h, h)
    # chroma slices need even dims
    return bh + (bh % 2), bw + (bw % 2)


def _box_offsets(packed, size: Tuple[int, int], bh: int, bw: int):
    """Traced (oy, ox), even, clipped so the (bh, bw) box stays in-bounds."""
    w, h = size
    eps = 1e-12
    ax = packed[12]
    tx = packed[16]
    ay = packed[15]
    ty = packed[17]
    x_lo = jnp.minimum((0.0 - tx) / (ax + eps), (1.0 - tx) / (ax + eps))
    y_lo = jnp.minimum((0.0 - ty) / (ay + eps), (1.0 - ty) / (ay + eps))
    ox = (x_lo + 1.0) / 2.0 * w - 1.0
    oy = (y_lo + 1.0) / 2.0 * h - 1.0
    ox = jnp.clip(jnp.floor(ox / 2.0) * 2.0, 0, max(w - bw, 0)).astype(jnp.int32)
    oy = jnp.clip(jnp.floor(oy / 2.0) * 2.0, 0, max(h - bh, 0)).astype(jnp.int32)
    return oy, ox


@lru_cache(maxsize=256)
def _stack_program_boxed(out_fmt: PixelFormat, size: Tuple[int, int],
                         in_fmts: Tuple[PixelFormat, ...],
                         boxes: Tuple[Tuple[int, int], ...]):
    """Clear-then-fold where each source composites only into its bounding
    box (dynamic_slice / dynamic_update_slice with static box sizes) —
    per-pass cost scales with element area, not canvas area.  Axis-aligned
    yuv-planar sources only."""
    w, h = size

    def run(source_planes, uniforms):
        target = [jnp.asarray(p) for p in golden.clear_planes(out_fmt, size)]
        for i, in_fmt in enumerate(in_fmts):
            bh, bw = boxes[i]
            oy, ox = _box_offsets(uniforms[i], size, bh, bw)
            cy, cx = oy // 2, ox // 2
            sliced = [
                jax.lax.dynamic_slice(target[0], (oy, ox), (bh, bw)),
                jax.lax.dynamic_slice(target[1], (cy, cx), (bh // 2, bw // 2)),
                jax.lax.dynamic_slice(target[2], (cy, cx), (bh // 2, bw // 2)),
            ]
            out = golden.apply_composite(
                sliced, out_fmt, source_planes[i], in_fmt, uniforms[i],
                xp=jnp, separable=True, origin=(oy, ox), full_size=(h, w))
            target = [
                jax.lax.dynamic_update_slice(target[0], out[0], (oy, ox)),
                jax.lax.dynamic_update_slice(target[1], out[1], (cy, cx)),
                jax.lax.dynamic_update_slice(target[2], out[2], (cy, cx)),
            ]
        return tuple(target)

    return jax.jit(run)


def composite_stack_boxed(out_fmt: PixelFormat, size: Tuple[int, int],
                          sources):
    """Boxed device fold (axis-aligned planar-yuv sources).  Falls back to
    composite_stack_device when preconditions fail."""
    from ..media.pixel import PixelFormat as PF
    packed = [golden._packed(u) for _, _, u in sources]
    ok = (out_fmt == PF.y420p
          and all(fmt == PF.y420p for _, fmt, _ in sources)
          and all(golden.is_axis_aligned(p) for p in packed))
    if not ok or not sources:
        return composite_stack_device(out_fmt, size, sources)
    boxes = tuple(_host_box_size(p, size) for p in packed)
    in_fmts = tuple(fmt for _, fmt, _ in sources)
    planes = tuple(tuple(jnp.asarray(p) for p in s) for s, _, _ in sources)
    unis = jnp.stack([jnp.asarray(p) for p in packed])
    program = _stack_program_boxed(out_fmt, size, in_fmts, boxes)
    return program(planes, unis)


# --- batched-sampling boxed composite --------------------------------------

@lru_cache(maxsize=128)
def _stack_program_batched_boxed(size: Tuple[int, int], n_sources: int,
                                 box: Tuple[int, int],
                                 in_shape: Tuple[int, int]):
    """Two-phase fold for the uniform case (same-size axis-aligned planar-yuv
    sources, one shared box bucket):

    * phase A — **batched** bilinear sampling + csc of all sources into
      box-sized tiles via vmap (sampling is the expensive part; batching
      amortizes the per-op overhead ~15x, as the mixing wall demonstrates);
    * phase B — the z-order blend fold, sequential but purely elementwise
      on box-sized slices (dynamic_slice / blend / dynamic_update_slice).

    Parity-exact with golden.composite_stack.
    """
    w, h = size
    bh, bw = box
    hin, win = in_shape

    def offsets(uniforms):
        oys, oxs = [], []
        for i in range(n_sources):
            oy, ox = _box_offsets(uniforms[i], size, bh, bw)
            oys.append(oy)
            oxs.append(ox)
        return jnp.stack(oys), jnp.stack(oxs)

    def sample_tile(planes, packed, oy, ox, grid_shape, grid_origin_div,
                    full, want):
        gh, gw = grid_shape
        d = grid_origin_div
        m = golden._masks(packed, gh, gw, jnp, True,
                          (oy // d, ox // d), full)
        _, _, _, uv_x, uv_y = m
        if want == "y":
            return golden.bilinear_norm(golden._to_f(planes[0], jnp),
                                        uv_x, uv_y, jnp)
        cb = golden.bilinear_norm(golden._to_f(planes[1], jnp), uv_x, uv_y, jnp)
        cr = golden.bilinear_norm(golden._to_f(planes[2], jnp), uv_x, uv_y, jnp)
        return jnp.stack([cb, cr])

    def blend_plane(cur_u8, samp, packed, oy, ox, full, fill_chan, clamp_lo):
        # cur_u8/samp: [gh, gw] or [C, gh, gw] (chroma channels stacked so
        # both blend in one op pass); fill_chan broadcasts per channel
        gh, gw = cur_u8.shape[-2:]
        mb, mt, mu, _, _ = golden._masks(packed, gh, gw, jnp, True,
                                         (oy, ox), full)
        op = packed[22]
        a_fill = op * packed[21]
        cur = cur_u8.astype(jnp.float32) * (1.0 / 255.0)
        blended = cur * (1 - op) + samp * op
        filled = jnp.clip(cur * (1 - a_fill) + fill_chan * a_fill,
                          clamp_lo, 1.0)
        out = jnp.where(mb & mt & mu, blended, jnp.where(mb, filled, cur))
        return jnp.clip(jnp.rint(out * 255.0), 0, 255).astype(jnp.uint8)

    from .color import RGB2YUV

    def run(ys, us, vs, uniforms):
        # ys: [N, hin, win] u8 etc.; uniforms [N, UNIFORM_WIDTH]
        oys, oxs = offsets(uniforms)
        # phase A: batched sampling
        luma_tiles = jax.vmap(
            lambda y, u, v, p, oy, ox: sample_tile(
                (y, u, v), p, oy, ox, (bh, bw), 1, (h, w), "y")
        )(ys, us, vs, uniforms, oys, oxs)
        chroma_tiles = jax.vmap(
            lambda y, u, v, p, oy, ox: sample_tile(
                (y, u, v), p, oy, ox, (bh // 2, bw // 2), 2,
                (h // 2, w // 2), "uv")
        )(ys, us, vs, uniforms, oys, oxs)
        # phase B: sequential blend fold (chroma channels stacked: one
        # slice/blend/update per source instead of two)
        ty = jnp.zeros((h, w), jnp.uint8)
        tc = jnp.full((2, h // 2, w // 2), 128, jnp.uint8)
        for i in range(n_sources):
            oy, ox = oys[i], oxs[i]
            cy, cx = oy // 2, ox // 2
            fill = uniforms[i][18:22]
            fill_yuv = [RGB2YUV[ch, 0] * fill[0] + RGB2YUV[ch, 1] * fill[1]
                        + RGB2YUV[ch, 2] * fill[2] + RGB2YUV[ch, 3]
                        for ch in range(3)]
            sl = jax.lax.dynamic_slice(ty, (oy, ox), (bh, bw))
            o0 = blend_plane(sl, luma_tiles[i], uniforms[i], oy, ox,
                             (h, w), fill_yuv[0], 0.0)
            ty = jax.lax.dynamic_update_slice(ty, o0, (oy, ox))
            slc = jax.lax.dynamic_slice(tc, (0, cy, cx),
                                        (2, bh // 2, bw // 2))
            fill_c = jnp.stack([fill_yuv[1], fill_yuv[2]])[:, None, None]
            oc = blend_plane(slc, chroma_tiles[i], uniforms[i], cy, cx,
                             (h // 2, w // 2), fill_c, -1.0)
            tc = jax.lax.dynamic_update_slice(tc, oc, (0, cy, cx))
        return ty, tc[0], tc[1]

    return jax.jit(run)


def composite_stack_batched_boxed(size: Tuple[int, int], sources):
    """Uniform-case fast fold: all sources same shape, axis-aligned,
    planar-yuv, one shared (max) box bucket.  Falls back to
    composite_stack_boxed otherwise."""
    from ..media.pixel import PixelFormat as PF
    packed = [golden._packed(u) for _, _, u in sources]
    shapes = {tuple(np.asarray(s[0]).shape) for s, _, _ in sources}
    ok = (sources and len(shapes) == 1
          and all(fmt == PF.y420p for _, fmt, _ in sources)
          and all(golden.is_axis_aligned(p) for p in packed))
    if not ok:
        return composite_stack_boxed(PF.y420p, size, sources)
    boxes = [_host_box_size(p, size) for p in packed]
    box = (max(b[0] for b in boxes), max(b[1] for b in boxes))
    in_shape = next(iter(shapes))
    ys = jnp.stack([jnp.asarray(s[0]) for s, _, _ in sources])
    us = jnp.stack([jnp.asarray(s[1]) for s, _, _ in sources])
    vs = jnp.stack([jnp.asarray(s[2]) for s, _, _ in sources])
    unis = jnp.stack([jnp.asarray(p) for p in packed])
    program = _stack_program_batched_boxed(size, len(sources), box, in_shape)
    return program(ys, us, vs, unis)
