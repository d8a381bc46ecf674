"""Fused Pallas composite kernel (TPU).

The performance path for the hot composite op (axis-aligned transforms,
yuv-planar source -> yuv-planar target — the mixer / wall / ladder hot
case).  One ``pallas_call`` per (source, plane-grid):

* grid = output tiles [TH, TW]; the current target tile streams through a
  blocked BlockSpec (auto-pipelined);
* the source plane stays in HBM (``pl.ANY``); each tile DMAs only the
  ``[KH, KW]`` source window its footprint needs, located by
  scalar-prefetched per-row/col base offsets (computed from the uniforms
  in-graph);
* bilinear sampling becomes two small MXU matmuls per tile
  (``R[TH,KH] @ src @ C[TW,KW]^T``) with weights built from iota —
  mathematically identical to the OpenCL normalized sampler
  (kernels.cl.swift:61), clamp-to-edge included via coordinate clamping;
* border/element/texture masks, fill color, and the family-A blend
  (kernels.cl.swift:186-255) evaluate elementwise on the VPU.

The XLA axis-split path (ops.golden separable=True) remains the fallback
for rgba/rotation/interleaved-chroma cases and non-TPU backends.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE_H = 128
TILE_W = 128
# static source-window buckets to bound recompiles; u8 memrefs tile as
# (32, 128), so HBM slice offsets AND sizes must align to 32 rows / 128
# lanes
_ROW_BUCKETS = (64, 160, 288, 544, 1088)
_COL_BUCKETS = (128, 256, 512, 1024, 2048)
ROW_ALIGN = 32
COL_ALIGN = 128


def _bucket(k: int, buckets) -> int:
    for b in buckets:
        if k <= b:
            return b
    raise ValueError(f"source window {k} too large for pallas path")


def kernel_extent(scale: float, tile: int, align: int) -> int:
    """Rows/cols of source a tile footprint can touch, plus alignment slack."""
    buckets = _ROW_BUCKETS if align == ROW_ALIGN else _COL_BUCKETS
    return _bucket(int(np.ceil(abs(scale) * tile)) + 3 + align, buckets)


def _composite_plane_kernel(params_ref, base_r_ref, base_c_ref,
                            src_hbm, cur_ref, out_ref,
                            scratch, sem, *, kh: int, kw: int,
                            h_out: int, w_out: int, h_in: int, w_in: int):
    """One output tile of one plane-grid.

    params layout (f32[16]):
      0: ay   1: by     (y_out -> y_src pixel affine)
      2: ax   3: bx
      4: ty_a 5: ty_b   (y_out -> element-local tx_y)
      6: tx_a 7: tx_b
      8: bdy_a 9: bdy_b (y_out -> border-local)
      10: bdx_a 11: bdx_b
      12: opacity  13: a_fill  14: fill_chan  15: clamp_lo
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    # _bases aligns offsets to the u8 memref tiling; multiple_of carries the
    # proof Mosaic needs to slice HBM at a dynamic offset
    br = pl.multiple_of(base_r_ref[i], 32)
    bc = pl.multiple_of(base_c_ref[j], 128)
    copy = pltpu.make_async_copy(
        src_hbm.at[pl.ds(br, kh), pl.ds(bc, kw)], scratch, sem)
    copy.start()

    # output-pixel coordinates of this tile
    rows = (i * TILE_H + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, 1), 0)
            ).astype(jnp.float32)
    cols = (j * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
            ).astype(jnp.float32)

    ay, by = params_ref[0], params_ref[1]
    ax, bx = params_ref[2], params_ref[3]
    y_src = ay * rows + by                      # [TH, 1]
    x_src = ax * cols + bx                      # [1, TW]
    yc = jnp.clip(y_src, 0.0, h_in - 1.0)
    xc = jnp.clip(x_src, 0.0, w_in - 1.0)

    # interpolation weights vs the DMA'd window rows/cols
    k_rows = (br + jax.lax.broadcasted_iota(jnp.int32, (1, kh), 1)
              ).astype(jnp.float32)             # [1, KH]
    k_cols = (bc + jax.lax.broadcasted_iota(jnp.int32, (1, kw), 1)
              ).astype(jnp.float32)             # [1, KW]
    R = jnp.maximum(0.0, 1.0 - jnp.abs(yc - k_rows))          # [TH, KH]
    C = jnp.maximum(0.0, 1.0 - jnp.abs(xc.T - k_cols))        # [TW, KW]

    copy.wait()
    sf = scratch[...].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)     # [KH, KW]
    tmp = jnp.dot(R, sf, preferred_element_type=jnp.float32)  # [TH, KW]
    samp = jnp.dot(tmp, C.T, preferred_element_type=jnp.float32)

    # separable masks (element/texture/border)
    ty = params_ref[4] * rows + params_ref[5]
    txx = params_ref[6] * cols + params_ref[7]
    bdy = params_ref[8] * rows + params_ref[9]
    bdx = params_ref[10] * cols + params_ref[11]
    in01 = lambda v: (v >= 0.0) & (v <= 1.0)
    m_uv_y = (y_src >= -0.5) & (y_src <= h_in - 0.5) & in01(ty)
    m_uv_x = (x_src >= -0.5) & (x_src <= w_in - 0.5) & in01(txx)
    m_tex = m_uv_y & m_uv_x                       # [TH, TW] via broadcast
    m_border = in01(bdy) & in01(bdx)

    op = params_ref[12]
    a_fill = params_ref[13]
    fill_chan = params_ref[14]
    clamp_lo = params_ref[15]
    cur_f = cur_ref[...].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    blended = cur_f * (1.0 - op) + samp * op
    filled = jnp.clip(cur_f * (1.0 - a_fill) + fill_chan * a_fill,
                      clamp_lo, 1.0)
    out = jnp.where(m_border & m_tex, blended,
                    jnp.where(m_border, filled, cur_f))
    out_ref[...] = jnp.clip(jnp.rint(out * 255.0), 0.0, 255.0
                            ).astype(jnp.int32).astype(jnp.uint8)


@lru_cache(maxsize=128)
def _plane_program(h_out: int, w_out: int, h_in: int, w_in: int,
                   kh: int, kw: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (-(-h_out // TILE_H), -(-w_out // TILE_W))

    kernel = partial(_composite_plane_kernel, kh=kh, kw=kw,
                     h_out=h_out, w_out=w_out, h_in=h_in, w_in=w_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # params, base_r, base_c
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # src (HBM)
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda i, j, *_: (i, j)),          # cur tile
        ],
        out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((kh, kw), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h_out, w_out), jnp.uint8),
        interpret=interpret,
    )

    def run(params, base_r, base_c, src, cur):
        return fn(params, base_r, base_c, src, cur)

    return jax.jit(run)


def _plane_params(packed, h_out, w_out, h_in, w_in, fill_chan, clamp_lo,
                  premultiplied_fill: bool = False):
    """Derive the per-plane affine scalars from a packed uniform vector.
    Works on traced jnp values (runs in-graph)."""
    t0, t3, t4, t5 = packed[0], packed[3], packed[4], packed[5]
    e0, e3, e4, e5 = packed[6], packed[9], packed[10], packed[11]
    b0, b3, b4, b5 = packed[12], packed[15], packed[16], packed[17]
    # out px -> ndc: p = 2*x/W - 1 ; tx = t0*p + t4 ; uv = e0*tx + e4
    # x_src = uv * w_in - 0.5
    a_tx_x = t0 * 2.0 / w_out
    b_tx_x = t4 - t0
    a_uv_x = e0 * a_tx_x
    b_uv_x = e0 * b_tx_x + e4
    ax = a_uv_x * w_in
    bx = b_uv_x * w_in - 0.5
    a_tx_y = t3 * 2.0 / h_out
    b_tx_y = t5 - t3
    a_uv_y = e3 * a_tx_y
    b_uv_y = e3 * b_tx_y + e5
    ay = a_uv_y * h_in
    by = b_uv_y * h_in - 0.5
    a_bd_x = b0 * 2.0 / w_out
    b_bd_x = b4 - b0
    a_bd_y = b3 * 2.0 / h_out
    b_bd_y = b5 - b3
    op = packed[22]
    a_fill = op * packed[21]
    return jnp.stack([ay, by, ax, bx,
                      a_tx_y, b_tx_y, a_tx_x, b_tx_x,
                      a_bd_y, b_bd_y, a_bd_x, b_bd_x,
                      op, a_fill, fill_chan, clamp_lo]).astype(jnp.float32)


def _bases(a, b, n_tiles, tile, k, padded_size, align):
    """Per-tile source window base offsets, rounded down to the memory-tile
    alignment Mosaic requires for HBM slices (in-graph, int32 [n_tiles]).
    ``padded_size`` must be >= align_down(real_size - 1, align) + k so the
    clamp never pulls a window away from the rows/cols a tile needs."""
    idx = jnp.arange(n_tiles, dtype=jnp.float32) * tile
    lo = jnp.minimum(a * idx + b, a * (idx + tile - 1) + b)
    base = jnp.floor(lo) - 1.0
    base = jnp.clip(base, 0, None).astype(jnp.int32)
    base = (base // align) * align
    return jnp.clip(base, 0, max(padded_size - k, 0))


def composite_plane_pallas(cur, src, packed, *, fill_chan, clamp_lo,
                           scale_hint: Tuple[float, float],
                           interpret: bool = False):
    """One plane-grid composite pass via the fused kernel.

    ``cur``/``src``: [H, W] u8 jnp arrays; ``packed``: [UNIFORM_WIDTH] f32;
    ``scale_hint``: host floats (|dy_src/dy_out|, |dx_src/dx_out|) used only
    to pick the static window bucket.
    """
    h_out, w_out = cur.shape
    h_in, w_in = src.shape
    kh = kernel_extent(scale_hint[0], TILE_H, ROW_ALIGN)
    kw = kernel_extent(scale_hint[1], TILE_W, COL_ALIGN)
    # right-pad the source so every aligned window base fits: padded >=
    # align_down(size-1) + k.  Zero padding is exact — clamped coordinates
    # give padded rows/cols zero interpolation weight.
    padded_h = ((h_in - 1) // ROW_ALIGN) * ROW_ALIGN + kh
    padded_w = ((w_in - 1) // COL_ALIGN) * COL_ALIGN + kw
    pad_h = max(0, padded_h - h_in)
    pad_w = max(0, padded_w - w_in)
    if pad_h or pad_w:
        src = jnp.pad(src, ((0, pad_h), (0, pad_w)))
    params = _plane_params(packed, h_out, w_out, h_in, w_in,
                           jnp.float32(fill_chan), jnp.float32(clamp_lo))
    n_i = -(-h_out // TILE_H)
    n_j = -(-w_out // TILE_W)
    base_r = _bases(params[0], params[1], n_i, TILE_H, kh,
                    h_in + pad_h, ROW_ALIGN)
    base_c = _bases(params[2], params[3], n_j, TILE_W, kw,
                    w_in + pad_w, COL_ALIGN)
    # note: _plane_program slices the PADDED array; kh/kw windows always fit
    program = _plane_program(h_out, w_out, h_in, w_in, kh, kw, interpret)
    return program(params, base_r, base_c, src, cur)


def apply_composite_pallas(target_planes, source_planes, packed,
                           fill_rgba, scale_hint, interpret: bool = False):
    """Family-A composite of a planar-yuv source over a planar-yuv target
    (all three planes).  ``fill_rgba``: host-side [4] float fill color;
    ``packed`` may be traced."""
    from .color import RGB2YUV
    fill_yuv = (RGB2YUV[:3, :3] @ np.asarray(fill_rgba[:3], np.float64)
                + RGB2YUV[:3, 3])
    out = []
    for p, (fill_chan, clamp_lo) in enumerate(
            zip(fill_yuv, (0.0, -1.0, -1.0))):
        out.append(composite_plane_pallas(
            target_planes[p], source_planes[p], packed,
            fill_chan=float(fill_chan), clamp_lo=float(clamp_lo),
            scale_hint=scale_hint, interpret=interpret))
    return out


def pallas_available() -> bool:
    try:
        import jax
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
