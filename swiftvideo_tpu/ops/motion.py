"""Motion estimation: full-search SAD with MV-cost scoring.

Reference semantics: the Metal ``me_fullsearch`` kernel
(kernels.metal:130-267): for each BxB block of the current frame, scan every
candidate position in a clamped search window of the reference frame
(x-major, then y), score = ``deltaCost2(mv) + SAD * 256`` with SAD over
UNORM floats, keep the first strict minimum, clamp the winning MV to
+-searchWindow/2, and emit an RGBA image of normalized vectors
``(mv.x*0.5+0.5, 0.5, mv.y*0.5+0.5, 1.0)`` at block resolution.

TPU-native formulation: one ``lax.scan`` over the global displacement set;
each step computes |cur - shift(ref, d)| over the whole frame and reduces
per block (VPU-friendly dense math, no per-block gather), masking
candidates that fall outside a block's clamped window.  Only full blocks
are processed (grid = floor(H/B) x floor(W/B)).

A numpy oracle (`me_fullsearch_golden`) implements the scalar loop for
parity testing.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import numpy as np

_LAMBDA = 4.0
_QPEX = 4.0


def delta_cost2(mvx, mvy, xp=np):
    """kernels.metal:138-145"""
    def comp(v):
        log2v = xp.log2(xp.abs(v) + 1.0)
        rounding = (v != 0).astype(xp.float32)
        return _LAMBDA * (log2v * 2.0 + 0.718 + rounding) + 0.5
    return _QPEX * (comp(mvx) + comp(mvy))


def _search_bounds(o: int, block: int, search: int, size: int) -> Tuple[int, int]:
    """Candidate t range [lo, hi) for a block at origin ``o``
    (kernels.metal searchExtent + scan conditions)."""
    left = min(max(o + block // 2 - search // 2, 0), size)
    right = min(max(left + search, 0), size)
    return left, right - block  # t in [left, right - block)


def me_fullsearch_golden(cur: np.ndarray, ref: np.ndarray, block: int = 16,
                         search: int = 64) -> np.ndarray:
    """Scalar-loop oracle.  cur/ref: [H, W] u8 luma.  Returns [Hb, Wb, 4] u8."""
    h, w = cur.shape
    hb, wb = h // block, w // block
    curf = cur.astype(np.float32) / 255.0
    reff = ref.astype(np.float32) / 255.0
    out = np.zeros((hb, wb, 4), np.uint8)
    max_mv = search // 2
    for by in range(hb):
        for bx in range(wb):
            oy, ox = by * block, bx * block
            xlo, xhi = _search_bounds(ox, block, search, w)
            ylo, yhi = _search_bounds(oy, block, search, h)
            best = (math.inf, 0.0, 0.0)
            cb = curf[oy:oy + block, ox:ox + block]
            for tx in range(xlo, xhi):
                for ty in range(ylo, yhi):
                    sad = float(np.abs(cb - reff[ty:ty + block,
                                                 tx:tx + block]).sum())
                    mvx, mvy = float(ox - tx), float(oy - ty)
                    score = float(delta_cost2(np.float32(mvx),
                                              np.float32(mvy))) + sad * 256.0
                    if score < best[0]:
                        best = (score, mvx, mvy)
            mvx = min(max(best[1], -max_mv), max_mv) / max_mv * 0.5 + 0.5
            mvy = min(max(best[2], -max_mv), max_mv) / max_mv * 0.5 + 0.5
            out[by, bx] = np.clip(np.rint(np.array(
                [mvx, 0.5, mvy, 1.0]) * 255.0), 0, 255).astype(np.uint8)
    return out


@lru_cache(maxsize=16)
def _me_program(h: int, w: int, block: int, search: int):
    import jax
    import jax.numpy as jnp

    hb, wb = h // block, w // block
    # global displacement range d = t - o (see _search_bounds):
    # lo = block/2 - search/2 (interior), hi = search - block - 1 (edge)
    d_lo = block // 2 - search // 2
    d_hi = search - block - 1
    drange = np.arange(d_lo, d_hi + 1, dtype=np.int32)
    # candidate list in reference scan order: x outer, y inner
    cand = np.array([(dx, dy) for dx in drange for dy in drange], np.int32)

    # per-block clamped candidate bounds
    ox = np.arange(wb, dtype=np.int32) * block
    oy = np.arange(hb, dtype=np.int32) * block

    def bounds(o, size):
        left = np.clip(o + block // 2 - search // 2, 0, size)
        right = np.clip(left + search, 0, size)
        return left, right - block

    xlo, xhi = bounds(ox, w)   # [wb]
    ylo, yhi = bounds(oy, h)   # [hb]

    def run(cur_u8, ref_u8):
        cur = cur_u8.astype(jnp.float32) / 255.0
        ref = ref_u8.astype(jnp.float32) / 255.0
        pad = search
        refp = jnp.pad(ref, ((pad, pad), (pad, pad)))

        def step(carry, d):
            best_score, best_dx, best_dy = carry
            dx, dy = d[0], d[1]
            shifted = jax.lax.dynamic_slice(refp, (pad + dy, pad + dx), (h, w))
            diff = jnp.abs(cur - shifted)
            sad = diff.reshape(hb, block, wb, block).sum(axis=(1, 3))
            # candidate t = o + d must lie in [lo, hi) per block axis
            vx = (ox + dx >= xlo) & (ox + dx < xhi)          # [wb]
            vy = (oy + dy >= ylo) & (oy + dy < yhi)          # [hb]
            valid = vy[:, None] & vx[None, :]
            mvx, mvy = (-dx).astype(jnp.float32), (-dy).astype(jnp.float32)
            score = delta_cost2(mvx, mvy, jnp) + sad * 256.0
            score = jnp.where(valid, score, jnp.inf)
            better = score < best_score
            return (jnp.where(better, score, best_score),
                    jnp.where(better, mvx, best_dx),
                    jnp.where(better, mvy, best_dy)), None

        init = (jnp.full((hb, wb), jnp.inf, jnp.float32),
                jnp.zeros((hb, wb), jnp.float32),
                jnp.zeros((hb, wb), jnp.float32))
        (score, mvx, mvy), _ = jax.lax.scan(step, init, jnp.asarray(cand))
        max_mv = search // 2
        nx = jnp.clip(mvx, -max_mv, max_mv) / max_mv * 0.5 + 0.5
        ny = jnp.clip(mvy, -max_mv, max_mv) / max_mv * 0.5 + 0.5
        rgba = jnp.stack([nx, jnp.full_like(nx, 0.5), ny,
                          jnp.ones_like(nx)], axis=-1)
        return jnp.clip(jnp.rint(rgba * 255.0), 0, 255).astype(jnp.uint8)

    return jax.jit(run)


def me_fullsearch_device(cur, ref, block: int = 16, search: int = 64):
    """Device full-search: cur/ref [H, W] u8 -> [H//B, W//B, 4] u8 MVs."""
    import jax.numpy as jnp
    cur = jnp.asarray(cur)
    h, w = cur.shape
    return _me_program(h, w, block, search)(cur, jnp.asarray(ref))
