"""Bilinear scale/convert as banded matmuls — the MXU is the sampler.

``out = V @ X @ H`` where ``V`` [oh, ih] and ``H`` [iw, ow] are
host-precomputed hat-function (two-tap bilinear) matrices and ``X`` is the
source plane.  This expresses ANY rational or irrational axis-aligned
scale — including the transcode ladder's 2:3 / 4:9 verticals and the
64-stream wall's 1080->136 (135:17) tiles — as two dense MXU matmuls with
no gathers, no dynamic slices, and no Pallas lowering hazards.  It runs
identically on CPU (tests, multichip dryrun) and TPU.

Precision: matmuls run at ``jax.lax.Precision.HIGH`` (three-pass bf16 on
the MXU, ~2^-21 relative error).  The hat matrices have exactly two
nonzero taps per output row/col that sum to 1, so absolute error vs the
f32 oracle is <= 255 * 2^-20 — far inside the <=1 LSB contract
(tests/test_matscale.py asserts it against golden.apply_composite).

Semantics parity: taps are clamp-to-edge exactly like
``golden.bilinear_norm`` (kernels.cuda.swift:66-114 is the reference's
manual-sampling twin); geometry comes from the same ``_plane_params``
algebra as the Pallas frame kernel, so a plan built from composite
uniforms samples pixel-identically to the oracle's separable path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import golden


def _plane_ab(packed: np.ndarray, h_out: int, w_out: int,
              h_in: int, w_in: int) -> Tuple[float, float, float, float]:
    """(ay, by, ax, bx): src_y = ay*r + by, src_x = ax*c + bx — identical
    f32 arithmetic to pallas_frame._plane_params_np (parity-critical)."""
    from .pallas_frame import _plane_params_np
    p = _plane_params_np(np.asarray(packed, np.float32), h_out, w_out,
                         h_in, w_in)
    return float(p[0]), float(p[1]), float(p[2]), float(p[3])


def hat_matrix(n_out: int, n_in: int, a: float, b: float,
               transpose: bool = False) -> np.ndarray:
    """Two-tap bilinear sampling matrix with clamp-to-edge taps.

    Row r carries weight (1-f) at floor(x) and f at floor(x)+1 for
    x = clip(a*r + b, 0, n_in-1); when x clamps, the single surviving tap
    carries the full weight — exactly ``golden.bilinear_norm``'s
    xi0/xi1 = clip(floor(x)(+1)) semantics.
    """
    r = np.arange(n_out, dtype=np.float64)
    x = np.float32(a) * r.astype(np.float32) + np.float32(b)
    x = np.clip(x, 0.0, np.float32(n_in - 1))
    k0 = np.floor(x).astype(np.int64)
    f = (x - k0).astype(np.float32)
    k1 = np.minimum(k0 + 1, n_in - 1)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), k0] += (1.0 - f)
    m[np.arange(n_out), k1] += f
    return m.T if transpose else m


class ScalePlan(NamedTuple):
    """Host-precomputed sampling matrices for one y420p->y420p geometry."""
    vy: np.ndarray   # [oh, ih]
    hy: np.ndarray   # [iw, ow]
    vc: np.ndarray   # [oh/2, ih/2]
    hc: np.ndarray   # [iw/2, ow/2]
    out_size: Tuple[int, int]


def plan_scale(uniform, out_size: Tuple[int, int],
               in_shape: Tuple[int, int]) -> Optional[ScalePlan]:
    """Build a ScalePlan from composite uniforms, or None if the mapping
    is not a pure full-coverage scale (caller falls back to the general
    composite path).

    Eligible: axis-aligned, opacity == 1, the element's border and
    texture cover the whole output canvas (identity_uniforms-style
    mappings: the ladder rungs and wall cells).
    """
    w, h = out_size
    h_in, w_in = in_shape
    p = np.asarray(golden._packed(uniform), np.float64)
    if not golden.is_axis_aligned(p):
        return None
    if abs(float(p[22]) - 1.0) > 1e-9:        # opacity
        return None
    from .pallas_frame import _plane_params_np
    pl_ = _plane_params_np(np.asarray(p, np.float32), h, w, h_in, w_in)
    ay, by, ax, bx = (float(pl_[0]), float(pl_[1]),
                      float(pl_[2]), float(pl_[3]))
    if ay <= 0 or ax <= 0:
        return None
    # border + texture must cover every output pixel (corners suffice —
    # the maps are affine)
    for (aa, bb, n) in ((pl_[4], pl_[5], h), (pl_[6], pl_[7], w),
                        (pl_[8], pl_[9], h), (pl_[10], pl_[11], w)):
        lo = float(aa) * 0.0 + float(bb)
        hi = float(aa) * (n - 1) + float(bb)
        if not (min(lo, hi) >= -1e-6 and max(lo, hi) <= 1.0 + 1e-6):
            return None
    if h % 2 or w % 2 or h_in % 2 or w_in % 2:
        return None
    pc = _plane_params_np(np.asarray(p, np.float32), h // 2, w // 2,
                          h_in // 2, w_in // 2)
    ayc, byc, axc, bxc = (float(pc[0]), float(pc[1]),
                          float(pc[2]), float(pc[3]))
    return ScalePlan(
        vy=hat_matrix(h, h_in, ay, by),
        hy=hat_matrix(w, w_in, ax, bx, transpose=True),
        vc=hat_matrix(h // 2, h_in // 2, ayc, byc),
        hc=hat_matrix(w // 2, w_in // 2, axc, bxc, transpose=True),
        out_size=out_size,
    )


_HIGH = jax.lax.Precision.HIGH


def _scale_plane(x, v, hmat):
    t = jnp.dot(v, x.astype(jnp.float32), precision=_HIGH)
    s = jnp.dot(t, hmat, precision=_HIGH)
    return jnp.clip(jnp.rint(s), 0.0, 255.0).astype(jnp.uint8)


def scale_y420p(planes: Sequence, plan: ScalePlan):
    """Scale one y420p frame (y, cb, cr) -> plan.out_size.  Jittable; pass
    device arrays for the planes and keep the plan static (hat matrices
    become jit constants)."""
    y, cb, cr = planes
    return (_scale_plane(y, jnp.asarray(plan.vy), jnp.asarray(plan.hy)),
            _scale_plane(cb, jnp.asarray(plan.vc), jnp.asarray(plan.hc)),
            _scale_plane(cr, jnp.asarray(plan.vc), jnp.asarray(plan.hc)))


def scale_y420p_batch(ys, us, vs, plan: ScalePlan):
    """[N, H, W] (+half-res chroma) -> batched scaled planes.  The batch
    axis rides the MXU's batch dimension; shard it over a mesh for the
    mixing wall (parallel/wall.py)."""
    f = jax.vmap(lambda y, u, v: scale_y420p((y, u, v), plan))
    return f(ys, us, vs)
