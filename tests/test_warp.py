"""Rotation fast path: three-pass shear warp (ops/warp.py).

Tolerance contract (documented in the warp module): the cascade's
geometry is exact, the filter is three chained 1-D lerps instead of one
2-D bilinear tap.  On smooth/natural content the difference stays within
~1 LSB (p99 < 0.5); on per-pixel iid noise it is large by construction —
these tests pin the smooth-content contract and the exactness of the
cardinal angles, masks, and the device/numpy agreement.
"""

import numpy as np
import pytest

from swiftvideo_tpu.media import PixelFormat
from swiftvideo_tpu.ops import composite, golden, rect_uniforms
from swiftvideo_tpu.ops.warp import (affine_from_packed, plan_warp,
                                     warp_sample_device)


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(127 + 80 * np.sin(xx / 17.0 + seed)
                   * np.cos(yy / 23.0) + 0.1 * xx, 0, 255).astype(np.uint8)


def _uni(deg, wi=320, hi=240, W=512, H=384, **kw):
    return rect_uniforms((wi, hi), (W, H), x=90.3, y=60.7, w=300, h=220,
                         rotation=np.deg2rad(deg), **kw)


def test_affine_extraction_matches_masks():
    """affine_from_packed reproduces golden._masks' uv grid exactly."""
    u = _uni(33).pack()
    H, W, hi, wi = 384, 512, 240, 320
    A, B, C, D, E, F = affine_from_packed(u, H, W, hi, wi)
    _, _, _, uvx, uvy = golden._masks(np.asarray(u, np.float32), H, W)
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    x = A * jj + B * ii + C
    y = D * jj + E * ii + F
    assert np.abs(x - (uvx * wi - 0.5)).max() < 1e-3
    assert np.abs(y - (uvy * hi - 0.5)).max() < 1e-3


@pytest.mark.parametrize("deg", [0, 90, 180, 270])
def test_warp_cardinal_angles_exact(deg):
    u = _uni(deg).pack()
    plan = plan_warp(u, 384, 512, 240, 320)
    src = _smooth(240, 320)
    _, _, m_uv, uvx, uvy = golden._masks(np.asarray(u, np.float32), 384, 512)
    ref = golden.bilinear_norm(src.astype(np.float32), uvx, uvy)
    out = plan.sample(src, np)
    assert np.abs(ref - out)[m_uv].max() < 0.02


@pytest.mark.parametrize("deg", [7, 20, 45, 62, 80, 130, 201])
def test_warp_smooth_tolerance(deg):
    u = _uni(deg).pack()
    plan = plan_warp(u, 384, 512, 240, 320)
    src = _smooth(240, 320)
    m_b, m_tx, m_uv, uvx, uvy = golden._masks(np.asarray(u, np.float32),
                                              384, 512)
    ref = golden.bilinear_norm(src.astype(np.float32), uvx, uvy)
    out = plan.sample(src, np)
    err = np.abs(ref - out)[m_uv & m_tx & m_b]
    assert err.max() <= 2.0, err.max()
    assert np.percentile(err, 99) <= 0.5


@pytest.mark.parametrize("deg", [20, 45, 130])
def test_warp_device_matches_numpy(deg):
    u = _uni(deg).pack()
    plan = plan_warp(u, 384, 512, 240, 320)
    src = _smooth(240, 320)
    cpu = plan.sample(src, np)
    dev = np.asarray(warp_sample_device(plan, src))
    assert np.abs(cpu - dev).max() < 1e-3


def test_warp_program_is_angle_stable():
    """Animated rotations must not recompile: same bucketed program for
    every angle in a pass-orientation band."""
    from swiftvideo_tpu.ops import warp as wmod
    before = wmod._warp_program.cache_info().currsize
    for deg in (11, 17, 29, 41):
        plan = plan_warp(_uni(deg).pack(), 384, 512, 240, 320)
        warp_sample_device(plan, _smooth(240, 320))
    added = wmod._warp_program.cache_info().currsize - before
    assert added <= 1


def _stack_err(out_fmt, srcs, size=(512, 384)):
    ref = golden.composite_stack(out_fmt, size, srcs)
    dev = composite.composite_stack_warp(out_fmt, size, srcs)
    errs = []
    for r, d in zip(ref, dev):
        errs.append(np.abs(np.asarray(d).astype(int) - r.astype(int)))
    return errs


def test_composite_stack_warp_rotated_yuv():
    """Rotated y420p element over a full-screen camera: masks stay exact
    (background pixels identical), interior within the smooth-content
    tolerance."""
    W, H = 512, 384
    cam = ([_smooth(H, W, 1), _smooth(H // 2, W // 2, 2),
            _smooth(H // 2, W // 2, 3)], PixelFormat.y420p,
           rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H))
    rot = ([_smooth(240, 320, 4), _smooth(120, 160, 5),
            _smooth(120, 160, 6)], PixelFormat.y420p,
           _uni(25, 320, 240, W, H, opacity=0.9))
    errs = _stack_err(PixelFormat.y420p, [cam, rot])
    for e in errs:
        assert np.percentile(e, 90) <= 1
        assert e.max() <= 24          # isolated mask-edge pixels only
        assert (e > 4).mean() < 0.01


def test_composite_stack_warp_rotated_rgba_overlay():
    W, H = 512, 384
    rng = np.random.default_rng(7)
    base = _smooth(128, 256, 8)
    rgba = np.stack([base, base[::-1], base, np.full_like(base, 230)],
                    axis=-1).astype(np.uint8)
    label = ([rgba], PixelFormat.RGBA,
             rect_uniforms((256, 128), (W, H), x=120.4, y=90.2, w=256,
                           h=128, rotation=0.35, opacity=0.85))
    errs = _stack_err(PixelFormat.y420p, [label])
    for e in errs:
        assert np.percentile(e, 90) <= 1
        assert (e > 4).mean() < 0.01


def test_composite_stack_warp_falls_back_cleanly():
    """Axis-aligned stacks keep the exact separable path through the same
    entry point (bit-exact vs oracle)."""
    W, H = 256, 192
    srcs = [([_smooth(96, 128, s), _smooth(48, 64, s + 1),
              _smooth(48, 64, s + 2)], PixelFormat.y420p,
             rect_uniforms((128, 96), (W, H), x=10.3 + 30 * s, y=8.7,
                           w=100, h=80, opacity=0.9)) for s in range(2)]
    ref = golden.composite_stack(PixelFormat.y420p, (W, H), srcs)
    dev = composite.composite_stack_boxed(PixelFormat.y420p, (W, H), srcs)
    for r, d in zip(ref, dev):
        assert np.abs(np.asarray(d).astype(int) - r.astype(int)).max() <= 1


def test_composite_stack_warp_rotated_nv12_input():
    """Biplanar (nv12/nv21) INPUT through the warp sampler: the chroma
    channels come from the interleaved plane (nv21 swapped)."""
    W, H = 512, 384
    for fmt in (PixelFormat.nv12, PixelFormat.nv21):
        cb = _smooth(120, 160, 10)
        cr = _smooth(120, 160, 11)
        a, b = (cb, cr) if fmt == PixelFormat.nv12 else (cr, cb)
        uv = np.stack([a, b], axis=-1)
        planes = [_smooth(240, 320, 9), uv]
        rot = (planes, fmt, _uni(25, 320, 240, W, H, opacity=0.9))
        errs = _stack_err(PixelFormat.y420p, [rot], (W, H))
        for e in errs:
            assert np.percentile(e, 90) <= 1, fmt
            assert (e > 4).mean() < 0.01, fmt


def test_warp_small_element_exact_policy(monkeypatch):
    """Per-element policy (round 3): a small rotated overlay (area <=
    WARP_EXACT_BUDGET_PX) samples via the EXACT gather path inside the
    warp fold — bit-exact vs the oracle, no warp program invoked."""
    W, H = 256, 192
    warp_calls = []
    real = composite.apply_composite_warp
    monkeypatch.setattr(composite, "apply_composite_warp",
                        lambda *a, **k: (warp_calls.append(1), real(*a, **k))[1])
    small = ([_smooth(64, 64, 3), _smooth(32, 32, 4), _smooth(32, 32, 5)],
             PixelFormat.y420p,
             rect_uniforms((64, 64), (W, H), x=40.3, y=30.7, w=80, h=80,
                           rotation=np.deg2rad(30), opacity=0.9))
    ref = golden.composite_stack(PixelFormat.y420p, (W, H), [small])
    dev = composite.composite_stack_warp(PixelFormat.y420p, (W, H), [small])
    assert not warp_calls, "small rotated element should go exact"
    for r, d in zip(ref, dev):
        assert np.abs(np.asarray(d).astype(int) - r.astype(int)).max() <= 1
    # a large rotated surface still takes the warp
    big = ([_smooth(240, 320, 6), _smooth(120, 160, 7),
            _smooth(120, 160, 8)], PixelFormat.y420p,
           _uni(30, 320, 240, W, H, opacity=0.9))
    composite.composite_stack_warp(PixelFormat.y420p, (W, H), [big])
    assert warp_calls
