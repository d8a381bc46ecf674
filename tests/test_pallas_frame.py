"""Whole-frame fused pallas composite: interpreter-mode parity vs the
oracle (compiled parity + perf measured on real TPU; see bench.py and
NOTES_ROUND2.md for the Mosaic lowering quirks the kernel works around)."""

import numpy as np
import pytest

from swiftvideo_tpu.media.pixel import PixelFormat
from swiftvideo_tpu.ops import golden, rect_uniforms
from swiftvideo_tpu.ops.pallas_frame import (composite_frame_pallas,
                                             frame_geometry)


def _planes(h, w, seed):
    r = np.random.default_rng(seed)
    return [r.integers(0, 256, (h, w), np.int64).astype(np.uint8),
            r.integers(0, 256, (h // 2, w // 2), np.int64).astype(np.uint8),
            r.integers(0, 256, (h // 2, w // 2), np.int64).astype(np.uint8)]


def _check(size, srcs):
    ref = golden.composite_stack(PixelFormat.y420p, size, srcs)
    out = composite_frame_pallas(size, srcs, interpret=True)
    assert out is not None
    for o, r in zip(out, ref):
        err = np.abs(np.asarray(o).astype(int) - r.astype(int)).max()
        assert err <= 1, err


def test_frame_quadrants_2to1():
    """4 full-size sources 2:1-downscaled into quadrants (the headline
    benchmark shape, kernels.cl.swift:186-255 family-A blend)."""
    W, H = 768, 512
    srcs = []
    for s in range(4):
        u = rect_uniforms((W, H), (W, H), x=(s % 2) * 384 + 3.3,
                          y=(s // 2) * 256 + 2.7, w=W / 2, h=H / 2,
                          opacity=0.9, fill_color=(0.1, 0.2, 0.3, 0.5)).pack()
        srcs.append((_planes(H, W, s), PixelFormat.y420p, u))
    _check((W, H), srcs)


def test_frame_unity_overlap():
    srcs = [
        (_planes(256, 512, 10), PixelFormat.y420p,
         rect_uniforms((512, 256), (768, 512), x=10.3, y=20.7, w=512,
                       h=256, opacity=0.8,
                       fill_color=(0.3, 0.1, 0.6, 0.4)).pack()),
        (_planes(256, 512, 11), PixelFormat.y420p,
         rect_uniforms((512, 256), (768, 512), x=200.5, y=100.1, w=512,
                       h=256, opacity=0.6).pack()),
    ]
    _check((768, 512), srcs)


def test_frame_fractional_horizontal():
    """Horizontal scale need not be an integer (banded-matmul side)."""
    srcs = [(_planes(256, 768, 20), PixelFormat.y420p,
             rect_uniforms((768, 256), (768, 512), x=50.3, y=30.7,
                           w=512, h=256, opacity=0.9).pack())]
    _check((768, 512), srcs)


def test_frame_rotation_folds_via_xla_run():
    """Rotated sources no longer knock the whole scene off the fast
    path: frame_geometry still rejects them per-run, but the planner
    folds them through the exact device path (SWIFTVIDEO_EXACT_ROTATION
    forces the gather; default is the warp sampler)."""
    import os
    from unittest import mock

    u = np.asarray(rect_uniforms((512, 256), (768, 512), x=10, y=10,
                                 w=256, h=128).pack()).copy()
    u[1] = 0.3  # cross term -> not axis-aligned
    assert frame_geometry([u], (768, 512), (256, 512)) is None
    srcs = [(_planes(256, 512, 30), PixelFormat.y420p, u)]
    with mock.patch.dict(os.environ, {"SWIFTVIDEO_EXACT_ROTATION": "1"}):
        out = composite_frame_pallas((768, 512), srcs, interpret=True)
    assert out is not None
    ref = golden.composite_stack(PixelFormat.y420p, (768, 512), srcs)
    for o, r in zip(out, ref):
        assert np.abs(np.asarray(o).astype(int)
                      - r.astype(int)).max() <= 1


def test_frame_rejects_fractional_vertical():
    u = rect_uniforms((512, 384), (768, 512), x=10, y=10,
                      w=512, h=256).pack()  # ay = 1.5
    assert frame_geometry([np.asarray(golden._packed(u))],
                          (768, 512), (384, 512)) is None


def test_frame_mixed_vertical_scales():
    """Unity background + 2:1-downscaled overlay in one frame (the common
    mixer scene: full-canvas camera + PiP)."""
    W, H = 768, 512
    srcs = [
        (_planes(H, W, 40), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()),
        (_planes(H, W, 41), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=400.3, y=30.7, w=W / 2, h=H / 2,
                       opacity=0.85).pack()),
    ]
    _check((W, H), srcs)


def test_frame_overlay_in_clamped_box():
    """When a full-canvas source forces the shared box to the canvas,
    an overlay's column tiles must still be gated by its position relative
    to the (clamped) box offset — regression for the per-source tile-range
    gate (the overlay vanished when the gate assumed box-local tiles)."""
    W, H = 1280, 720
    srcs = [
        (_planes(H, W, 50), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()),
        (_planes(H, W, 51), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=832.5, y=52.3, w=640, h=360,
                       opacity=0.9).pack()),
    ]
    _check((W, H), srcs)


def test_frame_mixed_source_sizes():
    """Sources of different resolutions run as chained same-shape calls
    (full-res background + half-res overlays, z-order across the seam)."""
    W, H = 768, 512
    srcs = [
        (_planes(H, W, 60), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()),
        (_planes(H // 2, W // 2, 61), PixelFormat.y420p,
         rect_uniforms((W // 2, H // 2), (W, H), x=100.3, y=60.7,
                       w=W // 2, h=H // 2, opacity=0.85).pack()),
        (_planes(H // 2, W // 2, 62), PixelFormat.y420p,
         rect_uniforms((W // 2, H // 2), (W, H), x=300.5, y=150.1,
                       w=W // 4, h=H // 4, opacity=0.7,
                       fill_color=(0.2, 0.4, 0.1, 0.5)).pack()),
    ]
    _check((W, H), srcs)


def _rgba_plane(h, w, seed):
    r = np.random.default_rng(seed)
    return [r.integers(0, 256, (h, w, 4), np.int64).astype(np.uint8)]


def test_frame_rgba_overlay():
    """Family B: rgba graphics/text overlay over a yuv background
    (kernels.cl.swift:336-403 img_rgba_y420p; premultiplied csc,
    spatially-varying alpha, fill without uv mask)."""
    W, H = 768, 512
    srcs = [
        (_planes(H, W, 70), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()),
        (_rgba_plane(128, 256, 71), PixelFormat.RGBA,
         rect_uniforms((256, 128), (W, H), x=100.3, y=60.7, w=256, h=128,
                       opacity=0.9, fill_color=(0.2, 0.1, 0.5, 0.4)).pack()),
    ]
    _check((W, H), srcs)


def test_frame_bgra_overlay():
    W, H = 768, 512
    srcs = [
        (_planes(H, W, 72), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()),
        (_rgba_plane(128, 256, 73), PixelFormat.BGRA,
         rect_uniforms((256, 128), (W, H), x=300.5, y=200.1, w=256,
                       h=128, opacity=0.8).pack()),
    ]
    _check((W, H), srcs)


def test_frame_rgba_rejects_downscale():
    from swiftvideo_tpu.ops.pallas_frame import frame_geometry_rgba
    u = rect_uniforms((512, 256), (768, 512), x=10, y=10,
                      w=256, h=128).pack()  # 2:1 -> chroma step 4
    assert frame_geometry_rgba([np.asarray(golden._packed(u))],
                               (768, 512), (256, 512)) is None


def test_convert_frame_rgba_out():
    """y420p -> RGBA convert+downscale (BASELINE config 1 shape;
    golden._composite_rgba_out blit semantics)."""
    from swiftvideo_tpu.ops.pallas_frame import convert_frame_pallas
    W, H = 640, 360  # out canvas; source 1280x720 at exactly 2:1
    src = _planes(720, 1280, 80)
    u = rect_uniforms((1280, 720), (W, H), x=0, y=0, w=W, h=H,
                      opacity=1.0).pack()
    srcs = [(src, PixelFormat.y420p, u)]
    ref = golden.composite_stack(PixelFormat.RGBA, (W, H), srcs)[0]
    out = convert_frame_pallas((W, H), srcs, PixelFormat.RGBA,
                               interpret=True)
    assert out is not None
    err = np.abs(np.asarray(out).astype(int) - ref.astype(int)).max()
    assert err <= 1, err


def test_convert_frame_bgra_out_with_placement():
    from swiftvideo_tpu.ops.pallas_frame import convert_frame_pallas
    W, H = 640, 360
    src = _planes(512, 768, 81)
    u = rect_uniforms((768, 512), (W, H), x=40.3, y=20.7, w=384, h=256,
                      opacity=0.85, fill_color=(0.3, 0.1, 0.6, 0.4)).pack()
    srcs = [(src, PixelFormat.y420p, u)]
    ref = golden.composite_stack(PixelFormat.BGRA, (W, H), srcs)[0]
    out = convert_frame_pallas((W, H), srcs, PixelFormat.BGRA,
                               interpret=True)
    assert out is not None
    err = np.abs(np.asarray(out).astype(int) - ref.astype(int)).max()
    assert err <= 1, err


def test_convert_frame_rejects_non_2to1():
    from swiftvideo_tpu.ops.pallas_frame import convert_frame_pallas
    src = _planes(512, 768, 82)
    u = rect_uniforms((768, 512), (640, 360), x=0, y=0, w=640, h=360).pack()
    assert convert_frame_pallas((640, 360),
                                [(src, PixelFormat.y420p, u)],
                                PixelFormat.RGBA, interpret=True) is None


def test_frame_3x3_multiview():
    """3x3 multiview wall: nine full-size sources at 3:1 downscale
    (row-group view p=3)."""
    W, H = 768, 480  # 480 divisible by 3 tiles of 160
    srcs = []
    for s in range(9):
        u = rect_uniforms((W, H), (W, H), x=(s % 3) * 256 + 1.3,
                          y=(s // 3) * 160 + 1.7, w=W / 3, h=H / 3,
                          opacity=0.95).pack()
        srcs.append((_planes(H, W, 90 + s), PixelFormat.y420p, u))
    _check((W, H), srcs)


def test_frame_4x4_multiview():
    """4x4 multiview wall at 4:1 downscale (row-group p=4)."""
    W, H = 768, 512
    srcs = []
    for s in range(16):
        u = rect_uniforms((W, H), (W, H), x=(s % 4) * 192 + 0.8,
                          y=(s // 4) * 128 + 0.6, w=W / 4, h=H / 4,
                          opacity=0.9).pack()
        srcs.append((_planes(H, W, 110 + s), PixelFormat.y420p, u))
    _check((W, H), srcs)


def test_frame_mixed_scaled_groups_geometry():
    """Up to three scaled classes in one run are supported since round 3
    (runtime pys switch; {2,3,4} is the full integer class set).  The
    VMEM estimate gates over-budget combinations."""
    from swiftvideo_tpu.ops.pallas_frame import frame_geometry
    W, H = 768, 480
    u2 = rect_uniforms((W, H), (W, H), x=0, y=0, w=W / 2, h=H / 2).pack()
    u3 = rect_uniforms((W, H), (W, H), x=300, y=200, w=W / 3, h=H / 3).pack()
    u4 = rect_uniforms((W, H), (W, H), x=500, y=300, w=W / 4, h=H / 4).pack()
    packed = [np.asarray(golden._packed(u)) for u in (u2, u3)]
    geom = frame_geometry(packed, (W, H), (H, W))
    assert geom is not None and geom["pgrps"] == (2, 3)
    assert geom["hp"] % 2 == 0 and geom["hp"] % 3 == 0
    packed3 = packed + [np.asarray(golden._packed(u4))]
    geom3 = frame_geometry(packed3, (W, H), (H, W))
    assert geom3 is not None and geom3["pgrps"] == (2, 3, 4)
    assert geom3["hp"] % 12 == 0 and geom3["hp"] % 48 == 0


def test_frame_three_scale_classes_one_call(monkeypatch):
    """A 2x+3x+4x scene compiles to ONE pallas call, <=1 LSB parity."""
    from swiftvideo_tpu.ops import pallas_frame as pf
    W, H = 768, 480
    srcs = []
    for i, (we, he, x, y) in enumerate(
            ((W / 2, H / 2, 0, 0), (W / 3, H / 3, 380.2, 250.6),
             (W / 4, H / 4, 180.7, 300.3))):
        srcs.append((_planes(H, W, 90 + i), PixelFormat.y420p,
                     rect_uniforms((W, H), (W, H), x=x, y=y, w=we,
                                   h=he).pack()))
    calls = []
    real = pf._frame_program

    def spy(*a, **k):
        calls.append(a)
        return real(*a, **k)

    monkeypatch.setattr(pf, "_frame_program", spy)
    out = pf.composite_frame_pallas((W, H), srcs, interpret=True)
    assert out is not None and len(calls) == 1
    ref = golden.composite_stack(PixelFormat.y420p, (W, H), srcs)
    for o, r in zip(out, ref):
        assert np.abs(np.asarray(o).astype(int) - r.astype(int)).max() <= 1


def test_frame_mixed_scale_classes_one_call(monkeypatch):
    """A 2x + 3x (+ unity) scene compiles to ONE pallas call with <=1 LSB
    parity (VERDICT r2 #4; was two chained calls with an accumulator
    reload)."""
    from swiftvideo_tpu.ops import pallas_frame as pf
    W, H = 768, 480
    srcs = [
        (_planes(H, W, 60), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()),
        (_planes(H, W, 61), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=20.4, y=10.7, w=W / 2,
                       h=H / 2).pack()),
        (_planes(H, W, 62), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=400.2, y=250.6, w=W / 3,
                       h=H / 3).pack()),
    ]
    calls = []
    real = pf._frame_program

    def spy(*a, **k):
        calls.append(a)
        return real(*a, **k)

    monkeypatch.setattr(pf, "_frame_program", spy)
    out = pf.composite_frame_pallas((W, H), srcs, interpret=True)
    assert out is not None
    assert len(calls) == 1                      # ONE kernel call
    ref = golden.composite_stack(PixelFormat.y420p, (W, H), srcs)
    for o, r in zip(out, ref):
        assert np.abs(np.asarray(o).astype(int) - r.astype(int)).max() <= 1


def test_frame_edge_cases():
    """Kernel edge cases: zero-opacity source, fully off-canvas overlay,
    and an element flush against the bottom-right canvas corner."""
    W, H = 768, 512
    srcs = [
        (_planes(H, W, 120), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()),
        (_planes(H, W, 121), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=100.3, y=50.7, w=W / 2, h=H / 2,
                       opacity=0.0).pack()),             # invisible
        (_planes(H, W, 122), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=2000.0, y=50.0, w=W / 2,
                       h=H / 2, opacity=0.9).pack()),    # off-canvas
        (_planes(H, W, 123), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=W - W / 2 - 0.7,
                       y=H - H / 2 - 0.3, w=W / 2, h=H / 2,
                       opacity=0.8).pack()),             # corner-flush
    ]
    _check((W, H), srcs)


def test_frame_unity_copy():
    """A single full-canvas unity source at opacity 1: the kernel must
    match the oracle within the 1-LSB contract (integer-position f32
    coordinate rounding can flip the lerp branch at f ~ 0)."""
    W, H = 768, 512
    src = _planes(H, W, 130)
    u = rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H,
                      opacity=1.0).pack()
    out = composite_frame_pallas((W, H), [(src, PixelFormat.y420p, u)],
                                 interpret=True)
    ref = golden.composite_stack(PixelFormat.y420p, (W, H),
                                 [(src, PixelFormat.y420p, u)])
    for o, r in zip(out, ref):
        assert np.abs(np.asarray(o).astype(int) - r.astype(int)).max() <= 1


def test_frame_narrow_overlay_single_tile():
    """An overlay narrower than one column tile exercises the jlo==jhi-1
    gating edge."""
    W, H = 1280, 720
    srcs = [
        (_planes(H, W, 140), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()),
        (_planes(114, 200, 141), PixelFormat.y420p,
         rect_uniforms((200, 114), (W, H), x=601.3, y=300.7, w=100, h=57,
                       opacity=0.9).pack()),
    ]
    _check((W, H), srcs)


def test_frame_run_coalescing_non_overlapping():
    """Interleaved camera/label stacks coalesce into two runs when the
    overlays don't overlap each other — and the output still matches the
    oracle's strict z-order blend."""
    W, H = 768, 512
    srcs = []
    for s in range(3):
        x, y = (s % 2) * 384, (s // 2) * 256
        srcs.append((_planes(H, W, 150 + s), PixelFormat.y420p,
                     rect_uniforms((W, H), (W, H), x=x + 0.4, y=y + 0.3,
                                   w=384, h=256).pack()))
        srcs.append((_rgba_plane(32, 128, 160 + s), PixelFormat.RGBA,
                     rect_uniforms((128, 32), (W, H), x=x + 10.3,
                                   y=y + 200.7, w=128, h=32,
                                   opacity=0.8).pack()))
    _check((W, H), srcs)


def test_frame_overlapping_interleave_keeps_order():
    """Overlapping sources must NOT be reordered: a label covering two
    tiles pins the z order (chained per-overlap runs)."""
    W, H = 768, 512
    srcs = [
        (_planes(H, W, 170), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0.4, y=0.3, w=384, h=256).pack()),
        (_rgba_plane(64, 512, 171), PixelFormat.RGBA,
         rect_uniforms((512, 64), (W, H), x=100.3, y=100.7, w=512, h=64,
                       opacity=0.7).pack()),   # spans both tiles
        (_planes(H, W, 172), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=384.4, y=0.3, w=384,
                       h=256).pack()),          # overlaps the label
    ]
    _check((W, H), srcs)


def test_frame_nv12_nv21_target():
    """Biplanar targets: planar kernel + interleave epilogue matches the
    oracle's native nv12/nv21 composite (kernels.cl.swift:47-109)."""
    W, H = 768, 512
    srcs = []
    for s in range(3):
        u = rect_uniforms((W, H), (W, H), x=(s % 2) * 380 + 3.3,
                          y=(s // 2) * 250 + 2.7, w=W / 2, h=H / 2,
                          opacity=0.85, fill_color=(0.1, 0.2, 0.3, 0.5)).pack()
        srcs.append((_planes(H, W, 40 + s), PixelFormat.y420p, u))
    for fmt in (PixelFormat.nv12, PixelFormat.nv21):
        ref = golden.composite_stack(fmt, (W, H), srcs)
        out = composite_frame_pallas((W, H), srcs, interpret=True,
                                     out_fmt=fmt)
        assert out is not None and len(out) == 2
        for o, r in zip(out, ref):
            assert np.asarray(o).shape == np.asarray(r).shape
            err = np.abs(np.asarray(o).astype(int)
                         - np.asarray(r).astype(int)).max()
            assert err <= 1, (fmt, err)


def test_frame_nv12_target_with_rgba_overlay():
    """Chained family-A + family-B runs ending in a biplanar emit."""
    W, H = 512, 256
    cam = (_planes(H, W, 50), PixelFormat.y420p,
           rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack())
    label = (_rgba_plane(64, 128, 51), PixelFormat.RGBA,
             rect_uniforms((128, 64), (W, H), x=40.5, y=30.25,
                           w=128, h=64, opacity=0.9).pack())
    srcs = [cam, label]
    ref = golden.composite_stack(PixelFormat.nv12, (W, H), srcs)
    out = composite_frame_pallas((W, H), srcs, interpret=True,
                                 out_fmt=PixelFormat.nv12)
    assert out is not None and len(out) == 2
    for o, rr in zip(out, ref):
        err = np.abs(np.asarray(o).astype(int)
                     - np.asarray(rr).astype(int)).max()
        assert err <= 1, err


def test_frame_xrun_last_with_biplanar_target():
    """When the final planner run is an XLA/warp fold (rotated source on
    top) and the target is biplanar, the chroma interleave runs as the
    standalone epilogue instead of inside a pallas runner."""
    import os
    from unittest import mock

    W, H = 512, 256
    cam = (_planes(H, W, 80), PixelFormat.y420p,
           rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack())
    rot = np.asarray(rect_uniforms((256, 128), (W, H), x=100.3, y=60.7,
                                   w=256, h=128, opacity=0.9).pack()).copy()
    rot[1] = 0.25   # cross term: not axis-aligned -> X-run
    overlay = (_planes(128, 256, 81), PixelFormat.y420p, rot)
    srcs = [cam, overlay]
    with mock.patch.dict(os.environ, {"SWIFTVIDEO_EXACT_ROTATION": "1"}):
        out = composite_frame_pallas((W, H), srcs, interpret=True,
                                     out_fmt=PixelFormat.nv12)
    assert out is not None and len(out) == 2
    ref = golden.composite_stack(PixelFormat.nv12, (W, H), srcs)
    for o, r in zip(out, ref):
        assert np.asarray(o).shape == np.asarray(r).shape
        assert np.abs(np.asarray(o).astype(int)
                      - np.asarray(r).astype(int)).max() <= 1


def test_frame_runner_vmap_batched_matches_single():
    """K-frame batched dispatch (jax.vmap over the runner, as bench.py's
    batched headline uses) matches per-frame runs with DISTINCT content
    per batch element (catches program_id remapping under batching)."""
    import jax
    import jax.numpy as jnp
    from swiftvideo_tpu.ops.pallas_frame import _runner_A, frame_geometry
    W, H = 256, 128
    n, K = 2, 3
    rng = np.random.default_rng(0)
    unis = [np.asarray(golden._packed(
        rect_uniforms((W, H), (W, H), x=(s % 2) * 128, y=0, w=128, h=64,
                      opacity=0.9))) for s in range(n)]
    geom = frame_geometry(unis, (W, H), (H, W))
    run = _runner_A((W, H), (H, W), n, geom["bh"], geom["bw"], geom["hp"],
                    geom["wp"], geom["hpc"], geom["wpc"], geom["pys"],
                    geom["padt"], geom["pgrps"], geom["has1"], geom["ww"],
                    False, True)
    packed = np.stack([np.asarray(u, np.float32) for u in unis])
    offs = np.asarray(geom["offs"], np.int32)
    jr = np.asarray(geom["jranges"], np.int32)
    ysb = rng.integers(0, 256, (K, n, H, W), np.int64).astype(np.uint8)
    usb = rng.integers(0, 256, (K, n, H // 2, W // 2),
                       np.int64).astype(np.uint8)
    vsb = rng.integers(0, 256, (K, n, H // 2, W // 2),
                       np.int64).astype(np.uint8)
    vrun = jax.jit(jax.vmap(run, in_axes=(None, None, None, 0, 0, 0)))
    outb = vrun(packed, offs, jr, jnp.asarray(ysb), jnp.asarray(usb),
                jnp.asarray(vsb))
    for k in range(K):
        single = run(packed, offs, jr, ysb[k], usb[k], vsb[k])
        for o, s1 in zip(outb, single):
            assert np.array_equal(np.asarray(o[k]), np.asarray(s1))


def test_frame_mixed_class_vmem_decline_splits(monkeypatch):
    """When the multi-class geometry declines (VMEM gate), the planner
    splits into chained single-class pallas runs instead of dropping to
    the XLA fold — parity preserved."""
    from swiftvideo_tpu.ops import pallas_frame as pf
    real_geom = pf.frame_geometry
    calls = []

    def tight_geom(packed, size, in_shape):
        g = real_geom(packed, size, in_shape)
        if g is not None and len(g["pgrps"]) > 1:
            return None                    # simulate over-budget
        return g

    monkeypatch.setattr(pf, "frame_geometry", tight_geom)
    real_prog = pf._frame_program

    def spy(*a, **k):
        calls.append(a)
        return real_prog(*a, **k)

    monkeypatch.setattr(pf, "_frame_program", spy)
    W, H = 768, 480
    srcs = [
        (_planes(H, W, 80), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W / 2, h=H / 2).pack()),
        (_planes(H, W, 81), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=400.2, y=250.6, w=W / 3,
                       h=H / 3).pack()),
    ]
    out = pf.composite_frame_pallas((W, H), srcs, interpret=True)
    assert out is not None
    assert len(calls) == 2                 # chained single-class runs
    ref = golden.composite_stack(PixelFormat.y420p, (W, H), srcs)
    for o, r in zip(out, ref):
        assert np.abs(np.asarray(o).astype(int) - r.astype(int)).max() <= 1


def test_frame_pad_cache_hits_and_parity(monkeypatch):
    """Ingest-pad split (PadCache): identical output to the fused path,
    pad computed once for repeated plane objects, stale entries evicted.
    Production shape: the Repeater re-emits the same PictureSample (same
    plane objects) when a source is slower than the mix rate."""
    import swiftvideo_tpu.ops.pallas_frame as pf

    W, H = 768, 512
    srcs = []
    for s in range(3):
        u = rect_uniforms((W, H), (W, H), x=(s % 2) * 384 + 3.3,
                          y=(s // 2) * 256 + 2.7, w=W / 2, h=H / 2,
                          opacity=0.9, fill_color=(0.1, 0.2, 0.3, 0.5)).pack()
        srcs.append((_planes(H, W, 90 + s), PixelFormat.y420p, u))

    ref = composite_frame_pallas((W, H), srcs, interpret=True)
    pads = []
    real_pad = pf.pad_sources

    def spy_pad(*a, **k):
        pads.append(1)
        return real_pad(*a, **k)

    monkeypatch.setattr(pf, "pad_sources", spy_pad)
    cache = pf.PadCache()

    # tick 1: cold — pads once, matches the fused path exactly
    cache.begin_tick()
    out1 = composite_frame_pallas((W, H), srcs, interpret=True,
                                  pad_cache=cache)
    cache.end_tick()
    assert cache.misses == 1 and cache.hits == 0
    n_pads_cold = len(pads)
    assert n_pads_cold >= 1
    for o, r in zip(out1, ref):
        assert np.array_equal(np.asarray(o), np.asarray(r))

    # tick 2: same plane objects (Repeater hold) — no new pad
    cache.begin_tick()
    out2 = composite_frame_pallas((W, H), srcs, interpret=True,
                                  pad_cache=cache)
    cache.end_tick()
    assert cache.hits == 1
    assert len(pads) == n_pads_cold
    for o, r in zip(out2, ref):
        assert np.array_equal(np.asarray(o), np.asarray(r))

    # tick 3: one source gets a FRESH frame -> re-pad, old entry evicted
    srcs2 = list(srcs)
    srcs2[1] = (_planes(H, W, 99), srcs[1][1], srcs[1][2])
    cache.begin_tick()
    out3 = composite_frame_pallas((W, H), srcs2, interpret=True,
                                  pad_cache=cache)
    cache.end_tick()
    assert len(pads) > n_pads_cold
    assert len(cache._entries) == 1        # stale key evicted
    ref3 = golden.composite_stack(PixelFormat.y420p, (W, H), srcs2)
    for o, r in zip(out3, ref3):
        assert np.abs(np.asarray(o).astype(int) - r.astype(int)).max() <= 1


def test_frame_pad_cache_animated_uniforms_still_hit():
    """Animated transforms (position moves inside the same geometry
    bucket) must NOT invalidate the pad cache: the pad depends only on
    the padded-layout geometry, never on the exact uniforms.  (A
    vertical pan crossing a 16-row geometry step re-pads once at the
    crossing — the designed granularity; x pans never re-pad.)"""
    import swiftvideo_tpu.ops.pallas_frame as pf

    W, H = 768, 512
    planes = _planes(H, W, 70)
    cache = pf.PadCache()
    outs = []
    for step in range(3):
        u = rect_uniforms((W, H), (W, H), x=10.0 + step * 37.7,
                          y=20.0, w=W / 2, h=H / 2,
                          opacity=0.9).pack()
        srcs = [(planes, PixelFormat.y420p, u)]
        cache.begin_tick()
        outs.append(composite_frame_pallas((W, H), srcs, interpret=True,
                                           pad_cache=cache))
        cache.end_tick()
        ref = golden.composite_stack(PixelFormat.y420p, (W, H), srcs)
        for o, r in zip(outs[-1], ref):
            assert np.abs(np.asarray(o).astype(int)
                          - r.astype(int)).max() <= 1
    assert cache.misses == 1 and cache.hits == 2


def test_video_mixer_uses_pad_cache(monkeypatch):
    """The VideoMixer's device path owns a PadCache and repeated samples
    (the two-generation hold / Repeater re-emits) hit it — interpret-mode
    pallas substituted for the TPU kernel."""
    import swiftvideo_tpu.mix.video_mixer as vm
    import swiftvideo_tpu.ops.pallas_frame as pf
    from swiftvideo_tpu.core import EventBox, StepClock, Tx, TimePoint
    from swiftvideo_tpu.media import create_picture_sample
    from swiftvideo_tpu.utils import matrix as m4

    seen = {"caches": []}
    real = pf.composite_frame_pallas

    def fake_pallas(size, sources, interpret=False, out_fmt=None,
                    pad_cache=None):
        seen["caches"].append(pad_cache)
        return real(size, sources, interpret=True, out_fmt=out_fmt,
                    pad_cache=pad_cache)

    monkeypatch.setattr(pf, "composite_frame_pallas", fake_pallas)
    monkeypatch.setattr(vm, "_on_tpu", lambda: True)

    W, H = 256, 128
    frame = TimePoint(1000, 30000)
    clock = StepClock(frame)
    mixer = vm.VideoMixer(clock, workspace_id="w", frame_duration=frame,
                          output_size=(W, H),
                          output_format=PixelFormat.y420p)
    frames = []
    _pipe = mixer >> Tx(lambda s: (frames.append(s), EventBox.just(s))[1])

    src = create_picture_sample((W, H), PixelFormat.y420p, asset_id="cam",
                                workspace_id="w")
    src.planes()[0][:] = 200
    proj = m4.ortho(W, H)
    model = proj @ m4.translation(0, 0, 0) @ m4.scale(W, H)
    src = src.with_(matrix=model, revision="r1")

    for _ in range(3):                 # same object == Repeater hold
        mixer.apply(EventBox.just(src))
        clock.step()
    assert len(frames) == 3
    cache = seen["caches"][-1]
    assert cache is not None and cache.hits >= 2
    assert cache.misses == 1
    y = np.asarray(frames[-1].planes()[0])
    assert abs(int(y[H // 2, W // 2]) - 200) <= 1


def test_frame_pad_cache_rgba_overlay(monkeypatch):
    """Family-B PadCache: a repeated rgba overlay (text/logo — the
    most-repeated source kind) skips its deinterleave+pad; exact parity
    with the fused path across repeated and refreshed ticks."""
    import swiftvideo_tpu.ops.pallas_frame as pf

    W, H = 768, 512
    bg = _planes(H, W, 75)
    overlay = _rgba_plane(128, 256, 76)
    u_bg = rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()
    u_ov = rect_uniforms((256, 128), (W, H), x=100.3, y=60.7, w=256,
                         h=128, opacity=0.9,
                         fill_color=(0.2, 0.1, 0.5, 0.4)).pack()
    srcs = [(bg, PixelFormat.y420p, u_bg),
            (overlay, PixelFormat.RGBA, u_ov)]
    ref = composite_frame_pallas((W, H), srcs, interpret=True)

    pads_b = []
    real_pad_b = pf.pad_sources_rgba

    def spy_pad_b(*a, **k):
        pads_b.append(1)
        return real_pad_b(*a, **k)

    monkeypatch.setattr(pf, "pad_sources_rgba", spy_pad_b)
    cache = pf.PadCache()
    for tick in range(3):
        cache.begin_tick()
        out = composite_frame_pallas((W, H), srcs, interpret=True,
                                     pad_cache=cache)
        cache.end_tick()
        for o, r in zip(out, ref):
            assert np.array_equal(np.asarray(o), np.asarray(r)), tick
    assert len(pads_b) == 1                # rgba padded exactly once
    assert cache.hits == 4 and cache.misses == 2  # A run + B run per tick

    # fresh overlay frame -> re-pad only the B run
    srcs[1] = (_rgba_plane(128, 256, 77), PixelFormat.RGBA, u_ov)
    cache.begin_tick()
    out = composite_frame_pallas((W, H), srcs, interpret=True,
                                 pad_cache=cache)
    cache.end_tick()
    assert len(pads_b) == 2
    ref2 = golden.composite_stack(PixelFormat.y420p, (W, H), srcs)
    for o, r in zip(out, ref2):
        assert np.abs(np.asarray(o).astype(int) - r.astype(int)).max() <= 1


def test_pad_cache_survives_ineligible_tick():
    """One ineligible tick (fused fallback / unsupported format) must not
    wipe a cruising cache — but sustained ineligibility bounds retention."""
    import swiftvideo_tpu.ops.pallas_frame as pf

    cache = pf.PadCache()
    planes = [np.zeros((8, 8), np.uint8)]
    cache.begin_tick()
    cache.put("k", planes, ("arrs",))
    cache.end_tick()
    # ineligible tick: begin/end with no get/put — entry survives
    cache.begin_tick()
    cache.end_tick()
    cache.begin_tick()
    assert cache.get("k", planes) == ("arrs",)
    cache.end_tick()
    # sustained ineligibility (4 untouched ticks) clears everything
    for _ in range(4):
        cache.begin_tick()
        cache.end_tick()
    cache.begin_tick()
    assert cache.get("k", planes) is None
    cache.end_tick()
