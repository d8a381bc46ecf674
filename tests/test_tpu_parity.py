"""Opportunistic TPU parity sweep: every Pallas/device kernel family x
geometry bucket against the golden oracle, on real hardware.

Skipped in the normal CPU test run (conftest pins the platform to cpu).
Run on a chip with::

    SWIFTVIDEO_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py -v

This proves the <=1 LSB device contract across the kernel matrix rather
than only on the bench configs (round-1 verdict, "TPU parity evidence is
bench-time only").  Compiled-vs-interpret divergence (Mosaic lowering
bugs) is exactly what this file exists to catch; the CPU suite already
covers kernel logic in interpret mode.
"""

import json
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="TPU parity sweep runs on hardware only "
           "(SWIFTVIDEO_TPU_TESTS=1 + a real chip)")

from swiftvideo_tpu.media import PixelFormat, allocate_planes  # noqa: E402
from swiftvideo_tpu.ops import golden, identity_uniforms, rect_uniforms  # noqa: E402


def _planes(fmt, size, seed):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, p.shape, np.int64).astype(np.uint8)
            for p in allocate_planes(fmt, size)]


def _record_parity(what, max_err, tol):
    """Append a per-case record (SWIFTVIDEO_PARITY_LOG=path.jsonl) so a
    sweep run leaves a committed artifact, not just a green exit code."""
    path = os.environ.get("SWIFTVIDEO_PARITY_LOG")
    if path:
        with open(path, "a") as fh:
            fh.write(json.dumps({"case": what, "max_err": int(max_err),
                                 "tol": int(tol)}) + "\n")


def _assert_parity(out, ref, what, tol=1):
    worst = 0
    for i, (o, r) in enumerate(zip(out, ref)):
        o = np.asarray(o)
        r = np.asarray(r)
        assert o.shape == r.shape, (what, i, o.shape, r.shape)
        err = np.abs(o.astype(int) - r.astype(int))
        worst = max(worst, int(err.max()))
        assert err.max() <= tol, (what, i, err.max(),
                                  int((err > tol).sum()))
    _record_parity(what, worst, tol)


def _assert_exact(out, ref, what):
    out = np.asarray(out)
    ref = np.asarray(ref)
    err = int(np.abs(out.astype(np.int64) - ref.astype(np.int64)).max()) \
        if out.shape == ref.shape else 255
    _record_parity(what, err, 0)
    assert np.array_equal(ref, out), (what, err)


# --- fused frame composite (ops/pallas_frame.py) --------------------------

def _frame_case(out_fmt, size, srcs, what):
    from swiftvideo_tpu.ops.pallas_frame import composite_frame_pallas
    ref = golden.composite_stack(out_fmt, size, srcs)
    out = composite_frame_pallas(size, srcs, out_fmt=out_fmt)
    assert out is not None, (what, "fell back off the pallas path")
    _assert_parity(out, ref, what)


@pytest.mark.parametrize("out_fmt", [PixelFormat.y420p, PixelFormat.nv12,
                                     PixelFormat.nv21])
def test_frame_4source_1080p(out_fmt):
    W, H = 1920, 1080
    srcs = []
    for s in range(4):
        u = rect_uniforms((W, H), (W, H), x=(s % 2) * 950 + 3.3,
                          y=(s // 2) * 530 + 2.7, w=W / 2, h=H / 2,
                          opacity=0.9, fill_color=(0.1, 0.2, 0.3, 0.5))
        srcs.append((_planes(PixelFormat.y420p, (W, H), 40 + s),
                     PixelFormat.y420p, u.pack()))
    _frame_case(out_fmt, (W, H), srcs, f"frame-4src-{out_fmt.value}")


@pytest.mark.parametrize("grid", [2, 3, 4])
def test_frame_multiview_vertical_scales(grid):
    """p-in-{2,3,4} row-group vertical scales (multiview walls).

    Tiles sit at quarter-pixel offsets: exact-integer seams are genuine
    knife edges (the uniforms' matrix inversion puts the border at
    1440.0001, below f32 resolution of the mask affines), where oracle
    and kernel may legitimately assign the seam column to either
    adjacent source — covered by the seam test below instead."""
    W, H = 1920, 1080
    tw, th = W // grid, (H // grid) // 2 * 2
    srcs = []
    for s in range(grid * grid):
        u = rect_uniforms((W, H), (W, H), x=(s % grid) * tw + 0.25,
                          y=(s // grid) * th + 0.25, w=tw, h=th)
        srcs.append((_planes(PixelFormat.y420p, (W, H), 60 + s),
                     PixelFormat.y420p, u.pack()))
    _frame_case(PixelFormat.y420p, (W, H), srcs, f"frame-wall-{grid}x")


def test_frame_wall_exact_seams_all_written():
    """Exact-integer tile grid: seam columns/rows are sub-f32 knife edges
    whose owner may differ from the oracle, but every pixel must be
    WRITTEN by one of the adjacent tiles (round-1 compiled bug: FMA
    rounding dropped seam columns on both sides), and off-seam pixels
    must hold exact parity."""
    from swiftvideo_tpu.ops.pallas_frame import composite_frame_pallas
    W, H = 1920, 1080
    grid = 4
    tw, th = W // grid, (H // grid) // 2 * 2
    srcs = []
    for s in range(grid * grid):
        u = rect_uniforms((W, H), (W, H), x=(s % grid) * tw,
                          y=(s // grid) * th, w=tw, h=th)
        planes = _planes(PixelFormat.y420p, (W, H), 90 + s)
        planes[0][:] = np.maximum(planes[0], 16)   # luma 0 == unwritten
        srcs.append((planes, PixelFormat.y420p, u.pack()))
    ref = golden.composite_stack(PixelFormat.y420p, (W, H), srcs)
    out = composite_frame_pallas((W, H), srcs)
    assert out is not None
    seam_c = {c * tw for c in range(1, grid)}
    seam_r = {r * th for r in range(1, grid)}
    y = np.asarray(out[0]).astype(int)
    assert (y < 4).sum() == 0, "unwritten pixels"
    err = np.abs(y - np.asarray(ref[0]).astype(int))
    bad = np.argwhere(err > 1)
    off_seam = [b for b in bad if b[1] not in seam_c and b[0] not in seam_r]
    assert not off_seam, (len(off_seam), off_seam[:5])


def test_frame_mixed_sizes_and_rgba_overlay():
    W, H = 1280, 720
    cam = (_planes(PixelFormat.y420p, (W, H), 70), PixelFormat.y420p,
           rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack())
    pip = (_planes(PixelFormat.y420p, (640, 360), 71), PixelFormat.y420p,
           rect_uniforms((640, 360), (W, H), x=40.5, y=30.25, w=320,
                         h=180, opacity=0.95).pack())
    rng = np.random.default_rng(72)
    label = ([rng.integers(0, 256, (64, 256, 4), np.int64).astype(np.uint8)],
             PixelFormat.RGBA,
             rect_uniforms((256, 64), (W, H), x=900.7, y=600.4, w=256,
                           h=64, opacity=0.9).pack())
    _frame_case(PixelFormat.y420p, (W, H), [cam, pip, label],
                "frame-mixed+rgba")


def test_frame_rgba_target_convert():
    from swiftvideo_tpu.ops.pallas_frame import convert_frame_pallas
    W, H = 1280, 720
    src = _planes(PixelFormat.y420p, (W, H), 75)
    u = rect_uniforms((W, H), (640, 360), x=0, y=0, w=640, h=360).pack()
    srcs = [(src, PixelFormat.y420p, u)]
    ref = golden.composite_stack(PixelFormat.RGBA, (640, 360), srcs)
    out = convert_frame_pallas((640, 360), srcs, PixelFormat.RGBA)
    assert out is not None
    _assert_parity([out], ref, "frame-rgba-out")


# --- matmul scaling (ops/matscale.py) -------------------------------------

@pytest.mark.parametrize("rung", [(1280, 720), (854, 480), (640, 360)])
def test_matscale_ladder_rungs(rung):
    from swiftvideo_tpu.ops.matscale import plan_scale, scale_y420p
    W, H = 1920, 1080
    rw = rung[0] // 2 * 2
    rh = rung[1] // 2 * 2
    src = _planes(PixelFormat.y420p, (W, H), 80)
    uni = identity_uniforms((W, H), (rw, rh))
    ref = golden.composite_stack(PixelFormat.y420p, (rw, rh),
                                 [(src, PixelFormat.y420p, uni)])
    plan = plan_scale(uni, (rw, rh), (H, W))
    assert plan is not None
    out = scale_y420p(src, plan)
    _assert_parity(out, ref, f"matscale-{rw}x{rh}")


# --- motion estimation (ops/motion.py) ------------------------------------

def test_motion_pallas_compiled_matches_oracle():
    from swiftvideo_tpu.ops import motion
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 255, (256, 256), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    gold = motion.me_fullsearch_golden(cur, ref, 16, 64)
    out = motion.me_fullsearch_pallas(cur, ref, 16, 64)
    assert out is not None
    _assert_exact(np.asarray(out), gold, "motion-sad-pallas-256")


def test_motion_ssd_dense_pallas_compiled_matches_oracle():
    """Compiled dense single-kernel SSD search vs the scalar oracle —
    catches compiled-only Mosaic divergence (pltpu.repeat's tile
    semantics was the first catch: interpret mode passed while the
    compiled im2col built wrong rows)."""
    from swiftvideo_tpu.ops import motion
    rng = np.random.default_rng(15)
    ref = rng.integers(0, 255, (256, 256), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    gold = motion.me_ssd_golden(cur, ref, 16, 64)
    out = motion.me_fullsearch_ssd_pallas(cur, ref, 16, 64)
    _assert_exact(np.asarray(out), gold, "motion-ssd-dense-pallas-256")


# --- device audio mix (ops/audio.py) --------------------------------------

def test_audio_mix_device_matches_host():
    from swiftvideo_tpu.ops import audio as aud
    rng = np.random.default_rng(6)
    srcs = rng.integers(-30000, 30000, (4, 960 * 2), np.int64).astype(np.int16)
    gains = np.asarray([[0.8, 0.8], [1.0, 1.0], [0.25, 0.5], [0.6, 0.1]],
                       np.float32)
    expect = np.zeros(960 * 2, np.int16)
    for s, g in zip(srcs, gains):
        aud.apply_mix_s16(s, list(g), expect)   # in-place saturating fold
    out = np.asarray(aud.mix_s16_device(srcs, gains))
    _assert_parity([out], [expect], "audio-mix-device", tol=1)


# --- rotation warp (ops/warp.py) ------------------------------------------

def test_warp_device_matches_numpy_on_hardware():
    """Compiled warp cascade vs the numpy plan on the same geometry —
    catches compiled-only divergence (rolls, hat matmuls, on-device
    table construction)."""
    from swiftvideo_tpu.ops.warp import plan_warp, warp_sample_device
    yy, xx = np.mgrid[0:540, 0:960]
    src = np.clip(127 + 80 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                  + 0.05 * xx, 0, 255).astype(np.uint8)
    for deg in (0.3, 1.1):
        u = rect_uniforms((960, 540), (1920, 1080), x=300.4, y=200.7,
                          w=900, h=500, rotation=deg).pack()
        plan = plan_warp(u, 1080, 1920, 540, 960)
        assert plan is not None
        cpu = plan.sample(src, np)
        dev = np.asarray(warp_sample_device(plan, src))
        werr = float(np.abs(cpu - dev).max())
        _record_parity(f"warp-cascade-{deg}deg(milli)", round(werr * 1000),
                       50)
        assert werr < 0.05


def test_warp_composite_stack_on_hardware():
    """Rotated y420p element through the full warp-blend program on the
    chip: background (masked) pixels match the oracle exactly; interior
    carries the documented smooth-content tolerance."""
    from swiftvideo_tpu.ops import composite
    yy, xx = np.mgrid[0:360, 0:640]
    sm = np.clip(127 + 80 * np.sin(xx / 13.0) * np.cos(yy / 19.0),
                 0, 255).astype(np.uint8)
    planes = [sm, sm[::2, ::2].copy(), sm[1::2, ::2].copy()]
    rot = (planes, PixelFormat.y420p,
           rect_uniforms((640, 360), (1280, 720), x=200.4, y=100.7,
                         w=600, h=340, rotation=0.35, opacity=0.9))
    ref = golden.composite_stack(PixelFormat.y420p, (1280, 720), [rot])
    out = composite.composite_stack_warp(PixelFormat.y420p, (1280, 720),
                                         [rot])
    for o, r in zip(out, ref):
        e = np.abs(np.asarray(o).astype(int) - np.asarray(r).astype(int))
        assert np.percentile(e, 90) <= 1
        assert (e > 4).mean() < 0.01


def test_frame_mixed_scale_classes_one_call(monkeypatch):
    """Mixed 2x and 3x cells compile to ONE pallas call since round 3
    (two-class kernel with a runtime pys switch) — compiled multi-class
    row-group views proven on hardware."""
    from swiftvideo_tpu.ops import pallas_frame as pf
    W, H = 1920, 1080
    srcs = []
    for i in range(2):
        srcs.append((_planes(PixelFormat.y420p, (W, H), 200 + i),
                     PixelFormat.y420p,
                     rect_uniforms((W, H), (W, H), x=i * 960 + 0.25,
                                   y=0.25, w=960, h=540).pack()))
    for i in range(3):
        srcs.append((_planes(PixelFormat.y420p, (W, H), 210 + i),
                     PixelFormat.y420p,
                     rect_uniforms((W, H), (W, H), x=i * 640 + 0.25,
                                   y=540.25, w=640, h=360).pack()))
    calls = []
    real = pf._frame_program

    def spy(*a, **k):
        calls.append(a)
        return real(*a, **k)

    monkeypatch.setattr(pf, "_frame_program", spy)
    _frame_case(PixelFormat.y420p, (W, H), srcs, "frame-mixed-2x3x")
    assert len(calls) == 1, f"expected one kernel call, got {len(calls)}"


def test_frame_three_scale_classes_one_call(monkeypatch):
    """2x+3x+4x cells share ONE call when the VMEM estimate fits (the
    full integer class set in a single compiled multi-class kernel)."""
    from swiftvideo_tpu.ops import pallas_frame as pf
    W, H = 1920, 1080
    srcs = []
    for geom_i, (w_el, h_el, y0) in enumerate(
            ((960, 540, 0.25), (640, 360, 540.25), (480, 270, 270.25))):
        srcs.append((_planes(PixelFormat.y420p, (W, H), 230 + geom_i),
                     PixelFormat.y420p,
                     rect_uniforms((W, H), (W, H), x=geom_i * 480 + 0.25,
                                   y=y0, w=w_el, h=h_el).pack()))
    calls = []
    real = pf._frame_program

    def spy(*a, **k):
        calls.append(a)
        return real(*a, **k)

    monkeypatch.setattr(pf, "_frame_program", spy)
    _frame_case(PixelFormat.y420p, (W, H), srcs, "frame-mixed-2x3x4x")
    assert len(calls) == 1, f"expected one kernel call, got {len(calls)}"


def test_motion_mxu_ssd_hardware():
    """MXU SSD variant candidate-exact vs its oracle on the chip (the
    conv + fused dy-reduction lowering is hardware-specific)."""
    from swiftvideo_tpu.ops import motion
    rng = np.random.default_rng(77)
    ref = rng.integers(0, 255, (128, 256), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    gold = motion.me_ssd_golden(cur, ref, 16, 64)
    out = np.asarray(motion.me_fullsearch_mxu(cur, ref, 16, 64))
    _assert_exact(out, gold, "motion-ssd-grouped-128x256")


def test_audio_device_mix_exact_hardware():
    """Device snd fold == host loop with exact integer equality on the
    chip (AudioMixer routes aligned ticks through this)."""
    from swiftvideo_tpu.ops.audio import apply_mix_s16, mix_s16_device
    rng = np.random.default_rng(5)
    n, s = 1920, 6
    inputs = rng.integers(-20000, 20000, (s, n)).astype(np.int16)
    gains = rng.uniform(0.1, 2.0, (s, 2)).astype(np.float32)
    host = np.zeros(n, np.int16)
    for i in range(s):
        apply_mix_s16(inputs[i], gains[i], host)
    dev = np.asarray(mix_s16_device(inputs, gains))
    _assert_exact(dev, host, "audio-mix-device-exact")


def test_packed_422_composite_hardware():
    """Packed 4:2:2 in/out through the y422p fold on the chip (round-3
    coverage extension; XLA path)."""
    from swiftvideo_tpu.ops import composite
    rng = np.random.default_rng(41)
    W, H = 256, 128
    src = rng.integers(0, 256, (64, 128, 2), np.int64).astype(np.uint8)
    uni = rect_uniforms((128, 64), (W, H), x=12.3, y=8.7, w=200.4, h=100.2,
                        opacity=0.9)
    for fmt in (PixelFormat.yuvs, PixelFormat.zvuy):
        sources = [([src], fmt, uni)]
        ref = golden.composite_stack(fmt, (W, H), sources)
        dev = composite.composite_stack_device(fmt, (W, H), sources)
        err = np.abs(np.asarray(dev[0]).astype(int)
                     - ref[0].astype(int)).max()
        assert err <= 1, (fmt, err)


def test_motion_pyramid_hardware():
    """Pyramid production mode on the chip: coarse raw-MV path + the
    refine gather/re-score lowering must reproduce the exhaustive
    oracle on interior blocks under even global translation (same
    contract as the CPU test; the gather and i32 products are
    hardware-specific lowerings)."""
    from swiftvideo_tpu.ops import motion
    rng = np.random.default_rng(33)
    ref = rng.integers(0, 255, (96, 128), np.uint8)
    cur = np.roll(ref, (6, 4), axis=(0, 1))
    gold = motion.me_ssd_golden(cur, ref, 16, 64)
    pyr = np.asarray(motion.me_fullsearch_pyramid(cur, ref, 16, 64))
    _assert_exact(pyr[1:-1, 1:-1], gold[1:-1, 1:-1],
                  "motion-pyramid-interior")


def test_audio_device_mix_windowed_exact_hardware():
    """Windowed device fold (offset/partial AudioMixer ticks) == host
    loop with exact integer equality on the chip."""
    from swiftvideo_tpu.ops.audio import (apply_mix_s16,
                                          mix_s16_device_windowed)
    rng = np.random.default_rng(13)
    n, s = 1920, 5
    host = rng.integers(-30000, 30000, n).astype(np.int16)
    inputs = np.zeros((s, n), np.int16)
    starts = np.zeros(s, np.int32)
    ends = np.zeros(s, np.int32)
    gains = rng.uniform(0.1, 1.6, (s, 2)).astype(np.float32)
    expect = host.copy()
    for k in range(s):
        size = int(rng.integers(400, 2400))
        data = rng.integers(-32768, 32767, size).astype(np.int16)
        b_off = int(rng.integers(0, n - 100))
        i_off = int(rng.integers(0, size - 100))
        apply_mix_s16(data, gains[k], expect,
                      backing_start=b_off, input_start=i_off)
        m = min(n - b_off, size - i_off)
        inputs[k, b_off:b_off + m] = data[i_off:i_off + m]
        starts[k], ends[k] = b_off, b_off + m
    dev = np.asarray(mix_s16_device_windowed(inputs, gains, starts, ends,
                                             base=host))
    _assert_exact(dev, expect, "audio-mix-windowed-exact")


def test_frame_pad_cache_on_hardware():
    """Ingest-padded (PadCache) path on the chip: bit-identical to the
    fused path across repeated and refreshed ticks (the production
    VideoMixer flow; ops/pallas_frame.PadCache)."""
    from swiftvideo_tpu.ops.pallas_frame import (PadCache,
                                                 composite_frame_pallas)
    W, H = 1920, 1080
    srcs = []
    for s in range(4):
        u = rect_uniforms((W, H), (W, H), x=(s % 2) * 950 + 3.3,
                          y=(s // 2) * 530 + 2.7, w=W / 2, h=H / 2,
                          opacity=0.9, fill_color=(0.1, 0.2, 0.3, 0.5))
        srcs.append((_planes(PixelFormat.y420p, (W, H), 140 + s),
                     PixelFormat.y420p, u.pack()))
    fused = composite_frame_pallas((W, H), srcs)
    assert fused is not None
    cache = PadCache()
    for tick in range(2):              # cold, then repeated (cache hit)
        cache.begin_tick()
        out = composite_frame_pallas((W, H), srcs, pad_cache=cache)
        cache.end_tick()
        assert out is not None
        _assert_parity(out, fused, f"pad-cache-tick{tick}", tol=0)
    assert cache.hits == 1 and cache.misses == 1
    # refreshed source -> re-pad, still exact
    srcs[2] = (_planes(PixelFormat.y420p, (W, H), 150), PixelFormat.y420p,
               srcs[2][2])
    ref = golden.composite_stack(PixelFormat.y420p, (W, H), srcs)
    cache.begin_tick()
    out = composite_frame_pallas((W, H), srcs, pad_cache=cache)
    cache.end_tick()
    _assert_parity(out, ref, "pad-cache-refresh")


def test_frame_pad_cache_rgba_on_hardware():
    """Family-B ingest-pad (deinterleave+pad cached) on the chip:
    bit-identical to the fused path for a yuv background + rgba overlay
    scene across repeated ticks."""
    from swiftvideo_tpu.ops.pallas_frame import (PadCache,
                                                 composite_frame_pallas)
    rng = np.random.default_rng(160)
    W, H = 1280, 720
    overlay = [rng.integers(0, 256, (128, 512, 4), np.int64).astype(np.uint8)]
    srcs = [
        (_planes(PixelFormat.y420p, (W, H), 161), PixelFormat.y420p,
         rect_uniforms((W, H), (W, H), x=0, y=0, w=W, h=H).pack()),
        (overlay, PixelFormat.RGBA,
         rect_uniforms((512, 128), (W, H), x=100.3, y=60.7, w=512, h=128,
                       opacity=0.9, fill_color=(0.2, 0.1, 0.5, 0.4)).pack()),
    ]
    fused = composite_frame_pallas((W, H), srcs)
    assert fused is not None
    cache = PadCache()
    for tick in range(2):
        cache.begin_tick()
        out = composite_frame_pallas((W, H), srcs, pad_cache=cache)
        cache.end_tick()
        _assert_parity(out, fused, f"pad-cache-rgba-tick{tick}", tol=0)
    assert cache.hits == 2 and cache.misses == 2   # A run + B run
