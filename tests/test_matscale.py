"""Matmul-sampler scale vs the golden oracle (<=1 LSB)."""

import numpy as np
import pytest

from swiftvideo_tpu.media.pixel import PixelFormat
from swiftvideo_tpu.ops import golden
from swiftvideo_tpu.ops.matscale import plan_scale, scale_y420p, \
    scale_y420p_batch
from swiftvideo_tpu.ops.uniforms import identity_uniforms, rect_uniforms


def _rand_y420p(rng, h, w):
    return [rng.integers(0, 256, (h, w), np.int64).astype(np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), np.int64).astype(np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), np.int64).astype(np.uint8)]


def _oracle(planes, in_size, out_size):
    w, h = out_size
    uni = identity_uniforms(in_size, out_size)
    return golden.composite_stack(PixelFormat.y420p, out_size,
                                  [(planes, PixelFormat.y420p, uni)])


@pytest.mark.parametrize("in_hw,out_hw", [
    ((1080, 1920), (720, 1280)),   # ladder 2:3 vertical
    ((1080, 1920), (480, 854)),    # ladder 4:9 vertical, odd-ish width
    ((1080, 1920), (360, 640)),    # integer 3:1
    ((1080, 1920), (136, 240)),    # wall tile: 135:17 vertical, 8:1 horiz
    ((720, 1280), (1080, 1920)),   # upscale
    ((256, 256), (256, 256)),      # identity
])
def test_scale_parity(in_hw, out_hw):
    rng = np.random.default_rng(42)
    ih, iw = in_hw
    oh, ow = out_hw
    planes = _rand_y420p(rng, ih, iw)
    plan = plan_scale(identity_uniforms((iw, ih), (ow, oh)), (ow, oh),
                      (ih, iw))
    assert plan is not None
    out = scale_y420p(planes, plan)
    ref = _oracle(planes, (iw, ih), (ow, oh))
    for o, r in zip(out, ref):
        err = np.abs(np.asarray(o).astype(int) - r.astype(int)).max()
        assert err <= 1, err


def test_scale_batch():
    rng = np.random.default_rng(0)
    n = 3
    ys = np.stack([_rand_y420p(rng, 108, 192)[0] for _ in range(n)])
    us = rng.integers(0, 256, (n, 54, 96), np.int64).astype(np.uint8)
    vs = rng.integers(0, 256, (n, 54, 96), np.int64).astype(np.uint8)
    plan = plan_scale(identity_uniforms((192, 108), (48, 36)), (48, 36),
                      (108, 192))
    oy, ou, ov = scale_y420p_batch(ys, us, vs, plan)
    assert oy.shape == (n, 36, 48) and ou.shape == (n, 18, 24)
    for i in range(n):
        ref = _oracle([ys[i], us[i], vs[i]], (192, 108), (48, 36))
        for o, r in zip((oy[i], ou[i], ov[i]), ref):
            assert np.abs(np.asarray(o).astype(int)
                          - r.astype(int)).max() <= 1


def test_plan_rejects_non_scale():
    # partial-canvas rect -> not a pure scale; opacity < 1 -> rejected
    u1 = rect_uniforms((64, 64), (128, 128), x=0, y=0, w=64, h=64)
    assert plan_scale(u1, (128, 128), (64, 64)) is None
    u2 = identity_uniforms((64, 64), (128, 128), opacity=0.5)
    assert plan_scale(u2, (128, 128), (64, 64)) is None
