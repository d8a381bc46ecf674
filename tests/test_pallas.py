"""Pallas fused composite kernel: interpreter-mode parity on CPU.

The compiled kernel targets TPU; interpreter mode validates the kernel
logic (DMA windows, weight matrices, masks, blend) against the oracle
without hardware.
"""

import numpy as np
import pytest

from swiftvideo_tpu.media import PixelFormat, allocate_planes
from swiftvideo_tpu.ops import golden, rect_uniforms


def _scale_hints(packed, w_out, h_out, w_in, h_in):
    p = np.asarray(packed, np.float64)
    sx = abs(p[6] * p[0] * 2.0 / w_out * w_in)
    sy = abs(p[9] * p[3] * 2.0 / h_out * h_in)
    return sy, sx


@pytest.mark.parametrize("rect", [
    dict(x=30.3, y=20.7, w=200.4, h=160.2),     # downscale-ish
    dict(x=-40.0, y=10.0, w=300.0, h=300.0),    # partially off-canvas
])
def test_pallas_interpret_parity(rect):
    import jax.numpy as jnp
    from swiftvideo_tpu.ops import pallas_composite as pc

    w_out = h_out = 256
    w_in, h_in = 192, 128
    rng = np.random.default_rng(1)
    src = [rng.integers(0, 256, pl.shape, dtype=np.uint8)
           for pl in allocate_planes(PixelFormat.y420p, (w_in, h_in))]
    uni = rect_uniforms((w_in, h_in), (w_out, h_out), opacity=0.85,
                        fill_color=(0.2, 0.4, 0.6, 0.5), **rect)
    packed = uni.pack()
    ref = golden.composite_stack(PixelFormat.y420p, (w_out, h_out),
                                 [(src, PixelFormat.y420p, uni)])
    tgt = [jnp.asarray(p)
           for p in golden.clear_planes(PixelFormat.y420p, (w_out, h_out))]
    hints = _scale_hints(packed, w_out, h_out, w_in, h_in)
    out = pc.apply_composite_pallas(tgt, [jnp.asarray(p) for p in src],
                                    jnp.asarray(packed), uni.fill_color,
                                    hints, interpret=True)
    for i, (r, d) in enumerate(zip(ref, out)):
        err = np.abs(np.asarray(d).astype(int) - r.astype(int))
        assert err.max() <= 1, (i, err.max(), np.argwhere(err > 1)[:5])
