"""Decompose config-3 (4-source 1080p composite) frame time on the TPU.

Times, via carried-dependency fori_loops (the only honest timing through
the tunnel):
  - full runner        (params + pad + kernel)   -- the bench number
  - kernel only        (pre-padded device inputs)
  - pad_sources only
  - frame_params only
so the round-2 optimization attacks the real bottleneck (VERDICT item 1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_loop(body, init, iters=100, reps=3):
    @jax.jit
    def run(carry, n):
        return jax.lax.fori_loop(0, n, body, carry)

    jax.block_until_ready(run(init, 2))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from swiftvideo_tpu.ops import rect_uniforms
    from swiftvideo_tpu.ops.pallas_frame import (
        _frame_program, frame_geometry, frame_params, pad_sources)

    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    H, W = 1080, 1920
    n = 4
    unis = [rect_uniforms((W, H), (W, H), x=(s % 2) * 960, y=(s // 2) * 540,
                          w=960, h=540, opacity=0.9,
                          fill_color=(0.1, 0.2, 0.3, 0.5)).pack()
            for s in range(n)]
    ys = jnp.asarray(rng.integers(0, 256, (n, H, W), np.int64).astype(np.uint8))
    us = jnp.asarray(rng.integers(0, 256, (n, H // 2, W // 2), np.int64).astype(np.uint8))
    vs = jnp.asarray(rng.integers(0, 256, (n, H // 2, W // 2), np.int64).astype(np.uint8))

    geom = frame_geometry(unis, (W, H), (H, W))
    log("geom:", {k: v for k, v in geom.items() if k not in ("offs", "jranges")})
    log("offs:", geom["offs"], "jranges:", geom["jranges"])
    packed = np.stack([np.asarray(u, np.float32) for u in unis])
    offs = np.asarray(geom["offs"], np.int32)
    jrs = np.asarray(geom["jranges"], np.int32)
    pk = jnp.asarray(packed)

    size, in_shape = (W, H), (H, W)
    gd = dict(hp=geom["hp"], wp=geom["wp"], hpc=geom["hpc"], wpc=geom["wpc"],
              padt=geom["padt"], pgrp=geom["pgrp"], has1=geom["has1"])

    # ---- full runner --------------------------------------------------
    from swiftvideo_tpu.ops.pallas_frame import _runner_A
    run_a = _runner_A(size, in_shape, n, geom["bh"], geom["bw"], geom["hp"],
                      geom["wp"], geom["hpc"], geom["wpc"], geom["pys"],
                      geom["padt"], geom["pgrp"], geom["has1"], geom["ww"],
                      False, False)

    def full_body(_k, c):
        p, _ = c
        o = run_a(p, offs, jrs, ys, us, vs)
        return (p + o[0][0, 0].astype(jnp.float32) * 1e-12, o)

    dt_full = device_loop(full_body, (pk, run_a(pk, offs, jrs, ys, us, vs)))
    log(f"full runner:      {dt_full*1e3:.3f} ms")

    # ---- pad only ------------------------------------------------------
    pad_j = jax.jit(lambda a, b, c: pad_sources(a, b, c, gd))

    def pad_body(_k, c):
        y, o = c
        o2 = pad_sources(y, us, vs, gd)
        return (y + o2[0][0, 0, 0][None, None, None].astype(jnp.uint8) * 0, o2)

    dt_pad = device_loop(pad_body, (ys, pad_j(ys, us, vs)))
    log(f"pad_sources only: {dt_pad*1e3:.3f} ms")

    # ---- params only ---------------------------------------------------
    params_j = jax.jit(lambda p: frame_params(p, jnp.asarray(offs),
                                              jnp.asarray(jrs), size,
                                              in_shape, geom["pys"],
                                              geom["padt"]))

    def par_body(_k, c):
        p, _ = c
        o = params_j(p)
        return (p + o[1][0, 0] * 1e-12, o)

    dt_par = device_loop(par_body, (pk, params_j(pk)), iters=200)
    log(f"frame_params only:{dt_par*1e3:.3f} ms")

    # ---- kernel only (pre-padded static inputs) -------------------------
    arrs = jax.block_until_ready(pad_j(ys, us, vs))
    prog = _frame_program(H, W, H, W, n, geom["bh"], geom["bw"], geom["hp"],
                          geom["wp"], geom["hpc"], geom["wpc"], geom["pgrp"],
                          geom["has1"], geom["ww"], False, False)
    ipar, fpar = jax.block_until_ready(params_j(pk))

    def kern_body(_k, c):
        fp, _ = c
        o = prog(ipar, fp, *arrs)
        return (fp + o[0][0, 0].astype(jnp.float32) * 1e-12, o)

    dt_kern = device_loop(kern_body, (fpar, prog(ipar, fpar, *arrs)))
    log(f"kernel only:      {dt_kern*1e3:.3f} ms")

    log(f"sum(pad+params+kernel) = {(dt_pad+dt_par+dt_kern)*1e3:.3f} ms "
        f"vs full {dt_full*1e3:.3f} ms")

    # HBM traffic model
    bytes_in = ys.size + us.size + vs.size
    padded = sum(int(np.prod(a.shape)) for a in arrs)
    out_b = H * W + 2 * (H // 2) * (W // 2)
    log(f"source bytes {bytes_in/1e6:.1f} MB, padded {padded/1e6:.1f} MB, "
        f"out {out_b/1e6:.1f} MB")
    log(f"kernel-only effective BW (padded read + out write): "
        f"{(padded+out_b)/dt_kern/1e9:.0f} GB/s")
    log(f"pad effective BW (read src + write padded): "
        f"{(bytes_in+padded)/dt_pad/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
