"""Find the source of the ~0.3 ms per-pallas_call floor on this platform.

Probes, each timed via carried-dependency fori_loop:
  loop-only            body = trivial VPU op, no pallas
  pallas-min           8x128 kernel, no scratch
  pallas-scratch       8x128 kernel + 25 MB VMEM scratch
  pallas-out           1080p-out kernel (3 u8 planes), no scratch
  pallas-full-scratch  1080p-out + 25 MB scratch (the frame-kernel shape)
  xla-1080p            plain XLA elementwise on a 1080p u8 plane
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))

    # ---- loop-only -----------------------------------------------------
    def body0(_k, c):
        return c * 1.000001 + 1e-9

    log(f"loop-only:          {device_loop(body0, x)*1e3:.3f} ms")

    # ---- pallas-min ----------------------------------------------------
    def k_min(in_ref, out_ref):
        out_ref[...] = in_ref[...] * 2.0

    p_min = pl.pallas_call(
        k_min, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

    def body1(_k, c):
        return p_min(c) * 0.5

    log(f"pallas-min:         {device_loop(body1, x)*1e3:.3f} ms")

    # ---- pallas-scratch ------------------------------------------------
    def k_scr(in_ref, out_ref, scr1, scr2, scr3):
        out_ref[...] = in_ref[...] * 2.0

    p_scr = pl.pallas_call(
        k_scr, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1088, 2048), jnp.float32),
                        pltpu.VMEM((544, 1024), jnp.float32),
                        pltpu.VMEM((544, 1024), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def body2(_k, c):
        return p_scr(c) * 0.5

    log(f"pallas-scratch25MB: {device_loop(body2, x)*1e3:.3f} ms")

    # ---- pallas-out (1080p outputs) --------------------------------------
    def k_out(in_ref, oy, ocb, ocr):
        oy[...] = jnp.full((1080, 1920), in_ref[0, 0].astype(jnp.int32).astype(jnp.uint8))
        ocb[...] = jnp.full((540, 960), jnp.uint8(128))
        ocr[...] = jnp.full((540, 960), jnp.uint8(128))

    p_out = pl.pallas_call(
        k_out, out_shape=[jax.ShapeDtypeStruct((1080, 1920), jnp.uint8),
                          jax.ShapeDtypeStruct((540, 960), jnp.uint8),
                          jax.ShapeDtypeStruct((540, 960), jnp.uint8)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def body3(_k, c):
        o = p_out(c)
        return c + o[0][0, 0].astype(jnp.float32) * 1e-12

    log(f"pallas-out1080p:    {device_loop(body3, x)*1e3:.3f} ms")

    # ---- pallas out + scratch (frame-kernel shape) -----------------------
    def k_full(in_ref, oy, ocb, ocr, s1, s2, s3):
        oy[...] = jnp.full((1080, 1920), in_ref[0, 0].astype(jnp.int32).astype(jnp.uint8))
        ocb[...] = jnp.full((540, 960), jnp.uint8(128))
        ocr[...] = jnp.full((540, 960), jnp.uint8(128))

    p_full = pl.pallas_call(
        k_full, out_shape=[jax.ShapeDtypeStruct((1080, 1920), jnp.uint8),
                           jax.ShapeDtypeStruct((540, 960), jnp.uint8),
                           jax.ShapeDtypeStruct((540, 960), jnp.uint8)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[pltpu.VMEM((1088, 2048), jnp.float32),
                        pltpu.VMEM((544, 1024), jnp.float32),
                        pltpu.VMEM((544, 1024), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def body4(_k, c):
        o = p_full(c)
        return c + o[0][0, 0].astype(jnp.float32) * 1e-12

    log(f"pallas-out+scratch: {device_loop(body4, x)*1e3:.3f} ms")

    # ---- xla-1080p -------------------------------------------------------
    y = jnp.asarray(rng.integers(0, 256, (1080, 1920), np.int64
                                 ).astype(np.uint8))

    def body5(_k, c):
        return c + jnp.uint8(1)

    log(f"xla-1080p-elemwise: {device_loop(body5, y)*1e3:.3f} ms")

    # ---- two pallas-min calls per iteration ------------------------------
    def body6(_k, c):
        return p_min(p_min(c)) * 0.25

    log(f"pallas-min x2:      {device_loop(body6, x)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
