"""Measure (a) achievable HBM BW via pallas streaming copy, (b) XLA
elementwise BW, (c) per-grid-step overhead, (d) out-block copy behavior.
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


def device_loop(body, init, iters=50, reps=3):
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

    # (a) pallas streaming copy of 64 MB (u8), 512-row blocks
    ROWS, COLS = 8192, 8192  # 64 MB
    BLK = 512
    x = jnp.asarray(rng.integers(0, 256, (ROWS, COLS), np.int64
                                 ).astype(np.uint8))

    def k_copy(in_ref, out_ref):
        out_ref[...] = in_ref[...]

    p_copy = pl.pallas_call(
        k_copy,
        grid=(ROWS // BLK,),
        in_specs=[pl.BlockSpec((BLK, COLS), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BLK, COLS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))

    def body_a(_k, c):
        return p_copy(c) | jnp.uint8(_k & 1)

    dt = device_loop(body_a, x, iters=20)
    log(f"pallas stream-copy 64MB: {dt*1e3:.3f} ms -> "
        f"{2 * ROWS * COLS / dt / 1e9:.0f} GB/s (r+w)")

    # (b) XLA elementwise on the same buffer
    def body_b(_k, c):
        return c ^ jnp.uint8(1)

    dt = device_loop(body_b, x, iters=20)
    log(f"XLA elemwise 64MB:       {dt*1e3:.3f} ms -> "
        f"{2 * ROWS * COLS / dt / 1e9:.0f} GB/s (r+w)")

    # (b2) XLA elementwise f32 64 MB
    xf = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))

    def body_b2(_k, c):
        return c * 1.000001

    dt = device_loop(body_b2, xf, iters=20)
    log(f"XLA elemwise f32 64MB:   {dt*1e3:.3f} ms -> "
        f"{2 * 4096 * 4096 * 4 / dt / 1e9:.0f} GB/s (r+w)")

    # (c) per-grid-step overhead: empty kernel, tiny in/out, grid (N,)
    for N in (10, 40, 160, 640):
        def k_empty(in_ref, out_ref):
            @pl.when(pl.program_id(0) == N - 1)
            def _():
                out_ref[...] = in_ref[...]

        p_e = pl.pallas_call(
            k_empty,
            grid=(N,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)))

        xi = jnp.ones((8, 128), jnp.int32)

        def body_c(_k, c):
            return p_e(c)

        dt = device_loop(body_c, xi, iters=50)
        log(f"empty grid({N:4d}): {dt*1e3:.3f} ms -> "
            f"{dt*1e6/N:.2f} us/step")

    # (d) 1080p out blocks, constant index map, grid (40,): does pallas
    # copy the out block at every step?
    H, W = 1080, 1920
    for N in (1, 4, 10, 40):
        def k_out(in_ref, out_ref):
            @pl.when(pl.program_id(0) == N - 1)
            def _():
                out_ref[...] = jnp.full((H, W), in_ref[0, 0].astype(
                    jnp.int32)).astype(jnp.uint8)  # noqa

        p_o = pl.pallas_call(
            k_out,
            grid=(N,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((H, W), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024))

        xi = jnp.ones((8, 128), jnp.int32)

        def body_d(_k, c):
            o = p_o(c)
            return c + o[0, 0].astype(jnp.int32) * 0

        dt = device_loop(body_d, xi, iters=50)
        log(f"1080p-out grid({N:3d}): {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
