"""Micro-benchmark: compare composite sampling strategies on TPU.

Strategies for the axis-aligned bilinear sample at 1080p:
  gather2d   — generic 2D advanced-index gather (ops.golden path)
  axis_split — row gather + lerp, then column gather + lerp
  matmul     — dense R @ src @ C^T on the MXU (f32 highest / default)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H = W = None


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    Hs, Ws = 1080, 1920   # source
    Ho, Wo = 1080, 1920   # output (same-size composite, worst case)
    src = jnp.asarray(np.random.randint(0, 256, (Hs, Ws), np.uint8))

    # output->source coords for a slight scale (emulating composite)
    v = (np.arange(Ho, dtype=np.float32) / Ho) * Hs - 0.5
    u = (np.arange(Wo, dtype=np.float32) / Wo) * Ws - 0.5
    y0 = np.clip(np.floor(v), 0, Hs - 1).astype(np.int32)
    y1 = np.clip(y0 + 1, 0, Hs - 1)
    fy = (v - np.floor(v)).astype(np.float32)
    x0 = np.clip(np.floor(u), 0, Ws - 1).astype(np.int32)
    x1 = np.clip(x0 + 1, 0, Ws - 1)
    fx = (u - np.floor(u)).astype(np.float32)

    y0j, y1j, fyj = jnp.asarray(y0), jnp.asarray(y1), jnp.asarray(fy)
    x0j, x1j, fxj = jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(fx)

    @jax.jit
    def gather2d(s):
        sf = s.astype(jnp.float32)
        yy0 = y0j[:, None]
        yy1 = y1j[:, None]
        xx0 = x0j[None, :]
        xx1 = x1j[None, :]
        p00 = sf[yy0, xx0]
        p01 = sf[yy0, xx1]
        p10 = sf[yy1, xx0]
        p11 = sf[yy1, xx1]
        top = p00 * (1 - fxj) + p01 * fxj
        bot = p10 * (1 - fxj) + p11 * fxj
        return (top * (1 - fyj[:, None]) + bot * fyj[:, None]).astype(jnp.uint8)

    @jax.jit
    def axis_split(s):
        sf = s.astype(jnp.float32)
        rows = sf[y0j, :] * (1 - fyj)[:, None] + sf[y1j, :] * fyj[:, None]
        return (rows[:, x0j] * (1 - fxj) + rows[:, x1j] * fxj).astype(jnp.uint8)

    # dense interpolation matrices
    R = np.zeros((Ho, Hs), np.float32)
    R[np.arange(Ho), y0] += 1 - fy
    R[np.arange(Ho), y1] += fy
    C = np.zeros((Wo, Ws), np.float32)
    C[np.arange(Wo), x0] += 1 - fx
    C[np.arange(Wo), x1] += fx
    Rj, Cj = jnp.asarray(R), jnp.asarray(C)

    @jax.jit
    def matmul_hi(s):
        sf = s.astype(jnp.float32)
        t = jnp.dot(Rj, sf, precision="highest")
        return jnp.dot(t, Cj.T, precision="highest").astype(jnp.uint8)

    @jax.jit
    def matmul_default(s):
        sf = s.astype(jnp.float32)
        t = jnp.dot(Rj, sf)
        return jnp.dot(t, Cj.T).astype(jnp.uint8)

    for name, fn in [("gather2d", gather2d), ("axis_split", axis_split),
                     ("matmul_hi", matmul_hi), ("matmul_def", matmul_default)]:
        dt = timeit(fn, src)
        print(f"{name:12s} {dt*1e3:8.3f} ms/plane  -> {1.0/dt:8.1f} planes/s")
        # correctness vs gather2d
        ref = np.asarray(gather2d(src)).astype(int)
        got = np.asarray(fn(src)).astype(int)
        print(f"{'':12s} max err vs gather2d: {np.abs(ref-got).max()}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
