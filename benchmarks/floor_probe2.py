"""Bisect the gridded-kernel floor: which ingredient costs ~0.3 ms?

All kernels: tiny 8x128 input blocks, 1080p u8 triple output, write-out
at the last grid step. Variants toggle grid shape, scalar prefetch,
dimension_semantics, scratch init/emit, and out-spec block mapping.
"""
import os
import sys
import time
from functools import partial

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


H, W = 1080, 1920


def make(grid, prefetch, semantics, scratch, emit_every=False):
    ns, nj = grid

    def kern(*refs):
        if prefetch:
            ip = refs[0]
            refs = refs[1:]
        in_ref = refs[0]
        oy, ocb, ocr = refs[1:4]
        scr = refs[4:]
        s = pl.program_id(0)
        j = pl.program_id(1)
        if scratch:
            @pl.when((s == 0) & (j == 0))
            def _init():
                scr[0][...] = jnp.zeros(scr[0].shape, jnp.float32)

        @pl.when(emit_every | ((s == ns - 1) & (j == nj - 1)))
        def _emit():
            v = in_ref[0, 0, 0].astype(jnp.uint8)
            if scratch:
                oy[...] = scr[0][0:H, 0:W].astype(jnp.int32
                                                  ).astype(jnp.uint8) + v
            else:
                oy[...] = jnp.full((H, W), v)
            ocb[...] = jnp.full((H // 2, W // 2), jnp.uint8(128))
            ocr[...] = jnp.full((H // 2, W // 2), jnp.uint8(128))

    in_specs = [pl.BlockSpec((1, 8, 128), lambda s, j, *_: (s, 0, 0))]
    out_specs = [pl.BlockSpec((H, W), lambda s, j, *_: (0, 0)),
                 pl.BlockSpec((H // 2, W // 2), lambda s, j, *_: (0, 0)),
                 pl.BlockSpec((H // 2, W // 2), lambda s, j, *_: (0, 0))]
    scratch_shapes = ([pltpu.VMEM((1088, 2048), jnp.float32)]
                      if scratch else [])
    kw = dict(
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint8),
                   jax.ShapeDtypeStruct((H // 2, W // 2), jnp.uint8),
                   jax.ShapeDtypeStruct((H // 2, W // 2), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    if prefetch:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_specs, scratch_shapes=scratch_shapes)
        fn = pl.pallas_call(kern, grid_spec=gs, **kw)
        return jax.jit(lambda ip, x: fn(ip, x))
    gs = pl.GridSpec(grid=grid, in_specs=in_specs, out_specs=out_specs)
    fn = pl.pallas_call(kern, grid_spec=gs,
                        scratch_shapes=scratch_shapes, **kw)
    return jax.jit(lambda ip, x: fn(x))


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (4, 8, 128), np.int64
                                 ).astype(np.int32))
    ip = jnp.zeros((4, 9), jnp.int32)

    cases = [
        ("grid(4,10) prefetch arb+scratch", (4, 10), True,
         ("arbitrary", "arbitrary"), True, False),
        ("grid(4,10) prefetch arb        ", (4, 10), True,
         ("arbitrary", "arbitrary"), False, False),
        ("grid(4,10) plain    arb        ", (4, 10), False,
         ("arbitrary", "arbitrary"), False, False),
        ("grid(4,10) plain    par        ", (4, 10), False,
         ("parallel", "parallel"), False, False),
        ("grid(1,1)  prefetch arb+scratch", (1, 1), True,
         ("arbitrary", "arbitrary"), True, False),
        ("grid(4,1)  prefetch arb+scratch", (4, 1), True,
         ("arbitrary", "arbitrary"), True, False),
        ("grid(1,10) prefetch arb+scratch", (1, 10), True,
         ("arbitrary", "arbitrary"), True, False),
        ("grid(4,10) prefetch arb+scr+emit_every", (4, 10), True,
         ("arbitrary", "arbitrary"), True, True),
    ]
    for name, grid, pref, sem, scr, ee in cases:
        try:
            fn = make(grid, pref, sem, scr, ee)

            def body(_k, c, fn=fn):
                xx, _ = c
                o = fn(ip, xx)
                return (xx + o[0][0, 0][None, None, None].astype(jnp.int32) * 0, o)

            dt = device_loop(body, (x, fn(ip, x)))
            log(f"{name}: {dt*1e3:.3f} ms")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
