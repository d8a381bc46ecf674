"""Trusted-harness bisection of the frame-kernel floor + real BW ceiling.

Timing: jitted fori_loop, then fetch a corner via np.asarray (forces
completion); min over reps.  The earlier device_loop harness reported
0.000 ms for real work - do not trust block_until_ready alone here.
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


def timeit(fn, init, iters=100, reps=3):
    """fn: (carry) -> carry ; returns ms/iter."""
    @jax.jit
    def run(c, n):
        return jax.lax.fori_loop(0, n, lambda k, c: fn(c), c)

    out = run(init, 3)
    _ = [np.asarray(o)[:1] for o in jax.tree.leaves(out)]
    best = float("inf")
    for _r in range(reps):
        t0 = time.perf_counter()
        out = run(init, iters)
        _ = [np.asarray(o)[:1] for o in jax.tree.leaves(out)]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


H, W = 1080, 1920


def mk(grid, n_out=3, scratch=0, prefetch=False, vmem=None, semantics=None,
       out_small=False):
    ns = grid[0]
    nj = grid[1] if len(grid) > 1 else 1
    oshape = [(8, 256)] * n_out if out_small else \
        [(H, W), (H // 2, W // 2), (H // 2, W // 2)][:n_out]

    def kern(*refs):
        if prefetch:
            refs = refs[1:]
        in_ref = refs[0]
        outs = refs[1:1 + n_out]
        s = pl.program_id(0)
        j = pl.program_id(1) if len(grid) > 1 else 0
        last = (s == ns - 1) & (j == nj - 1)

        @pl.when(last)
        def _():
            v = in_ref[0, 0].astype(jnp.int32)
            for o, shp in zip(outs, oshape):
                o[...] = jnp.full(shp, v).astype(jnp.uint8)

    scr = [pltpu.VMEM((1088, 2048), jnp.float32)] * scratch
    cp = {}
    if vmem:
        cp["vmem_limit_bytes"] = vmem
    if semantics:
        cp["dimension_semantics"] = semantics
    in_specs = [pl.BlockSpec((8, 128),
                             (lambda s, j, *_: (0, 0)) if len(grid) > 1
                             else (lambda s, *_: (0, 0)))]
    out_specs = [pl.BlockSpec(shp,
                              (lambda s, j, *_: (0, 0)) if len(grid) > 1
                              else (lambda s, *_: (0, 0)))
                 for shp in oshape]
    kw = dict(
        grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(shp, jnp.uint8) for shp in oshape],
        scratch_shapes=scr,
        compiler_params=pltpu.CompilerParams(**cp) if cp else None,
    )
    if prefetch:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_specs, scratch_shapes=scr)
        fn = pl.pallas_call(kern, grid_spec=gs,
                            out_shape=kw["out_shape"],
                            compiler_params=kw["compiler_params"])
        ip = jnp.zeros((4, 9), jnp.int32)
        return lambda x: fn(ip, x)
    return pl.pallas_call(kern, **{k: v for k, v in kw.items()
                                   if v is not None})


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (8, 128), np.int64
                                 ).astype(np.int32))

    def case(name, **kw):
        try:
            fn = mk(**kw)

            def body(c):
                o = fn(c)
                return c + o[0][0, 0].astype(jnp.int32) * 0

            log(f"{name}: {timeit(body, x):.3f} ms")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {str(e)[:120]}")

    case("g(4,10) 3out            ", grid=(4, 10))
    case("g(4,10) 3out sem=arb    ", grid=(4, 10),
         semantics=("arbitrary", "arbitrary"))
    case("g(4,10) 3out vmem100M   ", grid=(4, 10),
         vmem=100 * 1024 * 1024)
    case("g(4,10) 3out scr3 v100M ", grid=(4, 10), scratch=3,
         vmem=100 * 1024 * 1024)
    case("g(4,10) 3out prefetch   ", grid=(4, 10), prefetch=True)
    case("g(40,)  3out            ", grid=(40,))
    case("g(4,)   3out            ", grid=(4,))
    case("g(1,)   3out            ", grid=(1,))
    case("g(1,)   1out            ", grid=(1,), n_out=1)
    case("g(1,)   3out-small      ", grid=(1,), out_small=True)
    case("g(4,10) 3out-small      ", grid=(4, 10), out_small=True)

    # real BW ceiling: f32 copy, various block rows
    for blk in (256, 512, 1024):
        ROWS, COLS = 8192, 2048  # 64 MB f32
        xf = jnp.asarray(rng.standard_normal((ROWS, COLS)
                                             ).astype(np.float32))

        def kc(i_ref, o_ref):
            o_ref[...] = i_ref[...]

        pc = pl.pallas_call(
            kc, grid=(ROWS // blk,),
            in_specs=[pl.BlockSpec((blk, COLS), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((blk, COLS), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32))

        ms = timeit(lambda c: pc(c), xf, iters=50)
        log(f"f32 copy 64MB blk={blk}: {ms:.3f} ms -> "
            f"{2 * ROWS * COLS * 4 / ms / 1e6:.0f} GB/s (r+w)")

    # u8 copy BW
    ROWS, COLS = 8192, 8192
    xu = jnp.asarray(rng.integers(0, 256, (ROWS, COLS), np.int64
                                  ).astype(np.uint8))

    def ku(i_ref, o_ref):
        o_ref[...] = i_ref[...]

    pu = pl.pallas_call(
        ku, grid=(16,),
        in_specs=[pl.BlockSpec((512, COLS), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((512, COLS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.uint8))
    ms = timeit(lambda c: pu(c), xu, iters=50)
    log(f"u8 copy 64MB: {ms:.3f} ms -> {2*ROWS*COLS/ms/1e6:.0f} GB/s (r+w)")


if __name__ == "__main__":
    main()
