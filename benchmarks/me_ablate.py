"""Stage ablation of the dense single-kernel Pallas SSD motion search
(ops/motion.py _me_ssd_pallas_program, 1080p/16/64).

Simplified toggled copy to split the measured ~3.6-3.9 ms/frame:
  --asm-only     im2col assembly (repeat + 4-step log-roll + bf16 store)
  --mm-only      assembly + the 48 [128,256]@[256,W] dots (sum, no argmin)
  --no-extract   full dy argmin, skip the 7-step band log-roll
  (default)      faithful structure

Run: python benchmarks/me_ablate.py [--asm-only|--mm-only|--no-extract]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_loop(body, init, iters=20, reps=4):
    @jax.jit
    def run(carry, n):
        return jax.lax.fori_loop(0, n, body, carry)

    def wall(n):
        t0 = time.perf_counter()
        out = run(init, n)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
        return time.perf_counter() - t0

    wall(2)
    n1, n2 = max(iters // 5, 2), iters
    best = float("inf")
    for _ in range(reps):
        t1, t2 = wall(n1), wall(n2)
        if t2 > t1:
            best = min(best, (t2 - t1) / (n2 - n1))
    return best


def make_prog(h, w, mode):
    block, search = 16, 64
    strips, wb = h // block, w // block
    wbp = 128
    d_lo, d_hi = -24, 47
    n_d, n_j = 72, 48
    n_slab = 6
    win_rows = 64
    neg, pos = 24, 48
    kk = 256

    def roll_left(x, n):
        return pltpu.roll(x, shift=x.shape[1] - n, axis=1)

    def kernel(cyv_ref, win_ref, r2_ref, f_ref, d_ref, j_ref,
               sh2_ref, best_ref, jb_ref):
        s_id = pl.program_id(0)
        win = win_ref[0]
        st = jnp.broadcast_to(win[:, None, :],
                              (win_rows, block, w)).reshape(
                                  win_rows * block, w)
        riota = lax.broadcasted_iota(jnp.int32, st.shape, 0)
        for p in range(4):
            bit = ((riota >> p) & 1) == 1
            st = jnp.where(bit, roll_left(st, 1 << p), st)
        sh2_ref[...] = st.astype(jnp.bfloat16)

        if mode == "asm_only":
            d_ref[0, :, :] = sh2_ref[0:wbp, 0:n_d].astype(jnp.float32)
            j_ref[0, :, :] = jnp.zeros((wbp, n_d), jnp.int32)
            return

        best_ref[...] = (jnp.zeros((wbp, w), jnp.float32) if mode == "mm_only"
                         else jnp.full((wbp, w), jnp.inf, jnp.float32))
        jb_ref[...] = jnp.zeros((wbp, w), jnp.int32)
        filt = f_ref[0]

        def slab(jslab, carry):
            base8 = pl.multiple_of(jslab * 8, 8)
            r2slab = r2_ref[0, pl.ds(base8, 8), :]
            for i in range(8):
                j = jslab * 8 + i
                off = pl.multiple_of(jslab * 128 + i * 16, 16)
                rhs = sh2_ref[pl.ds(off, kk), :]
                cross = jnp.dot(filt, rhs,
                                preferred_element_type=jnp.float32)
                if mode == "mm_only":
                    best_ref[...] = best_ref[...] + cross
                else:
                    t = r2slab[i:i + 1, :] - 2.0 * cross
                    inner = t * np.float32(2 ** -4) + cyv_ref[s_id, j]
                    m = inner < best_ref[...]
                    best_ref[...] = jnp.where(m, inner, best_ref[...])
                    jb_ref[...] = jnp.where(m, j, jb_ref[...])
            return carry

        lax.fori_loop(0, n_slab, slab, 0)

        if mode in ("mm_only", "no_extract"):
            d_ref[0, :, :] = best_ref[0:wbp, 0:n_d]
            j_ref[0, :, :] = jb_ref[0:wbp, 0:n_d]
            return

        best = best_ref[...]
        jb = jb_ref[...]
        biota = lax.broadcasted_iota(jnp.int32, (wbp, w), 0)
        for p in range(7):
            sh = (block << p) % w
            if sh == 0:
                continue
            bit = ((biota >> p) & 1) == 1
            best = jnp.where(bit, roll_left(best, sh), best)
            jb = jnp.where(bit, roll_left(jb, sh), jb)
        d_ref[0, :, :neg] = best[:, w - neg:]
        d_ref[0, :, neg:] = best[:, :pos]
        j_ref[0, :, :neg] = jb[:, w - neg:]
        j_ref[0, :, neg:] = jb[:, :pos]

    call = pl.pallas_call(
        kernel,
        grid=(strips,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, win_rows, w), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_j, w), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wbp, kk), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, wbp, n_d), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wbp, n_d), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((strips, wbp, n_d), jnp.float32),
                   jax.ShapeDtypeStruct((strips, wbp, n_d), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((block * win_rows, w), jnp.bfloat16),
            pltpu.VMEM((wbp, w), jnp.float32),
            pltpu.VMEM((wbp, w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )

    ylo = np.clip(np.arange(strips) * block - 24, 0, h).astype(np.int32)
    cyv = np.random.default_rng(0).uniform(
        0, 50, (strips, n_j)).astype(np.float32)
    win_idx = jnp.asarray(ylo[:, None] + np.arange(win_rows)[None, :])
    rows = jnp.asarray(np.clip(ylo[:, None] + np.arange(n_j)[None, :],
                               0, h - block))

    @jax.jit
    def run(cur, ref):
        refp = jnp.pad(ref, ((0, search), (0, 0)))
        r2c = lax.reduce_window(refp.astype(jnp.int32) ** 2, 0, lax.add,
                                (block, 1), (1, 1), "valid")
        s2 = lax.reduce_window(r2c, 0, lax.add, (1, block), (1, 1),
                               "valid")
        wins = jnp.take(refp, win_idx, axis=0).astype(jnp.float32)
        r2f = jnp.pad(s2[rows], ((0, 0), (0, 0), (0, block - 1))
                      ).astype(jnp.float32)
        filt = (cur[:strips * block, :wb * block]
                .reshape(strips, block, wb, block)
                .transpose(0, 2, 1, 3)
                .reshape(strips, wb, kk).astype(jnp.bfloat16))
        filt = jnp.pad(filt, ((0, 0), (0, wbp - wb), (0, 0)))
        dd, jg = call(jnp.asarray(cyv), wins, r2f, filt)
        return dd, jg

    return run


def main():
    mode = "full"
    for m in ("asm_only", "mm_only", "no_extract"):
        if "--" + m.replace("_", "-") in sys.argv:
            mode = m
    log("devices:", jax.devices(), "mode:", mode)
    h, w = 1080, 1920
    rng = np.random.default_rng(5)
    ref = jnp.asarray(rng.integers(0, 255, (h, w), np.uint8))
    cur = jnp.asarray(np.clip(
        np.asarray(ref, int) + rng.integers(-12, 12, (h, w)), 0,
        255).astype(np.uint8))
    prog = make_prog(h, w, mode)

    def body(_k, carry):
        c, r, _prev = carry
        dd, jg = prog(c, r)
        return (c.at[0, 0].set(dd[0, 0, 0].astype(jnp.uint8)), r, (dd, jg))

    dt = device_loop(body, (cur, ref, prog(cur, ref)))
    print(f"mode={mode}: {dt*1e3:.3f} ms/frame = {1/dt:.1f} fps")


if __name__ == "__main__":
    main()
