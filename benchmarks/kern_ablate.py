"""Ablation study of the fused frame kernel (config-3 shape, pgrp=2).

Self-contained simplified copy of pallas_frame's A-family kernel with
toggles, to locate the 0.63 ms (25x-off-roofline) bottleneck:
  --rows-only        row stage, no column tiles
  --tiles-only       column tiles sampling a fixed window, no row stage
  --no-matmul        copy instead of the hat matmul
  --bf16             split-C bf16 matmul instead of f32
  --ct               build C already transposed (no in-kernel transpose)
  (default)          faithful kernel
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

TILE_W = 128
PADL = 64


def _ceil_to(v, m):
    return -(-v // m) * m


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_loop(body, init, iters=250, reps=3):
    """Slope timing: cancels the ~30ms fixed tunnel dispatch/fetch cost."""
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
    n1, n2 = iters // 5, iters
    best = float("inf")
    for _ in range(reps):
        t1, t2 = wall(n1), wall(n2)
        if t2 > t1:
            best = min(best, (t2 - t1) / (n2 - n1))
    return best


def make_prog(h, w, n_sources, bh, bw, hp, wp, hpc, wpc, ww, mode):
    n_j = (1 if mode in ("empty_j1", "fused1", "fused1l", "v2f")
           else bw // (256 if mode == "v2w" else TILE_W))
    tiny_in = mode in ("empty_tiny",)
    rdt_ = jnp.bfloat16 if mode == "v2b" else jnp.float32
    ha, wa = _ceil_to(h, 16), _ceil_to(w, 256)
    bhc = bh // 2

    def kern(iparams_ref, fparams_ref, ysp_ref, usp_ref, vsp_ref,
             outy_ref, outcb_ref, outcr_ref,
             accy, acccb, acccr, rowsy, rowscb, rowscr,
             g0y, g1y, g0u, g1u, rowsy2, rowscb2, rowscr2,
             rowsy3, rowscb3, rowscr3):
        s = pl.program_id(0)
        j = pl.program_id(1)
        n_jj = pl.num_programs(1)

        @pl.when((s == 0) & (j == 0))
        def _init():
            accy[...] = jnp.zeros((ha, wa), jnp.float32)
            acccb[...] = jnp.full((ha // 2, wa // 2), 128.0, jnp.float32)
            acccr[...] = jnp.full((ha // 2, wa // 2), 128.0, jnp.float32)

        rdt = jnp.bfloat16 if mode == "v2b" else jnp.float32

        def row_group2(view_ref, dst0, dst1, gs, by0p, n_rows, wfull):
            """v2: two single-tap stores; vertical lerp folds into the
            tile matmul weights."""
            for k in range(2):
                gs[k][...] = view_ref[0, :, k * wfull:(k + 1) * wfull]
            base = pl.multiple_of(((by0p // 2) // 8) * 8, 8)
            m = by0p % 16
            blks = [gs[k][pl.ds(base, n_rows + 9), :] for k in range(2)]
            for m_ in range(16):
                q0, s0 = m_ % 2, m_ // 2
                q1, s1 = (m_ + 1) % 2, (m_ + 1) // 2

                @pl.when(m == m_)
                def _(q0=q0, s0=s0):
                    dst0[...] = blks[q0][s0:s0 + n_rows].astype(
                        jnp.int32).astype(jnp.float32).astype(rdt)

                @pl.when(m == m_)
                def _(q1=q1, s1=s1):
                    dst1[0:n_rows, :] = blks[q1][s1:s1 + n_rows].astype(
                        jnp.int32).astype(jnp.float32).astype(rdt)

        def col_blend2(r0, r1, acc, tile_j, n_rows, oy, ox, padl, wfull,
                       cx0, ax, g):
            tw = 256 if mode == "v2w" else TILE_W
            www = (768 if mode == "v2w" else ww)
            ww_p = min(www, wfull)
            base_x = cx0 + ax * jnp.asarray(tw * tile_j, jnp.float32)
            w0 = jnp.floor(base_x).astype(jnp.int32) - 2 + padl
            wstart = jnp.clip((w0 // 128) * 128, 0, wfull - ww_p)
            win0 = r0[:, pl.ds(pl.multiple_of(wstart, 128), ww_p)]
            win1 = r1[0:n_rows, pl.ds(pl.multiple_of(wstart, 128), ww_p)]
            ks_c = (wstart - padl
                    + jax.lax.broadcasted_iota(jnp.int32, (ww_p, 1), 0)
                    ).astype(jnp.float32)
            xs_r = base_x + ax * jax.lax.broadcasted_iota(
                jnp.int32, (1, tw), 1).astype(jnp.float32)
            Ct = jnp.maximum(0.0, 1.0 - jnp.abs(xs_r - ks_c))
            if mode == "v2b":
                c0 = Ct * (1.0 - g)
                c1 = Ct * g
                c0h = c0.astype(jnp.bfloat16)
                c0l = (c0 - c0h.astype(jnp.float32)).astype(jnp.bfloat16)
                c1h = c1.astype(jnp.bfloat16)
                c1l = (c1 - c1h.astype(jnp.float32)).astype(jnp.bfloat16)
                samp = (jnp.dot(win0, c0h, preferred_element_type=jnp.float32)
                        + jnp.dot(win0, c0l, preferred_element_type=jnp.float32)
                        + jnp.dot(win1, c1h, preferred_element_type=jnp.float32)
                        + jnp.dot(win1, c1l, preferred_element_type=jnp.float32)
                        ) * (1.0 / 255.0)
            else:
                samp = (jnp.dot(win0, Ct * (1.0 - g),
                                preferred_element_type=jnp.float32)
                        + jnp.dot(win1, Ct * g,
                                  preferred_element_type=jnp.float32)
                        ) * (1.0 / 255.0)
            op = fparams_ref[s, 26]
            co = ox + tw * tile_j
            oy8 = pl.multiple_of(oy, 8)
            cur = acc[pl.ds(oy8, n_rows),
                      pl.ds(pl.multiple_of(co, 128), tw)] * (1.0 / 255.0)
            out = cur * (1.0 - op) + samp * op
            acc[pl.ds(oy8, n_rows), pl.ds(pl.multiple_of(co, 128), tw)] = \
                jnp.clip(jnp.rint(out * 255.0), 0.0, 255.0)

        if mode == "v2f":
            # v2 two-tap rows + ALL column tiles unrolled in one grid
            # step per source: scratch deps stay in program order, no
            # cross-step hazard
            @pl.when(j == 0)
            def _rows2f():
                by0l = iparams_ref[s, 2]
                by0c = iparams_ref[s, 3]
                row_group2(ysp_ref, rowsy, rowsy2, (g0y, g1y), by0l,
                           bh, wp)
                row_group2(usp_ref, rowscb, rowscb2, (g0u, g1u),
                           by0c, bhc, wpc)
                row_group2(vsp_ref, rowscr, rowscr2, (g0u, g1u),
                           by0c, bhc, wpc)

            oy_f = iparams_ref[s, 0]
            ox_f = iparams_ref[s, 1]
            for jj in range(bw // TILE_W):
                @pl.when((iparams_ref[s, 5] <= jj)
                         & (jj < iparams_ref[s, 6]))
                def _lf(jj=jj):
                    col_blend2(rowsy, rowsy2, accy, jj, bh, oy_f, ox_f,
                               PADL, wp, fparams_ref[s, 2],
                               fparams_ref[s, 4], fparams_ref[s, 0])

                @pl.when((iparams_ref[s, 7] <= jj)
                         & (jj < iparams_ref[s, 8]))
                def _cf(jj=jj):
                    col_blend2(rowscb, rowscb2, acccb, jj, bhc,
                               oy_f // 2, ox_f // 2, PADL // 2, wpc,
                               fparams_ref[s, 3], fparams_ref[s, 5],
                               fparams_ref[s, 1])
                    col_blend2(rowscr, rowscr2, acccr, jj, bhc,
                               oy_f // 2, ox_f // 2, PADL // 2, wpc,
                               fparams_ref[s, 3], fparams_ref[s, 5],
                               fparams_ref[s, 1])

        if mode in ("v2", "v2b", "v2w", "v2_rows", "v2_tiles"):
            if mode != "v2_tiles":
                @pl.when(j == 0)
                def _rows2x():
                    by0l = iparams_ref[s, 2]
                    by0c = iparams_ref[s, 3]
                    row_group2(ysp_ref, rowsy, rowsy2, (g0y, g1y), by0l,
                               bh, wp)
                    row_group2(usp_ref, rowscb, rowscb2, (g0u, g1u),
                               by0c, bhc, wpc)
                    row_group2(vsp_ref, rowscr, rowscr2, (g0u, g1u),
                               by0c, bhc, wpc)
        if mode == "v2_rows":
            @pl.when((s == n_sources - 1) & (j == n_j - 1))
            def _keep2():
                outy_ref[0:bh, :] = (rowsy[:, 0:w]
                                     + rowsy2[0:bh, 0:w]).astype(
                    jnp.int32).astype(jnp.uint8)
        if mode in ("v2_tiles",):
            oy_t = iparams_ref[s, 0]
            ox_t = iparams_ref[s, 1]

            @pl.when((iparams_ref[s, 5] <= j) & (j < iparams_ref[s, 6]))
            def _luma2t():
                col_blend2(rowsy, rowsy2, accy, j, bh, oy_t, ox_t, PADL,
                           wp, fparams_ref[s, 2], fparams_ref[s, 4],
                           fparams_ref[s, 0])

            @pl.when((iparams_ref[s, 7] <= j) & (j < iparams_ref[s, 8]))
            def _chroma2t():
                col_blend2(rowscb, rowscb2, acccb, j, bhc, oy_t // 2,
                           ox_t // 2, PADL // 2, wpc, fparams_ref[s, 3],
                           fparams_ref[s, 5], fparams_ref[s, 1])
                col_blend2(rowscr, rowscr2, acccr, j, bhc, oy_t // 2,
                           ox_t // 2, PADL // 2, wpc, fparams_ref[s, 3],
                           fparams_ref[s, 5], fparams_ref[s, 1])
        if mode in ("v2", "v2b", "v2w"):
            oy_ = iparams_ref[s, 0]
            ox_ = iparams_ref[s, 1]

            jl, jh = iparams_ref[s, 5], iparams_ref[s, 6]
            jlc, jhc = iparams_ref[s, 7], iparams_ref[s, 8]
            if mode == "v2w":
                jl, jh = jl // 2, (jh + 1) // 2
                jlc, jhc = jlc // 2, (jhc + 1) // 2

            @pl.when((jl <= j) & (j < jh))
            def _luma2():
                col_blend2(rowsy, rowsy2, accy, j, bh, oy_, ox_, PADL,
                           wp, fparams_ref[s, 2], fparams_ref[s, 4],
                           fparams_ref[s, 0])

            @pl.when((jlc <= j) & (j < jhc))
            def _chroma2():
                col_blend2(rowscb, rowscb2, acccb, j, bhc, oy_ // 2,
                           ox_ // 2, PADL // 2, wpc, fparams_ref[s, 3],
                           fparams_ref[s, 5], fparams_ref[s, 1])
                col_blend2(rowscr, rowscr2, acccr, j, bhc, oy_ // 2,
                           ox_ // 2, PADL // 2, wpc, fparams_ref[s, 3],
                           fparams_ref[s, 5], fparams_ref[s, 1])

        def row_group(view_ref, dst, gs, by0p, g, n_rows, wfull,
                      dst2=None):
            base = pl.multiple_of(((by0p // 2) // 8) * 8, 8)
            m = by0p % 16
            if mode == "rows_nocopy_live":
                blks = [view_ref[0, pl.ds(base, n_rows + 9),
                                 k * wfull:(k + 1) * wfull]
                        for k in range(2)]
                for m_ in range(16):
                    q0, s0 = m_ % 2, m_ // 2
                    q1, s1 = (m_ + 1) % 2, (m_ + 1) // 2

                    @pl.when(m == m_)
                    def _(q0=q0, s0=s0, q1=q1, s1=s1):
                        t0 = blks[q0][s0:s0 + n_rows].astype(jnp.int32)
                        t1 = blks[q1][s1:s1 + n_rows].astype(jnp.int32)
                        dst[...] = (t0.astype(jnp.float32) * (1.0 - g)
                                    + t1.astype(jnp.float32) * g)
                return
            if mode != "rows_lerp":
                for k in range(2):
                    gs[k][...] = view_ref[0, :, k * wfull:(k + 1) * wfull]
            if mode == "rows_copies":
                return
            blks = [gs[k][pl.ds(base, n_rows + 9), :] for k in range(2)]
            if mode == "rows_cvtfirst_live":
                # aligned u8->f32 convert of both groups first, then the
                # switch lerps f32 slices (sublane-misaligned f32 is a
                # cheap rotate; misaligned u8 needs 32-row repacking)
                f0 = dst2[0]
                f1 = dst2[1]
                f0[...] = gs[0][pl.ds(base, n_rows + 16), :].astype(
                    jnp.int32).astype(jnp.float32)
                f1[...] = gs[1][pl.ds(base, n_rows + 16), :].astype(
                    jnp.int32).astype(jnp.float32)
                fb = [f0, f1]
                for m_ in range(16):
                    q0, s0 = m_ % 2, m_ // 2
                    q1, s1 = (m_ + 1) % 2, (m_ + 1) // 2

                    @pl.when(m == m_)
                    def _(q0=q0, s0=s0, q1=q1, s1=s1):
                        dst[...] = (fb[q0][s0:s0 + n_rows] * (1.0 - g)
                                    + fb[q1][s1:s1 + n_rows] * g)
                return
            if mode == "rows_2tap_live":
                # two single-tap stores; the vertical lerp would move into
                # the tile matmul weights
                for m_ in range(16):
                    q0, s0 = m_ % 2, m_ // 2
                    q1, s1 = (m_ + 1) % 2, (m_ + 1) // 2

                    @pl.when(m == m_)
                    def _(q0=q0, s0=s0):
                        dst[...] = blks[q0][s0:s0 + n_rows].astype(
                            jnp.int32).astype(jnp.float32)

                    @pl.when(m == m_)
                    def _(q1=q1, s1=s1):
                        dst2[0][0:n_rows, :] = blks[q1][s1:s1 + n_rows
                                                        ].astype(
                            jnp.int32).astype(jnp.float32)
                return
            if mode == "rows_u8_live":
                for m_ in range(16):
                    q0, s0 = m_ % 2, m_ // 2

                    @pl.when(m == m_)
                    def _(q0=q0, s0=s0):
                        dst[...] = blks[q0][s0:s0 + n_rows].astype(
                            jnp.int32).astype(jnp.float32)
                return
            if mode == "rows_lerp1":
                t0 = blks[0][0:n_rows].astype(jnp.int32)
                t1 = blks[1][0:n_rows].astype(jnp.int32)
                dst[...] = (t0.astype(jnp.float32) * (1.0 - g)
                            + t1.astype(jnp.float32) * g)
                return
            for m_ in range(16):
                q0, s0 = m_ % 2, m_ // 2
                q1, s1 = (m_ + 1) % 2, (m_ + 1) // 2

                @pl.when(m == m_)
                def _(q0=q0, s0=s0, q1=q1, s1=s1):
                    t0 = blks[q0][s0:s0 + n_rows].astype(jnp.int32)
                    t1 = blks[q1][s1:s1 + n_rows].astype(jnp.int32)
                    dst[...] = (t0.astype(jnp.float32) * (1.0 - g)
                                + t1.astype(jnp.float32) * g)

        if mode.startswith("empty"):
            @pl.when((s == n_sources - 1) & (j == n_j - 1))
            def _emit0():
                outy_ref[...] = accy[0:h, 0:w].astype(jnp.int32
                                                      ).astype(jnp.uint8)
                outcb_ref[...] = acccb[0:h // 2, 0:w // 2].astype(
                    jnp.int32).astype(jnp.uint8)
                outcr_ref[...] = acccr[0:h // 2, 0:w // 2].astype(
                    jnp.int32).astype(jnp.uint8)
            return

        if mode not in ("tiles_only", "tiles_static", "v2", "v2b",
                        "v2w", "v2f", "v2_rows", "v2_tiles"):
            @pl.when(j == 0)
            def _rows():
                by0l, gl = iparams_ref[s, 2], fparams_ref[s, 0]
                by0c, gc = iparams_ref[s, 3], fparams_ref[s, 1]
                row_group(ysp_ref, rowsy, (g0y, g1y), by0l, gl, bh, wp,
                          (rowsy2, rowsy3))
                row_group(usp_ref, rowscb, (g0u, g1u), by0c, gc, bhc, wpc,
                          (rowscb2, rowscb3))
                row_group(vsp_ref, rowscr, (g0u, g1u), by0c, gc, bhc, wpc,
                          (rowscr2, rowscr3))

        def col_blend(rows_scr, acc, tile_j, n_rows, oy, ox, padl, wfull,
                      cx0, ax):
            ww_p = min(ww, wfull)
            base_x = cx0 + ax * jnp.asarray(TILE_W * tile_j, jnp.float32)
            w0 = jnp.floor(base_x).astype(jnp.int32) - 2 + padl
            if mode == "tiles_static":
                wstart = 0
                win = rows_scr[:, 0:ww_p]
            else:
                wstart = jnp.clip((w0 // 128) * 128, 0, wfull - ww_p)
                win = rows_scr[:, pl.ds(pl.multiple_of(wstart, 128), ww_p)]
            us_ = jax.lax.broadcasted_iota(jnp.int32, (TILE_W, 1), 0
                                           ).astype(jnp.float32)
            xs = base_x + ax * us_
            if mode == "no_matmul":
                samp = win[:, :TILE_W] * (1.0 / 255.0)
            elif mode in ("ct", "bf16"):
                ks_c = (wstart - padl
                        + jax.lax.broadcasted_iota(jnp.int32, (ww_p, 1), 0)
                        ).astype(jnp.float32)
                xs_r = base_x + ax * jax.lax.broadcasted_iota(
                    jnp.int32, (1, TILE_W), 1).astype(jnp.float32)
                Ct = jnp.maximum(0.0, 1.0 - jnp.abs(xs_r - ks_c))
                if mode == "bf16":
                    ch = Ct.astype(jnp.bfloat16)
                    cl = (Ct - ch.astype(jnp.float32)).astype(jnp.bfloat16)
                    wh = win.astype(jnp.bfloat16)
                    wl = (win - wh.astype(jnp.float32)).astype(jnp.bfloat16)
                    samp = (jnp.dot(wh, ch, preferred_element_type=jnp.float32)
                            + jnp.dot(wh, cl, preferred_element_type=jnp.float32)
                            + jnp.dot(wl, ch, preferred_element_type=jnp.float32)
                            ) * (1.0 / 255.0)
                else:
                    samp = jnp.dot(win, Ct, preferred_element_type=jnp.float32
                                   ) * (1.0 / 255.0)
            else:
                ks = (wstart - padl
                      + jax.lax.broadcasted_iota(jnp.int32, (1, ww_p), 1)
                      ).astype(jnp.float32)
                C = jnp.maximum(0.0, 1.0 - jnp.abs(xs - ks))
                samp = jnp.dot(win, C.T, preferred_element_type=jnp.float32
                               ) * (1.0 / 255.0)

            op = fparams_ref[s, 26]
            if mode == "tiles_static":
                cur = acc[0:n_rows, 0:TILE_W] * (1.0 / 255.0)
                out = cur * (1.0 - op) + samp * op
                acc[0:n_rows, 0:TILE_W] = \
                    jnp.clip(jnp.rint(out * 255.0), 0.0, 255.0)
                return
            co = ox + TILE_W * tile_j
            oy8 = pl.multiple_of(oy, 8)
            cur = acc[pl.ds(oy8, n_rows),
                      pl.ds(pl.multiple_of(co, 128), TILE_W)] * (1.0 / 255.0)
            out = cur * (1.0 - op) + samp * op
            acc[pl.ds(oy8, n_rows), pl.ds(pl.multiple_of(co, 128), TILE_W)] = \
                jnp.clip(jnp.rint(out * 255.0), 0.0, 255.0)

        oy = iparams_ref[s, 0]
        ox = iparams_ref[s, 1]
        ry, rcb, rcr = ((rowsy2, rowscb2, rowscr2)
                        if mode in ("indep", "indep2")
                        else (rowsy, rowscb, rowscr))
        if mode in ("fused1", "fused1l"):
            # whole source in ONE grid step: rows stage above (j==0 is
            # always true), tiles via in-step loop -> no cross-step
            # scratch dependency
            if mode == "fused1":
                for jj in range(bw // TILE_W):
                    @pl.when((iparams_ref[s, 5] <= jj)
                             & (jj < iparams_ref[s, 6]))
                    def _l(jj=jj):
                        col_blend(rowsy, accy, jj, bh, oy, ox, PADL, wp,
                                  fparams_ref[s, 2], fparams_ref[s, 4])

                    @pl.when((iparams_ref[s, 7] <= jj)
                             & (jj < iparams_ref[s, 8]))
                    def _c(jj=jj):
                        col_blend(rowscb, acccb, jj, bhc, oy // 2,
                                  ox // 2, PADL // 2, wpc,
                                  fparams_ref[s, 3], fparams_ref[s, 5])
                        col_blend(rowscr, acccr, jj, bhc, oy // 2,
                                  ox // 2, PADL // 2, wpc,
                                  fparams_ref[s, 3], fparams_ref[s, 5])
            else:
                def _lbody(jj, _):
                    col_blend(rowsy, accy, jj, bh, oy, ox, PADL, wp,
                              fparams_ref[s, 2], fparams_ref[s, 4])
                    return 0

                jax.lax.fori_loop(iparams_ref[s, 5], iparams_ref[s, 6],
                                  _lbody, 0)

                def _cbody(jj, _):
                    col_blend(rowscb, acccb, jj, bhc, oy // 2, ox // 2,
                              PADL // 2, wpc, fparams_ref[s, 3],
                              fparams_ref[s, 5])
                    col_blend(rowscr, acccr, jj, bhc, oy // 2, ox // 2,
                              PADL // 2, wpc, fparams_ref[s, 3],
                              fparams_ref[s, 5])
                    return 0

                jax.lax.fori_loop(iparams_ref[s, 7], iparams_ref[s, 8],
                                  _cbody, 0)
        if mode not in ("rows_only", "rows_copies", "rows_lerp",
                        "rows_lerp1", "rows_live", "rows_nocopy_live",
                        "rows_u8_live", "rows_2tap_live",
                        "rows_cvtfirst_live", "fused1", "fused1l", "v2", "v2b",
                        "v2w", "v2f", "v2_rows", "v2_tiles"):
            @pl.when((iparams_ref[s, 5] <= j) & (j < iparams_ref[s, 6]))
            def _luma():
                col_blend(ry, accy, j, bh, oy, ox, PADL, wp,
                          fparams_ref[s, 2], fparams_ref[s, 4])

            @pl.when((iparams_ref[s, 7] <= j) & (j < iparams_ref[s, 8]))
            def _chroma():
                col_blend(rcb, acccb, j, bhc, oy // 2, ox // 2,
                          PADL // 2, wpc, fparams_ref[s, 3],
                          fparams_ref[s, 5])
                col_blend(rcr, acccr, j, bhc, oy // 2, ox // 2,
                          PADL // 2, wpc, fparams_ref[s, 3],
                          fparams_ref[s, 5])

        @pl.when((s == n_sources - 1) & (j == n_jj - 1))
        def _emit():
            outy_ref[...] = accy[0:h, 0:w].astype(jnp.int32
                                                  ).astype(jnp.uint8)
            if mode == "indep2":
                outy_ref[0:8, 0:128] = rowsy[0:8, 0:128].astype(
                    jnp.int32).astype(jnp.uint8)
            if mode in ("rows_2tap_live", "rows_cvtfirst_live"):
                outy_ref[0:bh, :] = (rowsy[:, 0:w]
                                     + rowsy2[0:bh, 0:w]).astype(
                    jnp.int32).astype(jnp.uint8)
                outcb_ref[0:bh // 2, :] = (rowscb[:, 0:w // 2]
                                           + rowscb2[0:bh // 2, 0:w // 2]
                                           ).astype(jnp.int32).astype(
                    jnp.uint8)
                outcr_ref[0:bh // 2, :] = (rowscr[:, 0:w // 2]
                                           + rowscr2[0:bh // 2, 0:w // 2]
                                           ).astype(jnp.int32).astype(
                    jnp.uint8)
            if mode in ("rows_live", "rows_nocopy_live", "rows_u8_live"):
                outy_ref[0:bh, :] = rowsy[:, 0:w].astype(
                    jnp.int32).astype(jnp.uint8)
                outcb_ref[0:bh // 2, :] = rowscb[:, 0:w // 2].astype(
                    jnp.int32).astype(jnp.uint8)
                outcr_ref[0:bh // 2, :] = rowscr[:, 0:w // 2].astype(
                    jnp.int32).astype(jnp.uint8)
            outcb_ref[...] = acccb[0:h // 2, 0:w // 2].astype(
                jnp.int32).astype(jnp.uint8)
            outcr_ref[...] = acccr[0:h // 2, 0:w // 2].astype(
                jnp.int32).astype(jnp.uint8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_sources, n_j),
        in_specs=([
            pl.BlockSpec((1, 8, 128), lambda s, j, *_: (s, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda s, j, *_: (s, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda s, j, *_: (s, 0, 0)),
        ] if tiny_in else [
            pl.BlockSpec((1, hp // 2, 2 * wp), lambda s, j, *_: (s, 0, 0)),
            pl.BlockSpec((1, hpc // 2, 2 * wpc), lambda s, j, *_: (s, 0, 0)),
            pl.BlockSpec((1, hpc // 2, 2 * wpc), lambda s, j, *_: (s, 0, 0)),
        ]),
        out_specs=[
            pl.BlockSpec((h, w), lambda s, j, *_: (0, 0)),
            pl.BlockSpec((h // 2, w // 2), lambda s, j, *_: (0, 0)),
            pl.BlockSpec((h // 2, w // 2), lambda s, j, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((ha, wa), jnp.float32),
            pltpu.VMEM((ha // 2, wa // 2), jnp.float32),
            pltpu.VMEM((ha // 2, wa // 2), jnp.float32),
            pltpu.VMEM((bh, wp), rdt_),
            pltpu.VMEM((bh // 2, wpc), rdt_),
            pltpu.VMEM((bh // 2, wpc), rdt_),
            pltpu.VMEM((hp // 2, wp), jnp.uint8),
            pltpu.VMEM((hp // 2, wp), jnp.uint8),
            pltpu.VMEM((hpc // 2, wpc), jnp.uint8),
            pltpu.VMEM((hpc // 2, wpc), jnp.uint8),
            pltpu.VMEM((bh + 16, wp), rdt_),
            pltpu.VMEM((bh // 2 + 16, wpc), rdt_),
            pltpu.VMEM((bh // 2 + 16, wpc), rdt_),
            pltpu.VMEM((bh + 16, wp), jnp.float32),
            pltpu.VMEM((bh // 2 + 16, wpc), jnp.float32),
            pltpu.VMEM((bh // 2 + 16, wpc), jnp.float32),
        ],
    )
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.uint8),
                   jax.ShapeDtypeStruct((h // 2, w // 2), jnp.uint8),
                   jax.ShapeDtypeStruct((h // 2, w // 2), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(lambda ip, fp, *arrs: fn(ip, fp, *arrs))


def main():
    from swiftvideo_tpu.ops import rect_uniforms
    from swiftvideo_tpu.ops.pallas_frame import (
        frame_geometry, frame_params, pad_sources)

    mode = "full"
    for m in ("rows_only", "rows_copies", "rows_lerp", "rows_lerp1",
              "tiles_only", "tiles_static", "no_matmul", "bf16", "ct",
              "empty", "empty_j1", "empty_tiny", "indep", "indep2",
              "fused1", "fused1l", "rows_live", "rows_nocopy_live",
              "rows_u8_live", "rows_2tap_live", "rows_cvtfirst_live",
              "v2", "v2b", "v2w", "v2f", "v2_rows", "v2_tiles"):
        if "--" + m.replace("_", "-") in sys.argv:
            mode = m
    log("devices:", jax.devices(), "mode:", mode)
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
    packed = np.stack([np.asarray(u, np.float32) for u in unis])
    offs = np.asarray(geom["offs"], np.int32)
    jrs = np.asarray(geom["jranges"], np.int32)
    gd = dict(hp=geom["hp"], wp=geom["wp"], hpc=geom["hpc"], wpc=geom["wpc"],
              padt=geom["padt"], pgrp=2, has1=False)
    arrs = jax.block_until_ready(
        jax.jit(lambda a, b, c: pad_sources(a, b, c, gd))(ys, us, vs))
    ipar, fpar = jax.block_until_ready(jax.jit(
        lambda p: frame_params(p, jnp.asarray(offs), jnp.asarray(jrs),
                               (W, H), (H, W), geom["pys"], geom["padt"]))(
        jnp.asarray(packed)))

    prog = make_prog(H, W, n, geom["bh"], geom["bw"], geom["hp"], geom["wp"],
                     geom["hpc"], geom["wpc"], geom["ww"], mode)

    def body(_k, c):
        fp, _ = c
        o = prog(ipar, fp, *arrs)
        return (fp + o[0][0, 0].astype(jnp.float32) * 1e-12, o)

    dt = device_loop(body, (fpar, prog(ipar, fpar, *arrs)))
    log(f"mode={mode}: {dt*1e3:.3f} ms/frame = {1/dt:.1f} fps")


if __name__ == "__main__":
    main()
